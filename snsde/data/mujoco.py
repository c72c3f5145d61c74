"""MuJoCo forecasting dataset: bundled trajectories -> sliding windows.

Rebuilds /root/reference/benchmark_forecasting/datasets/mujoco.py:17-111 with
the reference's exact semantics:
  * the bundled `mujoco.npy` trajectory bank ([100, 100, 14], no download —
    the reference ships it; default path below resolves it if present)
  * stride-1 sliding windows: for each trajectory, j in
    range(T - time_seq - y_seq) -> input rows [j, j+time_seq),
    target rows [j+time_seq, j+time_seq+y_seq)  (mujoco.py:40-43)
  * whole-timestep missingness on the *input* windows: one
    torch.Generator(seed=56789) shared sequentially across windows,
    randperm(time_seq)[:int(time_seq*rate)] rows set to NaN
    (mujoco.py:50-53); numpy fallback when torch is unavailable
  * sequential 70/15/15 split over windows, times = arange(time_seq),
    NO normalization (common.py:52-86 preprocess_data_forecasting)
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

REFERENCE_NPY = "/root/reference/benchmark_forecasting/datasets/mujoco.npy"


def default_npy_path() -> Optional[str]:
    """The bundled reference trajectory bank, when present."""
    return REFERENCE_NPY if os.path.exists(REFERENCE_NPY) else None


def load_windows(npy_path: str, time_seq: int = 50, y_seq: int = 10,
                 stride: int = 1):
    """Reference windowing (mujoco.py:40-43): stride-1 windows, the last
    y_seq rows of each trajectory never start a window (range without +1)."""
    raw = np.load(npy_path)                 # [n_traj, T, D]
    if raw.ndim == 2:
        raw = raw[None]
    total = time_seq + y_seq
    X, y = [], []
    for traj in raw:
        for start in range(0, traj.shape[0] - total, stride):
            X.append(traj[start : start + time_seq])
            y.append(traj[start + time_seq : start + total])
    return (np.asarray(X, np.float32), np.asarray(y, np.float32))


def drop_timestep_rows(X: np.ndarray, missing_rate: float,
                       seed: int = 56789) -> np.ndarray:
    """Whole-timestep NaN removal per window, matching the reference's
    sequential torch.Generator draw (mujoco.py:50-53) exactly when torch is
    importable; a numpy permutation stream otherwise (same distribution)."""
    if missing_rate <= 0:
        return X
    X = X.copy()
    L = X.shape[1]
    k = int(L * missing_rate)
    try:
        import torch

        g = torch.Generator().manual_seed(seed)
        for i in range(X.shape[0]):
            rows = torch.randperm(L, generator=g)[:k].sort().values.numpy()
            X[i, rows] = np.nan
    except ImportError:
        rng = np.random.default_rng(seed)
        for i in range(X.shape[0]):
            rows = np.sort(rng.permutation(L)[:k])
            X[i, rows] = np.nan
    return X


def get_data(npy_path: Optional[str] = None, time_seq: int = 50,
             y_seq: int = 10, missing_rate: float = 0.0,
             n_synthetic: int = 2048, synthetic_fallback: bool = True,
             seed: int = 0):
    """Returns (X_in [N, time_seq, D], y_out [N, y_seq, D],
    times [time_seq]). npy_path=None resolves the bundled reference file;
    synthetic windows only when neither is available."""
    if npy_path is None:
        npy_path = default_npy_path()
    if npy_path and os.path.exists(npy_path):
        X_in, y_out = load_windows(npy_path, time_seq, y_seq)
    elif synthetic_fallback:
        from .synthetic import synthetic_mujoco

        X, _ = synthetic_mujoco(n=n_synthetic, length=time_seq + y_seq,
                                seed=seed)
        X_in, y_out = X[:, :time_seq], X[:, time_seq:]
    else:
        raise FileNotFoundError(f"{npy_path} not found")
    X_in = drop_timestep_rows(X_in, missing_rate)
    times = np.arange(time_seq, dtype=np.float32)
    return X_in, y_out, times
