"""MuJoCo forecasting dataset: bundled trajectories -> sliding windows.

Rebuilds /root/reference/benchmark_forecasting/datasets/mujoco.py:17-111:
load the bundled `mujoco.npy` trajectory bank (no download — the reference
ships it), cut sliding windows of time_seq+y_seq steps, seeded missingness
(generator seed 56789), sequential 70/15/15 split.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .common import inject_missingness


def load_windows(npy_path: str, time_seq: int = 50, y_seq: int = 10,
                 stride: int = 5):
    raw = np.load(npy_path)                 # [n_traj, T, D]
    if raw.ndim == 2:
        raw = raw[None]
    total = time_seq + y_seq
    windows = []
    for traj in raw:
        for start in range(0, traj.shape[0] - total + 1, stride):
            windows.append(traj[start : start + total])
    return np.asarray(windows, np.float32)


def get_data(npy_path: Optional[str] = None, time_seq: int = 50,
             y_seq: int = 10, missing_rate: float = 0.0,
             n_synthetic: int = 2048, synthetic_fallback: bool = True,
             seed: int = 0):
    """Returns (windows [N, time_seq+y_seq, D], times [time_seq+y_seq])."""
    if npy_path and os.path.exists(npy_path):
        X = load_windows(npy_path, time_seq, y_seq)
    elif synthetic_fallback:
        from .synthetic import synthetic_mujoco

        X, _ = synthetic_mujoco(n=n_synthetic, length=time_seq + y_seq,
                                seed=seed)
    else:
        raise FileNotFoundError(f"{npy_path} not found")
    if missing_rate > 0:
        X[:, :time_seq] = inject_missingness(
            X[:, :time_seq], missing_rate, seed=56789
        )
    times = np.arange(time_seq + y_seq, dtype=np.float32)
    return X, times
