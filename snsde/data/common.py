"""Shared preprocessing: train-stats normalization, time/intensity channel
augmentation, stratified splits, coefficient computation, disk cache.

Rebuilds the reference pipeline
(/root/reference/benchmark_classification/datasets/common.py:27-140 and
/root/reference/torch-ists/torch_ists/_utils.py:115-185):
  * normalize each channel by train-set mean/std over observed entries
  * append a time channel and (optionally) cumulative observation-intensity
    channels
  * stratified 70/15/15 split with fixed seeds
  * hermite or natural spline coefficients
  * content-addressed tensor cache on disk
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

from ..ops.interp import hermite_cubic_coeffs, natural_cubic_coeffs

__all__ = [
    "normalize_with_train_stats",
    "append_time_intensity",
    "stratified_split",
    "preprocess_classification",
    "inject_missingness",
    "cache_path",
    "load_cached",
    "save_cached",
]

CACHE_DIR = os.environ.get(
    "SNSDE_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "snsde")
)


def normalize_with_train_stats(X: np.ndarray, train_idx) -> np.ndarray:
    """Per-channel (x - mean)/std using only training rows; NaNs ignored in
    the statistics and preserved in the output."""
    X = np.asarray(X, np.float32)
    tr = X[train_idx]
    mean = np.nanmean(tr.reshape(-1, tr.shape[-1]), axis=0)
    std = np.nanstd(tr.reshape(-1, tr.shape[-1]), axis=0)
    std = np.where(std < 1e-8, 1.0, std)
    return (X - mean) / std


def append_time_intensity(X: np.ndarray, times: np.ndarray,
                          use_intensity: bool) -> np.ndarray:
    """Prepend a time channel; with use_intensity, also prepend per-channel
    cumulative observation counts (the reference's intensity channels,
    datasets/common.py:60-72)."""
    B, L, C = X.shape
    tchan = np.broadcast_to(np.asarray(times, np.float32)[None, :, None],
                            (B, L, 1))
    pieces = [tchan]
    if use_intensity:
        observed = (~np.isnan(X)).astype(np.float32)
        cum = np.cumsum(observed, axis=1)
        pieces.append(cum)
    pieces.append(X)
    return np.concatenate(pieces, axis=-1)


def stratified_split(y: np.ndarray, fractions=(0.7, 0.15, 0.15),
                     seed: int = 0) -> Tuple[np.ndarray, ...]:
    """Per-class shuffled split into len(fractions) index groups
    (reference datasets/common.py:27-41 uses seeds 0/1 for the two stages;
    here one seeded generator covers both)."""
    y = np.asarray(y).ravel()
    rng = np.random.default_rng(seed)
    groups = [[] for _ in fractions]
    for cls in np.unique(y):
        idx = np.flatnonzero(y == cls)
        rng.shuffle(idx)
        bounds = np.cumsum([int(round(f * len(idx))) for f in fractions])
        bounds[-1] = len(idx)
        start = 0
        for gi, b in enumerate(bounds):
            groups[gi].append(idx[start:b])
            start = b
    return tuple(np.sort(np.concatenate(g)) for g in groups)


def inject_missingness(X: np.ndarray, missing_rate: float,
                       seed: int = 56789) -> np.ndarray:
    """Seeded per-channel random masking (the reference's robustness
    machinery, torch-ists/_utils.py:131-134 / uea.py:102, generator seed
    56789). Never masks the first observation of a channel."""
    if missing_rate <= 0:
        return X
    X = np.array(X, np.float32, copy=True)
    rng = np.random.default_rng(seed)
    B, L, C = X.shape
    for c in range(C):
        n_drop = int(missing_rate * L)
        for b in range(B):
            drop = rng.permutation(L - 1)[:n_drop] + 1
            X[b, drop, c] = np.nan
    return X


def preprocess_classification(
    X: np.ndarray,
    y: np.ndarray,
    lengths: Optional[np.ndarray] = None,
    use_intensity: bool = False,
    interpolation: str = "hermite",
    seed: int = 0,
    times: Optional[np.ndarray] = None,
) -> Dict:
    """Full pipeline -> dict of numpy arrays ready for fit_classifier.

    X: [B, L, C] raw series with NaN for missing; y: [B] int labels;
    lengths: per-sample observed length (final_index = lengths - 1).
    """
    B, L, C = X.shape
    if times is None:
        times = np.arange(L, dtype=np.float32)
    if lengths is None:
        lengths = np.full((B,), L, np.int64)
    final_index = np.asarray(lengths, np.int64) - 1

    tr, va, te = stratified_split(y, seed=seed)
    Xn = normalize_with_train_stats(X, tr)
    Xa = append_time_intensity(Xn, times, use_intensity)

    if interpolation == "hermite":
        coeffs = np.asarray(hermite_cubic_coeffs(times, Xa))
    elif interpolation == "natural":
        coeffs = np.asarray(
            natural_cubic_coeffs(times, Xa, pack=True)
        )
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")

    def subset(idx):
        return {
            "coeffs": coeffs[idx],
            "y": np.asarray(y)[idx],
            "final_index": final_index[idx],
        }

    return {
        "times": np.asarray(times, np.float32),
        "input_channels": Xa.shape[-1],
        "train": subset(tr),
        "val": subset(va),
        "test": subset(te),
    }


# ---------------------------------------------------------------------------
# Content-addressed cache (reference style 3: cached preprocessed tensors,
# datasets/sepsis.py:121-146)
# ---------------------------------------------------------------------------

def cache_path(name: str, **params) -> str:
    blob = repr(sorted(params.items())).encode()
    h = hashlib.sha1(blob).hexdigest()[:12]
    return os.path.join(CACHE_DIR, f"{name}_{h}.pkl")


def load_cached(path: str):
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    return None


def save_cached(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)
