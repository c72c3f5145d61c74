"""UEA/UCR multivariate archive: .ts file parser + equal-length resampling.

Rebuilds /root/reference/torch-ists/torch_ists/_utils.py:15-110 and
benchmark_classification/datasets/uea.py:17-178 without the sktime
dependency: a self-contained `.ts` format parser (the sktime loader's
essential subset — @problemName/@timestamps/@univariate headers, colon-
separated dimensions, comma-separated values, class label last), linear
interpolation to equal length, label re-indexing.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .common import cache_path, load_cached, save_cached

ARCHIVE_URL = (
    "http://www.timeseriesclassification.com/aeon-toolkit/Archives/"
    "Multivariate2018_ts.zip"
)


def parse_ts_file(path: str) -> Tuple[List[List[np.ndarray]], List[str]]:
    """Parse a .ts file -> (cases: list of [dim arrays], labels)."""
    cases, labels = [], []
    in_data = False
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if line.lower().startswith("@data"):
                in_data = True
                continue
            if line.startswith("@"):
                continue
            if not in_data:
                continue
            parts = line.split(":")
            label = parts[-1]
            dims = []
            for dim_str in parts[:-1]:
                vals = [
                    float(v) if v and v != "?" else np.nan
                    for v in dim_str.split(",")
                ]
                dims.append(np.asarray(vals, np.float32))
            cases.append(dims)
            labels.append(label)
    return cases, labels


def equal_length(cases, target_len: Optional[int] = None) -> np.ndarray:
    """Linear-resample every dimension to a common length -> [N, L, D]
    (the reference interpolates unequal-length series the same way,
    _utils.py:78-103)."""
    n_dims = len(cases[0])
    max_len = target_len or max(
        max(len(d) for d in dims) for dims in cases
    )
    out = np.zeros((len(cases), max_len, n_dims), np.float32)
    xs_new = np.linspace(0.0, 1.0, max_len)
    for i, dims in enumerate(cases):
        for d, arr in enumerate(dims):
            if len(arr) == max_len:
                out[i, :, d] = arr
            elif len(arr) < 2:
                out[i, :, d] = arr[0] if len(arr) else 0.0
            else:
                xs_old = np.linspace(0.0, 1.0, len(arr))
                finite = np.isfinite(arr)
                if finite.sum() < 2:
                    out[i, :, d] = np.nan_to_num(arr[:1]).repeat(max_len)
                else:
                    out[i, :, d] = np.interp(
                        xs_new, xs_old[finite], arr[finite]
                    )
    return out


def load_dataset(name: str, data_dir: str):
    """Load <name>_TRAIN.ts / <name>_TEST.ts from data_dir/<name>/,
    auto-extracting them from a downloaded Multivariate2018_ts.zip if the
    directory is missing (the reference unzips manually; uea.py:17-41)."""
    base = os.path.join(data_dir, name)
    train_p = os.path.join(base, f"{name}_TRAIN.ts")
    test_p = os.path.join(base, f"{name}_TEST.ts")
    if not (os.path.exists(train_p) and os.path.exists(test_p)):
        zpath = os.path.join(data_dir, os.path.basename(ARCHIVE_URL))
        if os.path.exists(zpath):
            import zipfile

            with zipfile.ZipFile(zpath) as zf:
                members = [
                    m for m in zf.namelist()
                    if f"/{name}/" in f"/{m}" and m.endswith(".ts")
                    and ".." not in m and not m.startswith("/")
                ]
                for m in members:
                    target = os.path.join(base, os.path.basename(m))
                    os.makedirs(base, exist_ok=True)
                    with zf.open(m) as src, open(target, "wb") as dst:
                        dst.write(src.read())
    if not (os.path.exists(train_p) and os.path.exists(test_p)):
        raise FileNotFoundError(
            f"{train_p} missing — extract the UEA archive into {data_dir}"
        )
    tr_cases, tr_labels = parse_ts_file(train_p)
    te_cases, te_labels = parse_ts_file(test_p)
    all_cases = tr_cases + te_cases
    X = equal_length(all_cases)
    label_names = sorted(set(tr_labels + te_labels))
    label_map = {l: i for i, l in enumerate(label_names)}
    y = np.asarray([label_map[l] for l in tr_labels + te_labels], np.int64)
    return X, y


def get_data(name: str = "BasicMotions", data_dir: Optional[str] = None,
             n_synthetic: int = 512, synthetic_fallback: bool = True,
             seed: int = 0):
    """Returns (X [N,L,D], y [N], times [L])."""
    data_dir = data_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "snsde", "uea"
    )
    cp = cache_path("uea", dataset=name, dir=data_dir)
    cached = load_cached(cp)
    if cached is not None:
        return cached
    try:
        X, y = load_dataset(name, data_dir)
        times = np.linspace(0.0, 1.0, X.shape[1], dtype=np.float32)
        out = (X, y, times)
        save_cached(cp, out)
        return out
    except FileNotFoundError:
        if not synthetic_fallback:
            raise
        from .synthetic import synthetic_uea

        return synthetic_uea(n=n_synthetic, seed=seed)
