"""PhysioNet Sepsis 2019 dataset pipeline.

Rebuilds /root/reference/benchmark_classification/datasets/sepsis.py:20-154:
download the two training archives, parse `.psv` files onto the hourly
ICULOS grid (<= 72 h), static features (age, gender, unit1/2 -> one-hot,
hosp-adm-time), label = max(SepsisLabel), NaN for unobserved hours.

Network access is environment-gated: when the archives are absent and the
environment has no egress, `get_data(synthetic_fallback=True)` (default)
returns benchmark-shaped synthetic data from data.synthetic so every
downstream stage runs identically. PSV parsing uses the native C++ parser
when available.
"""

from __future__ import annotations

import os
import zipfile
from typing import Optional, Tuple

import numpy as np

from .common import cache_path, load_cached, save_cached
from .native import parse_psv_native

URLS = [
    "https://archive.physionet.org/users/shared/challenge-2019/training_setA.zip",
    "https://archive.physionet.org/users/shared/challenge-2019/training_setB.zip",
]

MAX_HOURS = 72
TS_COLUMNS = 34      # vital/lab time-series columns per PSV spec


def parse_psv(text: bytes):
    """Parse one PSV record -> (values [rows, cols], header list)."""
    native = parse_psv_native(text, max_rows=512, max_cols=64)
    header = text.split(b"\n", 1)[0].decode().split("|")
    if native is not None:
        arr, ncols = native
        return arr[:, : len(header)], header
    rows = []
    for line in text.decode().strip().split("\n")[1:]:
        rows.append([
            float(f) if f and f != "NaN" else np.nan
            for f in line.split("|")
        ])
    return np.asarray(rows, np.float32), header


def _process_record(values: np.ndarray, header) -> Optional[Tuple]:
    """One patient record -> (series [72, 34], static [5], label)."""
    cols = {name: i for i, name in enumerate(header)}
    iculos = values[:, cols["ICULOS"]].astype(int)
    keep = (iculos >= 1) & (iculos <= MAX_HOURS)
    if not keep.any():
        return None
    values = values[keep]
    iculos = iculos[keep]

    series = np.full((MAX_HOURS, TS_COLUMNS), np.nan, np.float32)
    series[iculos - 1] = values[:, :TS_COLUMNS]

    def stat(name, default=np.nan):
        i = cols.get(name)
        if i is None:
            return default
        v = values[:, i]
        v = v[np.isfinite(v)]
        return float(v[0]) if v.size else default

    static = np.asarray(
        [stat("Age"), stat("Gender"), stat("Unit1", 0.0),
         stat("Unit2", 0.0), stat("HospAdmTime", 0.0)],
        np.float32,
    )
    static = np.nan_to_num(static)
    label_col = cols.get("SepsisLabel")
    label = int(np.nanmax(values[:, label_col])) if label_col else 0
    return series, static, label


def load_from_archives(data_dir: str):
    """Parse all .psv records from the downloaded zips under data_dir."""
    all_series, all_static, all_labels = [], [], []
    for url in URLS:
        zpath = os.path.join(data_dir, os.path.basename(url))
        if not os.path.exists(zpath):
            raise FileNotFoundError(
                f"{zpath} missing — download the PhysioNet 2019 archives "
                f"into {data_dir} (no network egress in this environment)"
            )
        with zipfile.ZipFile(zpath) as zf:
            for name in zf.namelist():
                if not name.endswith(".psv"):
                    continue
                values, header = parse_psv(zf.read(name))
                rec = _process_record(values, header)
                if rec is not None:
                    all_series.append(rec[0])
                    all_static.append(rec[1])
                    all_labels.append(rec[2])
    X = np.stack(all_series)
    static = np.stack(all_static)
    y = np.asarray(all_labels, np.int64)
    lengths = np.full((X.shape[0],), MAX_HOURS, np.int64)
    times = np.arange(MAX_HOURS, dtype=np.float32)
    return X, static, y, lengths, times


def get_data(data_dir: Optional[str] = None, n_synthetic: int = 4096,
             synthetic_fallback: bool = True, seed: int = 0):
    """Returns (X [N,72,34], static [N,S], y [N], lengths [N], times [72])."""
    data_dir = data_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "snsde", "sepsis"
    )
    cp = cache_path("sepsis_parsed", dir=data_dir)
    cached = load_cached(cp)
    if cached is not None:
        return cached
    try:
        out = load_from_archives(data_dir)
        save_cached(cp, out)
        return out
    except FileNotFoundError:
        if not synthetic_fallback:
            raise
        from .synthetic import synthetic_sepsis

        return synthetic_sepsis(n=n_synthetic, seed=seed)
