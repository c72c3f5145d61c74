"""ctypes binding for the native (C++) host-side data path.

Builds `snsde/_native/libsnsde_data.so` on first use if the toolchain is
available; every entry point has a pure-Python/JAX fallback so the library
is optional. The native path accelerates the preprocessing stages the
reference runs in Python/pandas (SURVEY.md §2.6): NaN-aware spline
coefficient fitting, linear-fill Hermite coefficients, per-channel deltas,
missingness injection, PSV parsing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "_native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsnsde_data.so"))

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SNSDE_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    fp = ctypes.POINTER(ctypes.c_float)
    lib.snsde_natural_cubic_coeffs.argtypes = [fp, fp] + \
        [ctypes.c_int64] * 3 + [fp] * 4
    lib.snsde_hermite_coeffs.argtypes = [fp, fp] + \
        [ctypes.c_int64] * 3 + [fp] * 4
    lib.snsde_compute_delta.argtypes = [fp, fp] + [ctypes.c_int64] * 3 + [fp]
    lib.snsde_inject_missingness.argtypes = [fp] + [ctypes.c_int64] * 3 + [
        ctypes.c_float, ctypes.c_uint64
    ]
    lib.snsde_parse_psv.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, fp, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.snsde_parse_psv.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def natural_cubic_coeffs_native(times: np.ndarray, x: np.ndarray):
    """[B, L, C] -> packed [B, L-1, 4C] (or None if lib unavailable)."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    times = np.ascontiguousarray(times, np.float32)
    B, L, C = x.shape
    outs = [np.empty((B, L - 1, C), np.float32) for _ in range(4)]
    lib.snsde_natural_cubic_coeffs(
        _fptr(x), _fptr(times), B, L, C, *map(_fptr, outs)
    )
    return np.concatenate(outs, axis=-1)


def hermite_coeffs_native(times: np.ndarray, x: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    times = np.ascontiguousarray(times, np.float32)
    B, L, C = x.shape
    outs = [np.empty((B, L - 1, C), np.float32) for _ in range(4)]
    lib.snsde_hermite_coeffs(
        _fptr(x), _fptr(times), B, L, C, *map(_fptr, outs)
    )
    return np.concatenate(outs, axis=-1)


def compute_delta_native(times: np.ndarray, mask: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.float32)
    times = np.ascontiguousarray(times, np.float32)
    B, L, C = mask.shape
    out = np.empty((B, L, C), np.float32)
    lib.snsde_compute_delta(_fptr(mask), _fptr(times), B, L, C, _fptr(out))
    return out


def inject_missingness_native(x: np.ndarray, rate: float, seed: int):
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32).copy()
    B, L, C = x.shape
    lib.snsde_inject_missingness(_fptr(x), B, L, C, ctypes.c_float(rate),
                                 ctypes.c_uint64(seed))
    return x


def parse_psv_native(text: bytes, max_rows: int = 4096,
                     max_cols: int = 64) -> Optional[Tuple[np.ndarray, int]]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((max_rows * max_cols,), np.float32)
    n_cols = ctypes.c_int64(0)
    rows = lib.snsde_parse_psv(
        text, len(text), _fptr(out), max_rows, max_cols,
        ctypes.byref(n_cols),
    )
    nc = int(n_cols.value)
    # the C side writes row-major with stride n_cols
    return out[: rows * nc].reshape(rows, nc).copy(), nc
