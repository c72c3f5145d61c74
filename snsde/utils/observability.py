"""Tracing, profiling, and memory accounting (aux subsystems, SURVEY.md §5).

The reference's only observability is CUDA memory deltas recorded into the
results JSON (common_sde.py:250-279) plus tqdm lines. Here:
  * `profile_trace(path)` — context manager around `jax.profiler` traces
    (view in TensorBoard / xprof);
  * `device_memory_stats()` / `memory_delta()` — per-device live/peak bytes
    (fills the same memory_usage field in results payloads);
  * `StepTimer` — lightweight per-step wall timing with percentile summary;
  * `log_jsonl` — structured event sink (the tensorboardX-equivalent
    scalar stream, greppable and plottable).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

__all__ = ["profile_trace", "device_memory_stats", "memory_delta",
           "StepTimer", "log_jsonl", "seed_everything"]


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace for everything inside the block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats (bytes) where the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        stats = {}
        try:
            ms = d.memory_stats()
            if ms:
                stats = {
                    "bytes_in_use": int(ms.get("bytes_in_use", 0)),
                    "peak_bytes_in_use": int(ms.get("peak_bytes_in_use", 0)),
                    "bytes_limit": int(ms.get("bytes_limit", 0)),
                }
        except Exception:
            pass
        out[str(d)] = stats
    return out


class memory_delta:
    """Context manager recording the peak-memory delta across the block
    (the reference's reset_max_memory_allocated/max_memory_allocated
    pattern, common_sde.py:250-279)."""

    def __enter__(self):
        self.baseline = sum(
            s.get("bytes_in_use", 0)
            for s in device_memory_stats().values()
        )
        return self

    def __exit__(self, *exc):
        stats = device_memory_stats()
        self.peak = sum(
            s.get("peak_bytes_in_use", 0) for s in stats.values()
        )
        self.delta = max(self.peak - self.baseline, 0)
        return False


class StepTimer:
    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
            "steps": len(arr),
        }


def log_jsonl(path: str, record: Dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    record = dict(record)
    record.setdefault("ts", time.time())
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def seed_everything(seed: int):
    """Reference seed_everything equivalent (model_run.py:32-41). In JAX
    determinism is structural (explicit keys); this seeds the host-side
    numpy/python RNGs used in batching/splits and returns a root key."""
    import random

    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
