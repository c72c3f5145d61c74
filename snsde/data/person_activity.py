"""PersonActivity (UCI localization) dataset.

Rebuilds /root/reference/benchmark_interpolation/person_activity.py (the
mTAN loader: 4 sensor tags x 3 coords on an irregular union grid, 7-class
activity labels). Download-gated with a synthetic fallback shaped the same
way ([N, L, 12] values + masks + per-step labels).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

URL = (
    "https://archive.ics.uci.edu/ml/machine-learning-databases/00196/"
    "ConfLongDemo_JSI.txt"
)
NUM_TAGS = 4
COORDS = 3
NUM_CLASSES = 7


def synthetic_person_activity(n: int = 512, length: int = 50,
                              observe_rate: float = 0.4, seed: int = 0):
    rng = np.random.default_rng(seed)
    D = NUM_TAGS * COORDS
    t = np.linspace(0, 1, length, dtype=np.float32)
    # piecewise-constant label segments (5-15 tps), matching the real
    # UCI data where activities persist over spans. iid per-tp labels
    # make the task unlearnable for the mTAN pipeline: its attention +
    # bidirectional GRU smooth the latent along time, and averaging over
    # neighbours with unrelated classes pins every model at chance
    # (measured: flat ln(7) loss over 30 epochs pre-fix)
    labels = np.zeros((n, length), np.int64)
    for i in range(n):
        pos = 0
        while pos < length:
            seg = int(rng.integers(5, 16))
            labels[i, pos:pos + seg] = rng.integers(0, NUM_CLASSES)
            pos += seg
    vals = np.zeros((n, length, D), np.float32)
    # per-(class, channel) phase offsets make the observed D-vector at a
    # time point a class-specific sinusoid signature — the per-tp
    # classification task (crectime_attention_activity.py classify_pertp)
    # is then actually learnable from partial observations (a single
    # shared channel pattern collides across classes at sin crossings and
    # caps every model at chance)
    phases = (2 * np.pi * np.arange(D) / D)[None, :] \
        + (2 * np.pi * np.arange(NUM_CLASSES) / NUM_CLASSES)[:, None]
    for c in range(NUM_CLASSES):
        pattern = np.sin(
            2 * np.pi * (c + 1) * t[:, None] + phases[c][None, :]
        )[None]                                   # [1, L, D]
        sel = labels == c
        vals += sel[..., None] * (
            pattern + 0.1 * rng.normal(size=(n, length, D))
        )
    mask = (rng.random((n, length, D)) < observe_rate).astype(np.float32)
    mask[:, 0] = 1.0
    tp = np.broadcast_to(t, (n, length)).copy()
    return (vals * mask).astype(np.float32), mask, tp, labels.astype(
        np.int64
    )


def parse_raw(path: str, length: int = 50):
    """Parse the raw UCI file -> per-sequence union-grid tensors."""
    tags = {}
    tag_ids = [
        "010-000-024-033", "010-000-030-096", "020-000-033-111",
        "020-000-032-221",
    ]
    activities = {}
    seqs = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 8:
                continue
            seq_id, tag, ts = parts[0], parts[1], float(parts[2])
            xyz = [float(parts[4]), float(parts[5]), float(parts[6])]
            act = parts[7]
            if tag not in tag_ids:
                continue
            activities.setdefault(act, len(activities))
            rec = seqs.setdefault(seq_id, [])
            rec.append((ts, tag_ids.index(tag), xyz, activities[act]))
    out_x, out_m, out_tp, out_y = [], [], [], []
    D = NUM_TAGS * COORDS
    for seq_id, events in seqs.items():
        events.sort()
        t0, t1 = events[0][0], events[-1][0]
        span = max(t1 - t0, 1e-9)
        x = np.zeros((length, D), np.float32)
        m = np.zeros((length, D), np.float32)
        y = np.zeros((length,), np.int64)
        for ts, tag_i, xyz, act in events:
            li = min(int((ts - t0) / span * (length - 1)), length - 1)
            x[li, tag_i * COORDS : (tag_i + 1) * COORDS] = xyz
            m[li, tag_i * COORDS : (tag_i + 1) * COORDS] = 1.0
            y[li] = act
        out_x.append(x)
        out_m.append(m)
        out_tp.append(np.linspace(0, 1, length, dtype=np.float32))
        out_y.append(y)
    return (np.stack(out_x), np.stack(out_m), np.stack(out_tp),
            np.stack(out_y))


def get_data(data_dir: Optional[str] = None, n_synthetic: int = 512,
             synthetic_fallback: bool = True, seed: int = 0):
    data_dir = data_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "snsde", "person_activity"
    )
    raw = os.path.join(data_dir, os.path.basename(URL))
    if os.path.exists(raw):
        return parse_raw(raw)
    if synthetic_fallback:
        return synthetic_person_activity(n=n_synthetic, seed=seed)
    raise FileNotFoundError(raw)
