"""Truncated log-signatures over sliding windows (Neural RDE support).

Replaces the `signatory.logsignature` + `torchcde.logsig_windows` dependency
used by the reference's `neuralrde-{1,2,3}` models
(/root/reference/torch-ists/torch_ists/_layer.py:9,214).

Implementation: for a piecewise-linear path, the signature of each linear
piece with increment v is exp(v) in the truncated tensor algebra
(1, v, v⊗v/2, v⊗v⊗v/6); window signatures combine by Chen's relation, and
log is the truncated tensor-series logarithm. Coordinates are reported in
the Lyndon-word basis (the standard logsignature coordinates):
  depth 1: d channels (increments)
  depth 2: + d(d-1)/2   (Lévy areas, words ij with i<j)
  depth 3: + (d^3 - d)/3 (Lyndon words of length 3)
All tensor ops are batched einsums — one fused XLA computation over
[batch, windows] with no Python loops over data.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["logsignature_channels", "logsig_windows", "lyndon_words"]


def lyndon_words(d: int, depth: int) -> List[Tuple[int, ...]]:
    """All Lyndon words over alphabet {0..d-1} of length <= depth (Duval)."""
    words = []
    w = [-1]
    while w:
        w[-1] += 1
        m = len(w)
        if m <= depth:
            words.append(tuple(w))
        while len(w) < depth:
            w.append(w[len(w) - m])
        while w and w[-1] == d - 1:
            w.pop()
    return sorted(words, key=lambda x: (len(x), x))


def logsignature_channels(d: int, depth: int) -> int:
    if depth == 1:
        return d
    if depth == 2:
        return d + d * (d - 1) // 2
    if depth == 3:
        return d + d * (d - 1) // 2 + (d**3 - d) // 3
    raise ValueError("depth must be 1, 2 or 3")


def _chen_product(a, b, depth):
    """Truncated tensor-algebra product of signatures a, b.
    a, b: tuples (s1 [..,d], s2 [..,d,d], s3 [..,d,d,d]) up to depth."""
    a1, a2, a3 = a
    b1, b2, b3 = b
    c1 = a1 + b1
    c2 = None
    c3 = None
    if depth >= 2:
        c2 = a2 + b2 + jnp.einsum("...i,...j->...ij", a1, b1)
    if depth >= 3:
        c3 = (
            a3
            + b3
            + jnp.einsum("...ij,...k->...ijk", a2, b1)
            + jnp.einsum("...i,...jk->...ijk", a1, b2)
        )
    return (c1, c2, c3)


def _exp_increment(v, depth):
    """Signature of a linear piece: exp(v) truncated."""
    s1 = v
    s2 = None
    s3 = None
    if depth >= 2:
        s2 = 0.5 * jnp.einsum("...i,...j->...ij", v, v)
    if depth >= 3:
        s3 = jnp.einsum("...i,...j,...k->...ijk", v, v, v) / 6.0
    return (s1, s2, s3)


def _log_signature(s, depth):
    """Truncated log of a signature (1, s1, s2, s3):
    log(1+x) = x - x^2/2 + x^3/3 with x = (s1, s2, s3)."""
    s1, s2, s3 = s
    l1 = s1
    l2 = None
    l3 = None
    if depth >= 2:
        x2_2 = jnp.einsum("...i,...j->...ij", s1, s1)
        l2 = s2 - 0.5 * x2_2
    if depth >= 3:
        # (x^2)_3 = s1⊗s2 + s2⊗s1 ; (x^3)_3 = s1⊗s1⊗s1
        x2_3 = jnp.einsum("...i,...jk->...ijk", s1, s2) + jnp.einsum(
            "...ij,...k->...ijk", s2, s1
        )
        x3_3 = jnp.einsum("...i,...j,...k->...ijk", s1, s1, s1)
        l3 = s3 - 0.5 * x2_3 + x3_3 / 3.0
    return (l1, l2, l3)


def _window_signature(path, depth):
    """path [..., W, d] -> truncated signature over the window via a scan of
    Chen products across the W-1 linear pieces."""
    incs = path[..., 1:, :] - path[..., :-1, :]       # [..., W-1, d]
    d = path.shape[-1]
    n = incs.shape[-2]
    batch_shape = path.shape[:-2]

    s1 = jnp.zeros(batch_shape + (d,), path.dtype)
    s2 = (
        jnp.zeros(batch_shape + (d, d), path.dtype) if depth >= 2 else None
    )
    s3 = (
        jnp.zeros(batch_shape + (d, d, d), path.dtype)
        if depth >= 3
        else None
    )
    sig = (s1, s2, s3)
    # W is small (window 4) -> unrolled python loop, fused by XLA
    for k in range(n):
        piece = _exp_increment(incs[..., k, :], depth)
        sig = _chen_product(sig, piece, depth)
    return sig


def logsig_windows(path, depth: int, window_length: int = 4,
                   times=None):
    """Split the time axis into windows, compute logsignature coordinates.

    path: [B, L, d] -> (new_times [n_windows+1], features
    [B, n_windows+1, channels]) where the first row carries the initial
    point (torchcde.logsig_windows convention: basepoint + per-window
    logsigs, so the result can be re-interpolated as a path)."""
    path = jnp.asarray(path)
    B, L, d = path.shape
    n_w = max((L - 1) // window_length, 1)
    usable = n_w * window_length + 1
    path = path[:, :usable]

    # [B, n_w, window+1, d] with shared boundary points
    idx = (
        np.arange(n_w)[:, None] * window_length
        + np.arange(window_length + 1)[None, :]
    )
    windows = path[:, idx, :]                         # [B, n_w, W+1, d]
    sig = _window_signature(windows, depth)
    logs = _log_signature(sig, depth)

    feats = [logs[0]]                                  # [B, n_w, d]
    if depth >= 2:
        iu = np.triu_indices(d, k=1)
        feats.append(logs[1][..., iu[0], iu[1]])
    if depth >= 3:
        words3 = [w for w in lyndon_words(d, 3) if len(w) == 3]
        l3 = logs[2]
        cols = jnp.stack(
            [l3[..., w[0], w[1], w[2]] for w in words3], axis=-1
        ) if words3 else jnp.zeros(logs[0].shape[:-1] + (0,), path.dtype)
        feats.append(cols)
    feat = jnp.concatenate(feats, axis=-1)             # [B, n_w, C]

    C = feat.shape[-1]
    first = jnp.zeros((B, 1, C), path.dtype)
    # carry the initial position in the depth-1 block of the first row
    first = first.at[..., 0, :d].set(path[:, 0, :])
    out = jnp.concatenate([first, feat], axis=1)      # [B, n_w+1, C]
    # cumulative depth-1 block so the logsig feature stream is itself a
    # path (cumsum of increments = position), torchcde convention
    out = out.at[..., 1:, :d].set(
        path[:, :1, :] + jnp.cumsum(feat[..., :d], axis=1)
    )
    # new_times must stay concrete (solver grids are host-side static);
    # compute with numpy so jit tracing doesn't lift it into the jaxpr.
    if times is not None:
        times_np = np.asarray(jax.device_get(times))[:usable]
        new_times = times_np[::window_length].astype(np.float32)
    else:
        new_times = np.arange(n_w + 1, dtype=np.float32)
    return new_times, out
