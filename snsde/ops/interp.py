"""Control-path interpolation: cubic splines over (possibly missing-valued)
irregular time series.

TPU-native rebuild of the reference's two spline families
(cf. /root/reference/benchmark_classification/controldiffeq/interpolate.py and
the torchcde Hermite coefficients used at
/root/reference/benchmark_classification/datasets/common.py:82-84):

  * `natural_cubic_coeffs`  — NaN-aware natural cubic spline. The reference
    iterates Python-per-channel for missing values (interpolate.py:56-153);
    here the missing-value path is fixed-shape masked computation: observed
    knots are compacted to the front with a stable argsort, a masked Thomas
    solve runs over the padded system, and per-interval coefficients are
    re-expanded with a searchsorted + polynomial shift. Fully vmappable.
  * `hermite_cubic_coeffs`  — Hermite cubic with backward differences
    (torchcde's recommended interpolation). NaNs are filled by linear
    interpolation between observed knots with constant extension at the ends.
  * `linear_coeffs`         — linear control (for `neuralcde-l`).
  * `CubicPath` / `LinearPath` — `evaluate(t)` / `derivative(t)` via
    searchsorted bucket lookup + Horner evaluation, safe to call inside a
    solver scan.

All coefficient layouts match the reference convention: per-interval
(a, b, two_c, three_d) with evaluation
    X(t_i + s) = a + (b + (two_c/2 + three_d * s/3) * s) * s.
Packed layout concatenates the four blocks along the channel axis
([..., L-1, 4C]), interoperable with the reference's torchcde layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "natural_cubic_coeffs",
    "hermite_cubic_coeffs",
    "linear_coeffs",
    "rectilinear_coeffs",
    "fill_missing_linear",
    "CubicPath",
    "LinearPath",
    "pack_coeffs",
    "unpack_coeffs",
    "tridiagonal_solve",
]


# ---------------------------------------------------------------------------
# Tridiagonal (Thomas) solve, batched over leading dims, scan over length.
# ---------------------------------------------------------------------------

def tridiagonal_solve(b, A_upper, A_diagonal, A_lower):
    """Solves tridiagonal systems  A x = b  (Thomas algorithm).

    b:          [..., N] right-hand sides (batched over leading dims)
    A_upper:    [N-1] or [..., N-1]
    A_diagonal: [N]   or [..., N]
    A_lower:    [N-1] or [..., N-1]

    The sweep is a `lax.scan` over N; all batch work inside each step is
    vectorized, so the TPU sees N tiny fused VPU steps — the same structure
    as the solver scan. Singular leading minors are guarded with a tiny
    epsilon denominators clamp (reference relies on diagonal dominance).
    """
    b = jnp.asarray(b)
    N = b.shape[-1]
    A_upper = jnp.broadcast_to(jnp.asarray(A_upper), b.shape[:-1] + (N - 1,))
    A_lower = jnp.broadcast_to(jnp.asarray(A_lower), b.shape[:-1] + (N - 1,))
    A_diag = jnp.broadcast_to(jnp.asarray(A_diagonal), b.shape)

    # Move length axis to front for scan.
    perm = (b.ndim - 1,) + tuple(range(b.ndim - 1))
    inv_perm = tuple(np.argsort(perm))
    bT = jnp.transpose(b, perm)            # [N, ...]
    dT = jnp.transpose(A_diag, perm)       # [N, ...]
    uT = jnp.transpose(A_upper, perm)      # [N-1, ...]
    lT = jnp.transpose(A_lower, perm)      # [N-1, ...]

    eps = jnp.asarray(1e-30, b.dtype)

    def _safe_div(num, den):
        den = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
        return num / den

    # Forward sweep: c'_i = u_i / (d_i - l_{i-1} c'_{i-1});
    #                e_i  = (b_i - l_{i-1} e_{i-1}) / (d_i - l_{i-1} c'_{i-1})
    def fwd(carry, xs):
        cp_prev, e_prev = carry
        u_i, d_i, l_im1, b_i = xs
        denom = d_i - l_im1 * cp_prev
        cp = _safe_div(u_i, denom)
        e = _safe_div(b_i - l_im1 * e_prev, denom)
        return (cp, e), (cp, e)

    u_pad = jnp.concatenate([uT, jnp.zeros_like(uT[:1])], axis=0)   # [N,...]
    l_pad = jnp.concatenate([jnp.zeros_like(lT[:1]), lT], axis=0)   # [N,...]
    init = (jnp.zeros_like(bT[0]), jnp.zeros_like(bT[0]))
    _, (cps, es) = jax.lax.scan(fwd, init, (u_pad, dT, l_pad, bT))

    # Backward substitution: x_i = e_i - c'_i x_{i+1}
    def bwd(x_next, xs):
        cp_i, e_i = xs
        x_i = e_i - cp_i * x_next
        return x_i, x_i

    _, xsT = jax.lax.scan(bwd, jnp.zeros_like(bT[0]), (cps, es),
                          reverse=True)
    return jnp.transpose(xsT, inv_perm)


# ---------------------------------------------------------------------------
# Natural cubic spline (clean path)
# ---------------------------------------------------------------------------

def _natural_coeffs_clean(times, path):
    """times: [L]; path: [..., L] (channels/batch as leading dims).

    Returns (a, b, two_c, three_d), each [..., L-1]. Mirrors the math of the
    reference clean path (interpolate.py:7-53) — knot-derivative tridiagonal
    system, then per-interval coefficients.
    """
    L = path.shape[-1]
    if L == 2:
        a = path[..., :1]
        b = (path[..., 1:] - path[..., :1]) / (times[..., 1:] - times[..., :1])
        zero = jnp.zeros_like(a)
        return a, b, zero, zero

    h = times[1:] - times[:-1]                      # [L-1]
    rh = 1.0 / h
    rh2 = rh * rh
    diffs = path[..., 1:] - path[..., :-1]          # [..., L-1]
    three_diffs_scaled = 3.0 * diffs * rh2

    # Tridiagonal system for knot derivatives (natural boundary conditions).
    diag = jnp.zeros((L,), path.dtype)
    diag = diag.at[:-1].add(rh)
    diag = diag.at[1:].add(rh)
    diag = 2.0 * diag
    rhs = jnp.zeros(path.shape[:-1] + (L,), path.dtype)
    rhs = rhs.at[..., :-1].add(three_diffs_scaled)
    rhs = rhs.at[..., 1:].add(three_diffs_scaled)
    knot_derivs = tridiagonal_solve(rhs, rh, diag, rh)  # [..., L]

    m0 = knot_derivs[..., :-1]
    m1 = knot_derivs[..., 1:]
    a = path[..., :-1]
    b = m0
    two_c = (6.0 * diffs * rh - 4.0 * m0 - 2.0 * m1) * rh
    three_d = (-6.0 * diffs * rh + 3.0 * (m0 + m1)) * rh2
    return a, b, two_c, three_d


# ---------------------------------------------------------------------------
# Natural cubic spline (missing-value path) — fixed-shape masked computation
# ---------------------------------------------------------------------------

def _natural_coeffs_missing_1d(times, path):
    """NaN-aware natural cubic fit for one scalar channel. times,path: [L].

    Fixed-shape equivalent of the reference's per-channel Python loop
    (interpolate.py:78-153): impute endpoints, compact observed knots to the
    front, masked tridiagonal fit on the compacted system, then expand
    interval coefficients back to every grid interval via polynomial shift.
    """
    L = path.shape[-1]
    dtype = path.dtype
    obs = jnp.isfinite(path)
    n_raw = jnp.sum(obs)
    any_obs = n_raw > 0

    # Impute endpoints with first/last observed value.
    idx_first = jnp.argmax(obs)                            # first observed
    idx_last = L - 1 - jnp.argmax(obs[::-1])               # last observed
    safe_path = jnp.where(obs, path, 0.0)
    first_val = safe_path[idx_first]
    last_val = safe_path[idx_last]
    path = jnp.where(obs, path, jnp.nan)
    path = path.at[0].set(jnp.where(obs[0], path[0], first_val))
    path = path.at[-1].set(jnp.where(obs[-1], path[-1], last_val))
    obs = jnp.isfinite(path)
    n = jnp.sum(obs)                                       # >= 2 if any_obs

    # Compact observed entries to the front (stable order).
    order = jnp.argsort(jnp.logical_not(obs), stable=True)  # observed first
    t_obs = times[order]
    x_obs = jnp.where(obs[order], path[order], 0.0)

    # Pad the tail with a fake increasing grid so h > 0 everywhere; rows
    # beyond n are masked out of the system below.
    pos = jnp.arange(L)
    valid = pos < n
    t_last = t_obs[jnp.maximum(n - 1, 0)]
    t_pad = t_last + (pos - (n - 1)).astype(dtype)
    t_obs = jnp.where(valid, t_obs, t_pad)
    x_last = x_obs[jnp.maximum(n - 1, 0)]
    x_obs = jnp.where(valid, x_obs, x_last)

    # Masked natural-cubic fit on the compacted sequence of length n.
    h = t_obs[1:] - t_obs[:-1]
    rh = 1.0 / h
    interval_valid = pos[:-1] < (n - 1)                    # [L-1]
    rh = jnp.where(interval_valid, rh, 0.0)
    rh2 = rh * rh
    diffs = x_obs[1:] - x_obs[:-1]
    three_diffs_scaled = 3.0 * diffs * rh2

    diag = jnp.zeros((L,), dtype)
    diag = diag.at[:-1].add(rh)
    diag = diag.at[1:].add(rh)
    diag = 2.0 * diag
    # Knots beyond n: identity rows (derivative 0, decoupled).
    diag = jnp.where(pos < n, diag, 1.0)
    diag = jnp.where(diag == 0.0, 1.0, diag)               # n==1 guard
    rhs = jnp.zeros((L,), dtype)
    rhs = rhs.at[:-1].add(three_diffs_scaled)
    rhs = rhs.at[1:].add(three_diffs_scaled)
    rhs = jnp.where(pos < n, rhs, 0.0)
    knot_derivs = tridiagonal_solve(rhs, rh, diag, rh)

    m0 = knot_derivs[:-1]
    m1 = knot_derivs[1:]
    a_c = x_obs[:-1]
    b_c = m0
    two_c_c = (6.0 * diffs * rh - 4.0 * m0 - 2.0 * m1) * rh
    three_d_c = (-6.0 * diffs * rh + 3.0 * (m0 + m1)) * rh2

    # n == 2 special case is already covered: the tridiagonal system with a
    # single interval and natural BCs yields the straight line.

    # Expand: for grid interval i (start time τ_i), find compacted interval
    # j : t_obs[j] <= τ_i < t_obs[j+1]; shift the cubic to local offset.
    tau = times[:-1]
    j = jnp.searchsorted(t_obs, tau, side="right") - 1
    j = jnp.clip(j, 0, jnp.maximum(n - 2, 0))
    offset = t_obs[j] - tau                                # <= 0
    aj, bj, cj2, dj3 = a_c[j], b_c[j], two_c_c[j], three_d_c[j]
    # p(s) about new origin: p(offset + s) expanded in s.
    a_i = aj + (((0.5 * cj2 - dj3 * offset / 3.0) * offset - bj) * offset)
    # NOTE: reference computes a + (a_inner - b)*offset with
    # a_inner = (0.5*two_c - three_d*offset/3)*offset ; identical algebra.
    b_i = bj + (dj3 * offset - cj2) * offset
    two_c_i = cj2 - 2.0 * dj3 * offset
    three_d_i = dj3

    zeros = jnp.zeros((L - 1,), dtype)
    pick = lambda v: jnp.where(any_obs, v, zeros)
    return pick(a_i), pick(b_i), pick(two_c_i), pick(three_d_i)


def natural_cubic_coeffs(times, series, *, pack: bool = False):
    """Natural cubic spline coefficients.

    times:  [L] strictly increasing.
    series: [..., L, C]; NaNs mark missing observations.

    Returns (a, b, two_c, three_d) each [..., L-1, C], or the packed
    [..., L-1, 4C] tensor when `pack=True`.
    """
    times = jnp.asarray(times)
    series = jnp.asarray(series)
    x = jnp.swapaxes(series, -1, -2)       # [..., C, L]

    has_nan = None
    if isinstance(series, (np.ndarray,)) or not isinstance(
        jnp.asarray(series), jax.core.Tracer
    ):
        try:
            has_nan = bool(np.isnan(np.asarray(series)).any())
        except Exception:
            has_nan = None

    if has_nan is False:
        a, b, two_c, three_d = _natural_coeffs_clean(times, x)
    else:
        flat = x.reshape((-1, x.shape[-1]))
        fn = jax.vmap(_natural_coeffs_missing_1d, in_axes=(None, 0))
        a, b, two_c, three_d = fn(times, flat)
        shape = x.shape[:-1] + (x.shape[-1] - 1,)
        a, b = a.reshape(shape), b.reshape(shape)
        two_c, three_d = two_c.reshape(shape), three_d.reshape(shape)

    out = tuple(jnp.swapaxes(v, -1, -2) for v in (a, b, two_c, three_d))
    return pack_coeffs(*out) if pack else out


# ---------------------------------------------------------------------------
# Linear fill of missing values + Hermite cubic with backward differences
# ---------------------------------------------------------------------------

def fill_missing_linear(times, series):
    """Linearly interpolate NaNs per channel; constant extension at ends;
    all-NaN channels become zeros. series: [..., L, C]. Fixed shapes."""
    times = jnp.asarray(times)
    series = jnp.asarray(series)
    x = jnp.swapaxes(series, -1, -2)       # [..., C, L]
    L = x.shape[-1]
    pos = jnp.arange(L)

    obs = jnp.isfinite(x)
    xv = jnp.where(obs, x, 0.0)

    axis = x.ndim - 1
    # Index of the most recent observation at or before each position.
    prev_idx = jnp.where(obs, pos, -1)
    prev_idx = jax.lax.associative_scan(jnp.maximum, prev_idx, axis=axis)
    # Index of the next observation at or after each position.
    next_idx = jnp.where(obs, pos, L)
    next_idx = jax.lax.associative_scan(
        jnp.minimum, next_idx, axis=axis, reverse=True
    )

    has_prev = prev_idx >= 0
    has_next = next_idx < L
    pi = jnp.clip(prev_idx, 0, L - 1)
    ni = jnp.clip(next_idx, 0, L - 1)
    xp = jnp.take_along_axis(xv, pi, axis=-1)
    xn = jnp.take_along_axis(xv, ni, axis=-1)
    tp = times[pi]
    tn = times[ni]
    denom = jnp.where(ni == pi, 1.0, tn - tp)
    w = (times[None, :] - tp) / denom
    interp = xp + w * (xn - xp)

    filled = jnp.where(
        has_prev & has_next,
        jnp.where(prev_idx == next_idx, xp, interp),
        jnp.where(has_prev, xp, jnp.where(has_next, xn, 0.0)),
    )
    return jnp.swapaxes(filled, -1, -2)


def hermite_cubic_coeffs(times, series, *, pack: bool = True):
    """Hermite cubic coefficients with backward differences (torchcde
    semantics, cf. datasets/common.py:82-84 usage in the reference).

    times: [L]; series: [..., L, C] (NaN = missing).
    Knot derivative m_k = (x_k - x_{k-1})/h_{k-1} for k>=1, m_0 = m_1.
    Returns packed [..., L-1, 4C] by default (the layout the reference
    passes through DataLoaders), or the 4-tuple when pack=False.
    """
    times = jnp.asarray(times)
    x = fill_missing_linear(times, series)           # [..., L, C]
    h = (times[1:] - times[:-1])[..., :, None]       # [L-1, 1]
    diffs = x[..., 1:, :] - x[..., :-1, :]
    slopes = diffs / h                                # [..., L-1, C]
    m = jnp.concatenate([slopes[..., :1, :], slopes], axis=-2)  # [..., L, C]
    m0 = m[..., :-1, :]
    m1 = m[..., 1:, :]

    a = x[..., :-1, :]
    b = m0
    two_c = 2.0 * (3.0 * slopes - 2.0 * m0 - m1) / h
    three_d = 3.0 * (m0 + m1 - 2.0 * slopes) / (h * h)
    out = (a, b, two_c, three_d)
    return pack_coeffs(*out) if pack else out


def linear_coeffs(times, series):
    """Linear control path coefficients: just the NaN-filled values [..., L, C]."""
    return fill_missing_linear(times, series)


def rectilinear_coeffs(times, series, time_index: int = 0):
    """Rectilinear ("cadlag-style") control: forward-fill values and
    interleave time/value updates, doubling the length axis.

    Returns (new_times [2L-1], values [..., 2L-1, C]) to feed `linear_coeffs`-
    style LinearPath. Channel `time_index` carries time.
    """
    times = jnp.asarray(times)
    x = fill_missing_linear(times, series)
    L = x.shape[-2]
    # knots: (t0,x0) -> (t1,x0) -> (t1,x1) -> (t2,x1) -> ...
    reps = jnp.repeat(x, 2, axis=-2)[..., : 2 * L - 1, :]   # x0 x0 x1 x1 ...
    vals = jnp.concatenate([x[..., :1, :], reps[..., :-1, :]], axis=-2)
    t_reps = jnp.repeat(times, 2)[1:]                        # t0 t1 t1 t2 t2..
    new_times = jnp.concatenate([times[:1], t_reps[:-1]])
    if time_index is not None:
        # time channel must advance with the horizontal move
        tcol = jnp.broadcast_to(
            new_times[..., :, None], vals.shape[:-1] + (1,)
        )
        vals = vals.at[..., time_index].set(tcol[..., 0])
    return new_times, vals


# ---------------------------------------------------------------------------
# Packing helpers
# ---------------------------------------------------------------------------

def pack_coeffs(a, b, two_c, three_d):
    return jnp.concatenate([a, b, two_c, three_d], axis=-1)


def unpack_coeffs(packed):
    C = packed.shape[-1] // 4
    return (
        packed[..., :C],
        packed[..., C : 2 * C],
        packed[..., 2 * C : 3 * C],
        packed[..., 3 * C :],
    )


# ---------------------------------------------------------------------------
# Path objects
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CubicPath:
    """Piecewise-cubic control path. Mirrors the reference's
    NaturalCubicSpline/torchcde.CubicSpline evaluation semantics
    (interpolate.py:229-281): scalar-t bucket lookup then Horner.

    coeffs: packed [..., L-1, 4C] or 4-tuple of [..., L-1, C].
    times:  [L].
    `evaluate`/`derivative` accept scalar t or arbitrary-shaped t arrays
    (broadcast against batch dims as t[..., None]-style gather).
    """

    times: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    two_c: jnp.ndarray
    three_d: jnp.ndarray

    def __init__(self, coeffs, times):
        if isinstance(coeffs, (tuple, list)):
            a, b, two_c, three_d = coeffs
        else:
            a, b, two_c, three_d = unpack_coeffs(jnp.asarray(coeffs))
        # keep host-provided knot times as numpy: solver grids are static,
        # and jnp.asarray inside a jit trace would lift them into tracers,
        # defeating evaluate_grid's host-side bucket resolution
        if not isinstance(times, np.ndarray):
            times = jnp.asarray(times)
        object.__setattr__(self, "times", times)
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "two_c", two_c)
        object.__setattr__(self, "three_d", three_d)

    def tree_flatten(self):
        return (self.times, self.a, self.b, self.two_c, self.three_d), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        times, a, b, two_c, three_d = children
        obj = object.__new__(cls)
        object.__setattr__(obj, "times", times)
        object.__setattr__(obj, "a", a)
        object.__setattr__(obj, "b", b)
        object.__setattr__(obj, "two_c", two_c)
        object.__setattr__(obj, "three_d", three_d)
        return obj

    @property
    def channels(self):
        return self.a.shape[-1]

    def _interp(self, t):
        t = jnp.asarray(t)
        times = jnp.asarray(self.times)
        idx = jnp.searchsorted(times, t, side="left") - 1
        idx = jnp.clip(idx, 0, self.a.shape[-2] - 1)
        frac = t - times[idx]
        return frac, idx

    def _gather(self, coeff, idx):
        # coeff: [..., L-1, C]; idx: scalar or [...]
        if idx.ndim == 0:
            return coeff[..., idx, :]
        return jnp.take(coeff, idx, axis=-2)

    def evaluate(self, t):
        frac, idx = self._interp(t)
        a = self._gather(self.a, idx)
        b = self._gather(self.b, idx)
        two_c = self._gather(self.two_c, idx)
        three_d = self._gather(self.three_d, idx)
        if frac.ndim:
            frac = frac[..., None]
        inner = 0.5 * two_c + three_d * frac / 3.0
        inner = b + inner * frac
        return a + inner * frac

    def evaluate_grid(self, ts_concrete):
        """Evaluate at a CONCRETE grid of times [M] -> [M, ..., C].

        Bucket indices are resolved host-side (numpy searchsorted), so the
        device program is a single static take + fused Horner FMA — the
        fast path for solver-grid precomputation (no per-point dynamic
        gather chain)."""
        ts = np.asarray(jax.device_get(ts_concrete), np.float64)
        try:
            times_np = np.asarray(jax.device_get(self.times), np.float64)
        except Exception:
            # knot times were traced (constant-lifted under jit): fall back
            # to the dynamic-gather path
            return jax.vmap(self.evaluate)(
                jnp.asarray(ts, self.a.dtype)
            )
        idx = np.clip(
            np.searchsorted(times_np, ts, side="left") - 1,
            0, self.a.shape[-2] - 1,
        )
        frac = jnp.asarray(
            (ts - times_np[idx]).astype(np.float32)
        ).reshape((-1,) + (1,) * self.a.ndim)        # [M, 1.., 1]
        take = lambda c: jnp.take(c, jnp.asarray(idx), axis=-2)
        # take moves the selected axis content but keeps position: result
        # [..., M, C]; move M to front
        a = jnp.moveaxis(take(self.a), -2, 0)
        b = jnp.moveaxis(take(self.b), -2, 0)
        two_c = jnp.moveaxis(take(self.two_c), -2, 0)
        three_d = jnp.moveaxis(take(self.three_d), -2, 0)
        frac = frac.reshape((len(idx),) + (1,) * (a.ndim - 1))
        inner = 0.5 * two_c + three_d * frac / 3.0
        return a + (b + inner * frac) * frac

    def derivative(self, t):
        frac, idx = self._interp(t)
        b = self._gather(self.b, idx)
        two_c = self._gather(self.two_c, idx)
        three_d = self._gather(self.three_d, idx)
        if frac.ndim:
            frac = frac[..., None]
        inner = two_c + three_d * frac
        return b + inner * frac

    def derivative_grid(self, ts_concrete):
        """dX/dt at a CONCRETE grid of times [M] -> [M, ..., C].

        Same host-side bucket resolution as `evaluate_grid` — the fast
        path for precomputing control-derivative streams on solver grids
        (kernels/fused_cde.py)."""
        ts = np.asarray(jax.device_get(ts_concrete), np.float64)
        try:
            times_np = np.asarray(jax.device_get(self.times), np.float64)
        except Exception:
            return jax.vmap(self.derivative)(jnp.asarray(ts, self.a.dtype))
        idx = np.clip(
            np.searchsorted(times_np, ts, side="left") - 1,
            0, self.a.shape[-2] - 1,
        )
        take = lambda c: jnp.moveaxis(
            jnp.take(c, jnp.asarray(idx), axis=-2), -2, 0
        )
        b = take(self.b)
        two_c = take(self.two_c)
        three_d = take(self.three_d)
        frac = jnp.asarray(
            (ts - times_np[idx]).astype(np.float32)
        ).reshape((len(idx),) + (1,) * (b.ndim - 1))
        return b + (two_c + three_d * frac) * frac


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LinearPath:
    """Piecewise-linear control path over knot values [..., L, C]."""

    times: jnp.ndarray
    values: jnp.ndarray

    def tree_flatten(self):
        return (self.times, self.values), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def _interp(self, t):
        t = jnp.asarray(t)
        times = jnp.asarray(self.times)
        idx = jnp.searchsorted(times, t, side="left") - 1
        idx = jnp.clip(idx, 0, self.values.shape[-2] - 2)
        return t - times[idx], idx

    def evaluate(self, t):
        frac, idx = self._interp(t)
        x0 = jnp.take(self.values, idx, axis=-2) if idx.ndim else self.values[..., idx, :]
        x1 = (
            jnp.take(self.values, idx + 1, axis=-2)
            if idx.ndim
            else self.values[..., idx + 1, :]
        )
        times = jnp.asarray(self.times)
        h = times[idx + 1] - times[idx]
        w = frac / h
        if jnp.ndim(w):
            w = w[..., None]
        return x0 + w * (x1 - x0)

    def derivative(self, t):
        _, idx = self._interp(t)
        x0 = jnp.take(self.values, idx, axis=-2) if idx.ndim else self.values[..., idx, :]
        x1 = (
            jnp.take(self.values, idx + 1, axis=-2)
            if idx.ndim
            else self.values[..., idx + 1, :]
        )
        times = jnp.asarray(self.times)
        h = times[idx + 1] - times[idx]
        d = (x1 - x0) / (h[..., None] if jnp.ndim(h) else h)
        return d

    def derivative_grid(self, ts_concrete):
        """dX/dt at a CONCRETE grid of times [M] -> [M, ..., C] with
        host-resolved buckets (CubicPath.derivative_grid analogue)."""
        ts = np.asarray(jax.device_get(ts_concrete), np.float64)
        try:
            times_np = np.asarray(jax.device_get(self.times), np.float64)
        except Exception:
            return jax.vmap(self.derivative)(
                jnp.asarray(ts, self.values.dtype)
            )
        idx = np.clip(
            np.searchsorted(times_np, ts, side="left") - 1,
            0, self.values.shape[-2] - 2,
        )
        x0 = jnp.moveaxis(jnp.take(self.values, jnp.asarray(idx), axis=-2),
                          -2, 0)
        x1 = jnp.moveaxis(
            jnp.take(self.values, jnp.asarray(idx + 1), axis=-2), -2, 0
        )
        h = jnp.asarray(
            (times_np[idx + 1] - times_np[idx]).astype(np.float32)
        ).reshape((len(idx),) + (1,) * (x0.ndim - 1))
        return (x1 - x0) / h
