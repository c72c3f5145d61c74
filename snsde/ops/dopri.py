"""Adaptive Dormand–Prince 5(4) ODE solver as a bounded `lax.while_loop`.

TPU-native replacement for the reference's adaptive solvers
(/root/reference/benchmark_forecasting/TorchDiffEqPack/odesolver/adaptive_grid_solver.py:17-439
and torchdiffeq's dopri5): PI step-size control, 4th-order dense output for
off-step evaluation, fixed iteration bound so the compiled program has a
static upper limit.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["odeint_dopri5"]

# Dormand–Prince tableau
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    np.array([]),
    np.array([1 / 5]),
    np.array([3 / 40, 9 / 40]),
    np.array([44 / 45, -56 / 15, 32 / 9]),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
# dense output (4th order) interpolation coefficients
_BMID = np.array(
    [
        6025192743 / 30085553152,
        0.0,
        51252292925 / 65400821598,
        -2691868925 / 45128329728,
        187940372067 / 1594534317056,
        -1776094331 / 19743644256,
        11237099 / 235043384,
    ]
)


def odeint_dopri5(
    f: Callable,
    y0,
    ts,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-7,
    max_steps: int = 4096,
    safety: float = 0.9,
    min_factor: float = 0.2,
    max_factor: float = 10.0,
    differentiable: bool = False,
):
    """Adaptive RK45. ts: [T] concrete output times. Returns [T, ...shape].

    Dense output: cubic Hermite interpolation between accepted steps using
    (y, f) at both ends — 4th-order accurate, matching torchdiffeq's default
    usage pattern for output-time evaluation.

    `differentiable=True` replaces the `while_loop` with a masked
    `lax.scan` over exactly `max_steps` iterations (choose a modest bound,
    e.g. 256 — every iteration costs 6 f-evals whether or not the solve
    has finished): identical results, reverse-mode AD works. Step-size
    control (accept/reject, h adaptation) is wrapped in stop_gradient, so
    gradients flow through the state chain on the realized grid — the
    discretize-then-optimize semantics, the same policy as
    `sdeint_adaptive(differentiable=True)` and the reference's
    TorchDiffEqPack checkpointed adjoint (odesolver_mem/adjoint.py).

    If `max_steps` is exhausted before the last output time, the
    unreached outputs are NaN — never a silent partial integration.
    """
    ts_np = np.asarray(jax.device_get(ts), dtype=np.float64)
    dtype = jnp.result_type(y0)
    y0 = jnp.asarray(y0, dtype)
    t0 = jnp.asarray(ts_np[0], dtype)
    t_final = jnp.asarray(ts_np[-1], dtype)
    ts_arr = jnp.asarray(ts_np, dtype)
    T = ts_np.shape[0]

    f0 = f(t0, y0)

    # Initial step heuristic (Hairer): based on scale of y0 and f0.
    scale = atol + jnp.abs(y0) * rtol
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    h0 = jnp.minimum(h0, t_final - t0)

    out0 = jnp.zeros((T,) + y0.shape, dtype)
    out0 = out0.at[0].set(y0)

    def error_ratio(y_err, y_prev, y_new):
        tol = atol + rtol * jnp.maximum(jnp.abs(y_prev), jnp.abs(y_new))
        return jnp.sqrt(jnp.mean((y_err / tol) ** 2))

    def rk_step(t, y, f_t, h):
        ks = [f_t]
        for i in range(1, 7):
            yi = y
            for j, aij in enumerate(_A[i]):
                if aij != 0.0:
                    yi = yi + h * aij * ks[j]
            ks.append(f(t + _C[i] * h, yi))
        y5 = y
        y_err = jnp.zeros_like(y)
        for i in range(7):
            if _B5[i] != 0.0:
                y5 = y5 + h * _B5[i] * ks[i]
            diff = _B5[i] - _B4[i]
            if diff != 0.0:
                y_err = y_err + h * diff * ks[i]
        return y5, y_err, ks[6]  # FSAL: k7 = f(t+h, y5)

    def fill_outputs(out, next_out, t_prev, y_prev, f_prev, t_new, y_new, f_new):
        """Write all output times inside (t_prev, t_new] via cubic Hermite."""

        def body(i, state):
            out, next_out = state
            t_i = ts_arr[jnp.minimum(next_out, T - 1)]
            inside = (next_out < T) & (t_i <= t_new + 1e-12)

            def write(out):
                h = t_new - t_prev
                s = jnp.where(h > 0, (t_i - t_prev) / h, 0.0)
                h00 = (1 + 2 * s) * (1 - s) ** 2
                h10 = s * (1 - s) ** 2
                h01 = s * s * (3 - 2 * s)
                h11 = s * s * (s - 1)
                y_i = (
                    h00 * y_prev
                    + h10 * h * f_prev
                    + h01 * y_new
                    + h11 * h * f_new
                )
                return out.at[jnp.minimum(next_out, T - 1)].set(y_i)

            out = jax.lax.cond(inside, write, lambda o: o, out)
            next_out = jnp.where(inside, next_out + 1, next_out)
            return out, next_out

        # at most T outputs can fall inside one step
        return jax.lax.fori_loop(0, T, body, (out, next_out))

    def cond(state):
        t, y, f_t, h, out, next_out, n = state
        return (next_out < T) & (n < max_steps)

    def body(state):
        t, y, f_t, h, out, next_out, n = state
        # step-size control is non-differentiable by construction
        # (discrete accept/reject); gradients flow through the STATE
        # chain on the realized grid
        h = jax.lax.stop_gradient(
            jnp.maximum(jnp.minimum(h, t_final - t), 1e-12))
        t = jax.lax.stop_gradient(t)
        y_new, y_err, f_new = rk_step(t, y, f_t, h)
        ratio = jax.lax.stop_gradient(error_ratio(y_err, y, y_new))
        accept = ratio <= 1.0

        factor = jnp.clip(
            safety * jnp.power(jnp.maximum(ratio, 1e-10), -0.2),
            min_factor,
            max_factor,
        )
        h_next = h * factor

        t_new = jnp.where(accept, t + h, t)
        out2, next2 = fill_outputs(out, next_out, t, y, f_t, t + h, y_new, f_new)
        out = jnp.where(accept, out2, out)
        next_out = jnp.where(accept, next2, next_out)
        y = jnp.where(accept, y_new, y)
        f_t = jnp.where(accept, f_new, f_t)
        return (t_new, y, f_t, h_next, out, next_out, n + 1)

    state = (t0, y0, f0, h0, out0, jnp.asarray(1, jnp.int32),
             jnp.asarray(0, jnp.int32))
    if differentiable:
        # masked fixed-length scan: no-op once done (reverse-mode AD)
        def scan_body(st, _):
            take = cond(st)
            nxt = body(st)
            st2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, b, a), st, nxt
            )
            return st2, None

        (_, _, _, _, out, next_out, _), _ = jax.lax.scan(
            scan_body, state, None, length=max_steps
        )
    else:
        _, _, _, _, out, next_out, _ = jax.lax.while_loop(cond, body,
                                                          state)
    # Exhausting max_steps before the last output must NOT return a
    # plausible-looking partial integration: poison unreached outputs.
    reached = jnp.arange(T) < next_out
    out = jnp.where(
        reached.reshape((T,) + (1,) * (out.ndim - 1)), out, jnp.nan
    )
    if differentiable:
        return out
    from ._guards import nondiff_guard

    return nondiff_guard(
        out, "odeint_dopri5",
        "For training losses use a fixed-grid method (euler/rk4/...; all "
        "are differentiable scans), odeint/cdeint with "
        "differentiable=True (masked-scan dopri5), or "
        "sdeint_adaptive(..., differentiable=True) for adaptive SDE "
        "solves.",
    )
