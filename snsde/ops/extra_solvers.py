"""Extra ODE solvers from the reference's vendored TorchDiffEqPack suite
(/root/reference/benchmark_forecasting/TorchDiffEqPack/odesolver/):

  * `odeint_rk23`     — adaptive Bogacki–Shampine 2(3)
    (adaptive_grid_solver.py RK23)
  * `odeint_rk12`     — adaptive Heun–Euler 1(2) (RK12)
  * `odeint_ode23s`   — Rosenbrock(2,3) for stiff systems
    (stiff_ode_solver.py ODE23s); the Jacobian is assembled per step with
    jax.jacfwd over the (small) state, solved with a dense LU — faithful to
    the reference's dense-matrix approach.
  * `odeint_sym12`    — the Sym12Async asynchronous-leapfrog symplectic
    scheme (symplectic.py Sym12Async): state z=(y, v) with half-step
    velocity updates; used by the reference only through
    `odesolve_adjoint_sym12` on the forecasting/EXIT CDE path.

Adaptive loops are bounded `lax.while_loop`s with PI step control
(shared machinery with ops.dopri).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["odeint_rk23", "odeint_rk12", "odeint_ode23s", "odeint_sym12"]


def _adaptive_embedded(f, y0, ts, stages, b_high, b_low, c, order,
                       rtol, atol, max_steps, differentiable=False):
    """Generic embedded adaptive RK over concrete output times.

    `differentiable=True` runs the step loop as a masked `lax.scan` over
    exactly `max_steps` iterations (reverse-mode AD works; step-size
    control under stop_gradient — same policy as
    `odeint_dopri5(differentiable=True)`)."""
    ts_np = np.asarray(jax.device_get(ts), np.float64)
    dtype = jnp.result_type(y0)
    y0 = jnp.asarray(y0, dtype)
    ts_arr = jnp.asarray(ts_np, dtype)
    T = ts_np.shape[0]
    t_final = jnp.asarray(ts_np[-1], dtype)

    A = stages  # list of np arrays (lower-triangular rows)
    n_stage = len(b_high)

    def rk_step(t, y, h):
        ks = []
        for i in range(n_stage):
            yi = y
            for j, aij in enumerate(A[i]):
                if aij != 0.0:
                    yi = yi + h * aij * ks[j]
            ks.append(f(t + c[i] * h, yi))
        y_hi = y
        y_lo = y
        for i in range(n_stage):
            if b_high[i] != 0.0:
                y_hi = y_hi + h * b_high[i] * ks[i]
            if b_low[i] != 0.0:
                y_lo = y_lo + h * b_low[i] * ks[i]
        return y_hi, y_hi - y_lo

    out0 = jnp.zeros((T,) + y0.shape, dtype).at[0].set(y0)
    h0 = jnp.asarray((ts_np[-1] - ts_np[0]) / 100.0, dtype)

    def fill(out, next_out, t_prev, y_prev, t_new, y_new):
        def body(i, state):
            out, next_out = state
            t_i = ts_arr[jnp.minimum(next_out, T - 1)]
            inside = (next_out < T) & (t_i <= t_new + 1e-12)

            def write(out):
                w = jnp.where(t_new > t_prev,
                              (t_i - t_prev) / (t_new - t_prev), 0.0)
                y_i = y_prev + w * (y_new - y_prev)
                return out.at[jnp.minimum(next_out, T - 1)].set(y_i)

            out = jax.lax.cond(inside, write, lambda o: o, out)
            return out, jnp.where(inside, next_out + 1, next_out)

        return jax.lax.fori_loop(0, T, body, (out, next_out))

    def cond(state):
        t, y, h, out, next_out, n = state
        return (next_out < T) & (n < max_steps)

    def body(state):
        t, y, h, out, next_out, n = state
        h = jax.lax.stop_gradient(
            jnp.clip(h, 1e-10, t_final - t + 1e-10))
        t = jax.lax.stop_gradient(t)
        y_new, y_err = rk_step(t, y, h)
        tol = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        ratio = jax.lax.stop_gradient(
            jnp.sqrt(jnp.mean((y_err / tol) ** 2) + 1e-30))
        accept = ratio <= 1.0
        factor = jnp.clip(
            0.9 * jnp.power(jnp.maximum(ratio, 1e-10), -1.0 / order),
            0.2, 5.0,
        )
        out2, next2 = fill(out, next_out, t, y, t + h, y_new)
        out = jnp.where(accept, out2, out)
        next_out = jnp.where(accept, next2, next_out)
        y = jnp.where(accept, y_new, y)
        t = jnp.where(accept, t + h, t)
        return (t, y, h * factor, out, next_out, n + 1)

    state = (jnp.asarray(ts_np[0], dtype), y0, h0, out0,
             jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32))
    if differentiable:
        def scan_body(st, _):
            take = cond(st)
            nxt = body(st)
            st2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, b, a), st, nxt
            )
            return st2, None

        (_, _, _, out, next_out, _), _ = jax.lax.scan(
            scan_body, state, None, length=max_steps
        )
    else:
        _, _, _, out, next_out, _ = jax.lax.while_loop(cond, body, state)
    # poison unreached outputs (budget exhaustion is never silent)
    reached = jnp.arange(T) < next_out
    out = jnp.where(
        reached.reshape((T,) + (1,) * (out.ndim - 1)), out, jnp.nan
    )
    if differentiable:
        return out
    from ._guards import nondiff_guard

    return nondiff_guard(
        out, "adaptive embedded RK (rk12/rk23)",
        "For training losses use a fixed-grid method (euler/rk4/...; all "
        "are differentiable scans), or pass differentiable=True for the "
        "masked-scan adaptive mode.",
    )


def odeint_rk23(f, y0, ts, rtol=1e-4, atol=1e-6, max_steps=4096,
                differentiable=False):
    """Bogacki–Shampine 2(3)."""
    A = [np.array([]), np.array([0.5]), np.array([0.0, 0.75]),
         np.array([2 / 9, 1 / 3, 4 / 9])]
    b_high = [2 / 9, 1 / 3, 4 / 9, 0.0]
    b_low = [7 / 24, 1 / 4, 1 / 3, 1 / 8]
    c = [0.0, 0.5, 0.75, 1.0]
    return _adaptive_embedded(f, y0, ts, A, b_high, b_low, c, 3, rtol,
                              atol, max_steps,
                              differentiable=differentiable)


def odeint_rk12(f, y0, ts, rtol=1e-3, atol=1e-5, max_steps=8192,
                differentiable=False):
    """Heun–Euler 1(2)."""
    A = [np.array([]), np.array([1.0])]
    b_high = [0.5, 0.5]
    b_low = [1.0, 0.0]
    c = [0.0, 1.0]
    return _adaptive_embedded(f, y0, ts, A, b_high, b_low, c, 2, rtol,
                              atol, max_steps,
                              differentiable=differentiable)


def odeint_ode23s(f, y0, ts, dt=None, max_steps=4096):
    """Rosenbrock(2,3) for stiff ODEs, fixed step (the reference uses it on
    small latent states; dense Jacobian per step via jacfwd).

    y0: [..., D] — the Jacobian is taken per batch row over D.
    """
    from .solve import make_grid

    grid, out_idx = make_grid(ts, dt)
    dtype = jnp.result_type(y0)
    y0 = jnp.asarray(y0, dtype)
    D = y0.shape[-1]
    d = 1.0 / (2.0 + np.sqrt(2.0))
    eye = jnp.eye(D, dtype=dtype)

    def step(y, xs):
        t0, h = xs

        def f_t(yy):
            return f(t0, yy)

        # per-row Jacobian [.., D, D]
        J = jax.vmap(jax.jacfwd(lambda r: f(t0, r[None])[0]))(
            y.reshape(-1, D)
        ).reshape(y.shape[:-1] + (D, D))
        W = eye - h * d * J
        f0 = f(t0, y)
        k1 = jnp.linalg.solve(W, f0[..., None])[..., 0]
        f1 = f(t0 + 0.5 * h, y + 0.5 * h * k1)
        rhs2 = f1 - k1
        k2 = jnp.linalg.solve(W, rhs2[..., None])[..., 0] + k1
        y_new = y + h * k2
        return y_new, y_new

    t_lo = jnp.asarray(grid[:-1], dtype)
    hs = jnp.asarray(np.diff(grid), dtype)
    _, ys_tail = jax.lax.scan(step, y0, (t_lo, hs))
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    return ys[jnp.asarray(out_idx)]


def odeint_sym12(f, y0, ts, dt=None, v0=None):
    """Sym12Async-style asynchronous leapfrog: augmented state (y, v) with
        v_{k+1/2} = v_k + h/2 f(t, y_k)
        y_{k+1}   = y_k + h v_{k+1/2}
        v_{k+1}   = 2 f(t+h, y_{k+1}) - ... (damped velocity refresh)
    Matches the reference's Sym12Async update structure (symplectic.py:7-65)
    where the velocity is re-synchronized to the vector field each step.
    Returns ys at output times."""
    from .solve import make_grid

    grid, out_idx = make_grid(ts, dt)
    dtype = jnp.result_type(y0)
    y0 = jnp.asarray(y0, dtype)
    v0 = f(jnp.asarray(grid[0], dtype), y0) if v0 is None else v0

    def step(carry, xs):
        y, v = carry
        t0, h = xs
        # asynchronous leapfrog: drift with averaged velocity, then refresh
        v_half = 0.5 * (v + f(t0, y))
        y_new = y + h * v_half
        v_new = 2.0 * f(t0 + h, y_new) - v_half
        return (y_new, v_new), y_new

    t_lo = jnp.asarray(grid[:-1], dtype)
    hs = jnp.asarray(np.diff(grid), dtype)
    (_, _), ys_tail = jax.lax.scan(step, (y0, v0), (t_lo, hs))
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    return ys[jnp.asarray(out_idx)]
