"""Solver tests: analytic OU moments, strong convergence order on fixed
Brownian paths, ODE accuracy, gradient checks (SURVEY.md §4 items 2-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snsde.ops.brownian import BrownianGrid, brownian_increments
from snsde.ops.solve import cdeint, make_grid, odeint, sdeint
from snsde.ops.dopri import odeint_dopri5
from snsde.ops.interp import CubicPath, hermite_cubic_coeffs


THETA, MU, SIGMA = 1.2, 0.3, 0.4


def ou_f(t, y):
    return THETA * (MU - y)


def ou_g(t, y):
    return jnp.full_like(y, SIGMA)


def test_make_grid_contains_outputs_and_respects_dt():
    ts = np.array([0.0, 0.3, 1.0])
    grid, idx = make_grid(ts, dt=0.25)
    np.testing.assert_allclose(grid[idx], ts)
    assert np.all(np.diff(grid) <= 0.25 + 1e-12)
    # no dt -> grid == ts
    grid2, idx2 = make_grid(ts, None)
    np.testing.assert_allclose(grid2, ts)


def test_ou_moments_euler():
    """E[X_t] and Var[X_t] of OU vs analytic values."""
    key = jax.random.PRNGKey(0)
    B = 8192
    x0 = 1.0
    ts = np.linspace(0.0, 1.0, 11)
    y0 = jnp.full((B, 1), x0)
    ys = sdeint(ou_f, ou_g, y0, ts, key=key, dt=0.01, method="euler")
    t_end = ts[-1]
    mean_an = MU + (x0 - MU) * np.exp(-THETA * t_end)
    var_an = SIGMA**2 / (2 * THETA) * (1 - np.exp(-2 * THETA * t_end))
    mean_emp = float(jnp.mean(ys[-1]))
    var_emp = float(jnp.var(ys[-1]))
    # tolerance ~2.5 sigma of the Monte-Carlo estimator at B=8192
    assert abs(mean_emp - mean_an) < 7e-3
    assert abs(var_emp - var_an) / var_an < 0.08


@pytest.mark.parametrize("method", ["milstein", "srk", "heun"])
def test_ou_moments_other_methods(method):
    key = jax.random.PRNGKey(1)
    B = 4096
    ts = np.linspace(0.0, 1.0, 11)
    y0 = jnp.full((B, 1), 1.0)
    ys = sdeint(ou_f, ou_g, y0, ts, key=key, dt=0.02, method=method)
    mean_an = MU + (1.0 - MU) * np.exp(-THETA)
    var_an = SIGMA**2 / (2 * THETA) * (1 - np.exp(-2 * THETA))
    assert abs(float(jnp.mean(ys[-1])) - mean_an) < 8e-3
    assert abs(float(jnp.var(ys[-1])) - var_an) / var_an < 0.08


def _gbm_strong_error(method, n_steps, key, B=2048):
    """Geometric Brownian motion dX = a X dt + b X dW has the exact solution
    X_t = X0 exp((a - b^2/2) t + b W_t). Compare pathwise on shared dW."""
    a, b = 0.8, 0.6
    T = 1.0
    grid = np.linspace(0.0, T, n_steps + 1)
    bm = BrownianGrid.create(key, grid, (B, 1), levy_area=True)
    W_T = jnp.sum(bm.dW, axis=0)
    exact = jnp.exp((a - 0.5 * b * b) * T + b * W_T)

    f = lambda t, y: a * y
    g = lambda t, y: b * y
    y0 = jnp.ones((B, 1))
    ys = sdeint(f, g, y0, grid, bm=bm, method=method)
    err = jnp.mean(jnp.abs(ys[-1] - exact))
    return float(err)


@pytest.mark.parametrize(
    "method,min_order",
    [("euler", 0.45), ("milstein", 0.9), ("srk", 0.9)],
)
def test_strong_convergence_order(method, min_order):
    key = jax.random.PRNGKey(42)
    errs = []
    steps = [32, 64, 128, 256]
    for i, n in enumerate(steps):
        errs.append(_gbm_strong_error(method, n, jax.random.fold_in(key, 7)))
    errs = np.array(errs)
    # fit order via least squares on log-log
    order = -np.polyfit(np.log(steps), np.log(errs), 1)[0]
    assert order > min_order, f"{method}: order {order:.2f}, errors {errs}"


def test_srk_beats_euler_pathwise():
    key = jax.random.PRNGKey(3)
    e_euler = _gbm_strong_error("euler", 64, key)
    e_srk = _gbm_strong_error("srk", 64, key)
    assert e_srk < e_euler / 4


def test_sdeint_reproducible_and_key_dependent():
    ts = np.linspace(0, 1, 6)
    y0 = jnp.ones((4, 3))
    a = sdeint(ou_f, ou_g, y0, ts, key=jax.random.PRNGKey(0), dt=0.1)
    b = sdeint(ou_f, ou_g, y0, ts, key=jax.random.PRNGKey(0), dt=0.1)
    c = sdeint(ou_f, ou_g, y0, ts, key=jax.random.PRNGKey(1), dt=0.1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


def test_zero_diffusion_matches_odeint():
    """SDE with g=0 must agree with the ODE solve (tutorial ODE-determinism
    theory check, tutorial/README.md)."""
    ts = np.linspace(0, 1, 9)
    y0 = jnp.asarray(np.random.default_rng(0).normal(size=(5, 2)),
                     jnp.float32)
    zs_sde = sdeint(ou_f, lambda t, y: jnp.zeros_like(y), y0, ts,
                    key=jax.random.PRNGKey(0), dt=0.02, method="euler")
    zs_ode = odeint(ou_f, y0, ts, dt=0.02, method="euler")
    np.testing.assert_allclose(np.asarray(zs_sde), np.asarray(zs_ode),
                               atol=1e-6)


def test_ode_rk4_accuracy():
    # dy/dt = -2y, y(0)=1 -> y(t)=exp(-2t)
    ts = np.linspace(0, 1, 5)
    y0 = jnp.ones((1, 1))
    ys = odeint(lambda t, y: -2.0 * y, y0, ts, dt=0.05, method="rk4")
    np.testing.assert_allclose(
        np.asarray(ys)[:, 0, 0], np.exp(-2 * ts), rtol=5e-6, atol=1e-7
    )


def test_dopri5_accuracy():
    ts = np.linspace(0, 2, 7)
    y0 = jnp.ones((1, 1))
    ys = odeint_dopri5(lambda t, y: -2.0 * y, y0, ts, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(ys)[:, 0, 0], np.exp(-2 * ts), rtol=1e-4, atol=1e-6
    )


def test_cdeint_linear_control():
    """dz = A z dX with X(t) = t reduces to dz/dt = A z."""
    rng = np.random.default_rng(1)
    H = 3
    Amat = jnp.asarray(rng.normal(size=(H, H)) * 0.3, jnp.float32)
    L = 11
    times = jnp.linspace(0.0, 1.0, L)
    x = np.asarray(times)[None, :, None].astype(np.float32)  # X(t)=t, 1 chan
    path = CubicPath(hermite_cubic_coeffs(times, jnp.asarray(x)), times)

    def func(t, z):
        return (z @ Amat.T)[..., None]  # [B, H, 1]

    z0 = jnp.ones((1, H))
    zs = cdeint(path, func, z0, np.asarray(times), dt=0.01, method="rk4")
    expected = jax.scipy.linalg.expm(Amat) @ np.ones(H)
    np.testing.assert_allclose(np.asarray(zs[-1, 0]), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_gradients_flow_through_sdeint():
    """Discretize-then-optimize: grads through the scan match finite
    differences on a scalar parameterization."""
    ts = np.linspace(0, 1, 6)
    key = jax.random.PRNGKey(0)
    grid, _ = make_grid(ts, dt=0.1)
    bm = BrownianGrid.create(key, grid, (16, 2))

    def loss(theta):
        f = lambda t, y: theta * (0.3 - y)
        g = lambda t, y: jnp.full_like(y, 0.2)
        ys = sdeint(f, g, jnp.ones((16, 2)), ts, bm=bm, method="euler")
        return jnp.mean(ys[-1] ** 2)

    g_ad = float(jax.grad(loss)(1.1))
    eps = 1e-3
    g_fd = float((loss(1.1 + eps) - loss(1.1 - eps)) / (2 * eps))
    np.testing.assert_allclose(g_ad, g_fd, rtol=2e-3, atol=2e-5)


def test_remat_matches_no_remat_gradients():
    ts = np.linspace(0, 1, 6)
    key = jax.random.PRNGKey(0)
    grid, _ = make_grid(ts, dt=0.05)
    bm = BrownianGrid.create(key, grid, (8, 2))

    def loss(theta, remat):
        f = lambda t, y: theta * (0.3 - y)
        g = lambda t, y: 0.1 * y
        ys = sdeint(f, g, jnp.ones((8, 2)), ts, bm=bm, method="milstein",
                    remat=remat)
        return jnp.mean(ys**2)

    g1 = float(jax.grad(lambda th: loss(th, True))(0.7))
    g2 = float(jax.grad(lambda th: loss(th, False))(0.7))
    np.testing.assert_allclose(g1, g2, rtol=1e-6)


def test_reversible_heun_ou_moments():
    """Reversible Heun (Kidger 2021) on OU: correct moments, and the
    auxiliary-pair update is algebraically reversible."""
    key = jax.random.PRNGKey(5)
    B = 4096
    ts = np.linspace(0.0, 1.0, 11)
    y0 = jnp.full((B, 1), 1.0)
    ys = sdeint(ou_f, ou_g, y0, ts, key=key, dt=0.02,
                method="reversible_heun")
    mean_an = MU + (1.0 - MU) * np.exp(-THETA)
    var_an = SIGMA**2 / (2 * THETA) * (1 - np.exp(-2 * THETA))
    assert abs(float(jnp.mean(ys[-1])) - mean_an) < 1e-2
    assert abs(float(jnp.var(ys[-1])) - var_an) / var_an < 0.12


def test_reversible_heun_algebraic_reversibility():
    """One forward step followed by the inverse map recovers (y, yhat)
    exactly (up to float32) — the property enabling O(1)-memory adjoints."""
    f = lambda t, y: -0.5 * y + 0.1
    g = lambda t, y: 0.2 * jnp.ones_like(y)
    y = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)),
                    jnp.float32)
    yh = y + 0.01
    h = jnp.asarray(0.05)
    t0 = jnp.asarray(0.3)
    dw = jnp.asarray(
        np.random.default_rng(1).normal(0, np.sqrt(0.05), (8, 3)),
        jnp.float32,
    )
    # forward
    f0, g0 = f(t0, yh), g(t0, yh)
    yh1 = 2.0 * y - yh + f0 * h + g0 * dw
    f1, g1 = f(t0 + h, yh1), g(t0 + h, yh1)
    y1 = y + 0.5 * (f0 + f1) * h + 0.5 * (g0 + g1) * dw
    # inverse: reconstruct y from (y1, yh1), then yh from the ŷ update
    y_rec = y1 - 0.5 * (f(t0, yh) + f(t0 + h, yh1)) * h \
        - 0.5 * (g(t0, yh) + g(t0 + h, yh1)) * dw
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y),
                               atol=1e-6)
    yh_back = 2.0 * y_rec - yh1 + f(t0, yh) * h + g(t0, yh) * dw
    # ŷ_{n+1} = 2y − ŷ + f(ŷ)h + g(ŷ)dw  =>  ŷ = 2y − ŷ_{n+1} + f h + g dw
    np.testing.assert_allclose(np.asarray(yh_back), np.asarray(yh),
                               atol=1e-5)


def test_make_grid_torchsde_mode():
    """grid_mode='torchsde' reproduces torchsde's fixed-grid stepping:
    full dt steps then one truncated step onto each output time (vs the
    default equal subdivision)."""
    from snsde.ops.solve import make_grid

    ts = np.array([0.0, 1.0], np.float64)
    g_eq, _ = make_grid(ts, dt=0.3, mode="equal")
    g_tsde, idx = make_grid(ts, dt=0.3, mode="torchsde")
    # equal: 4 equal steps of 0.25
    np.testing.assert_allclose(np.diff(g_eq), 0.25)
    # torchsde: 0.3, 0.3, 0.3, then truncated 0.1
    np.testing.assert_allclose(np.diff(g_tsde), [0.3, 0.3, 0.3, 0.1],
                               atol=1e-12)
    np.testing.assert_allclose(g_tsde[idx], ts)
    # exact divisibility: no degenerate zero-length step
    g2, _ = make_grid(ts, dt=0.25, mode="torchsde")
    np.testing.assert_allclose(np.diff(g2), 0.25)
    with np.testing.assert_raises(ValueError):
        make_grid(ts, dt=0.3, mode="bogus")
