"""Spline tests vs closed forms and NaN patterns (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snsde.ops.interp import (
    CubicPath,
    fill_missing_linear,
    hermite_cubic_coeffs,
    natural_cubic_coeffs,
    tridiagonal_solve,
    unpack_coeffs,
)


def test_tridiagonal_solve_matches_dense():
    rng = np.random.default_rng(0)
    N = 12
    lower = rng.normal(size=N - 1) * 0.3
    upper = rng.normal(size=N - 1) * 0.3
    diag = rng.normal(size=N) + 4.0  # diagonally dominant
    b = rng.normal(size=(5, N))

    A = np.diag(diag) + np.diag(lower, -1) + np.diag(upper, 1)
    expected = np.linalg.solve(A, b.T).T
    got = tridiagonal_solve(
        jnp.asarray(b, jnp.float32),
        jnp.asarray(upper, jnp.float32),
        jnp.asarray(diag, jnp.float32),
        jnp.asarray(lower, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


def test_natural_cubic_interpolates_knots():
    rng = np.random.default_rng(1)
    L, C = 9, 3
    times = jnp.asarray(np.sort(rng.uniform(0, 1, L)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, L, C)), jnp.float32)
    coeffs = natural_cubic_coeffs(times, x)
    path = CubicPath(coeffs, times)
    for k in range(L):
        val = path.evaluate(times[k])
        np.testing.assert_allclose(np.asarray(val), np.asarray(x[:, k, :]),
                                   rtol=1e-4, atol=1e-4)


def test_natural_cubic_reproduces_cubic_polynomial():
    # A natural cubic spline exactly reproduces linear functions; and on the
    # interior it should closely match a smooth function at knots.
    times = jnp.linspace(0.0, 1.0, 11)
    x = (2.0 * times - 0.5)[None, :, None]  # linear
    coeffs = natural_cubic_coeffs(times, x)
    path = CubicPath(coeffs, times)
    for t in np.linspace(0, 1, 37):
        v = path.evaluate(jnp.asarray(t, jnp.float32))
        np.testing.assert_allclose(float(v[0, 0]), 2.0 * t - 0.5, atol=1e-5)
        d = path.derivative(jnp.asarray(t, jnp.float32))
        np.testing.assert_allclose(float(d[0, 0]), 2.0, atol=1e-4)


def test_natural_cubic_second_derivative_continuity():
    rng = np.random.default_rng(2)
    L = 8
    times = jnp.linspace(0.0, 1.0, L)
    x = jnp.asarray(rng.normal(size=(1, L, 1)), jnp.float32)
    a, b, two_c, three_d = natural_cubic_coeffs(times, x)
    # p_i''(h_i) == p_{i+1}''(0):  two_c_i + 2*three_d_i*h == two_c_{i+1}
    h = np.diff(np.asarray(times))
    lhs = np.asarray(two_c)[0, :-1, 0] + 2 * np.asarray(three_d)[0, :-1, 0] * h[:-1]
    rhs = np.asarray(two_c)[0, 1:, 0]
    np.testing.assert_allclose(lhs, rhs, atol=1e-3)
    # natural boundary: p_0''(0) == 0 and p_last''(h) == 0
    np.testing.assert_allclose(np.asarray(two_c)[0, 0, 0], 0.0, atol=1e-3)
    end = np.asarray(two_c)[0, -1, 0] + 2 * np.asarray(three_d)[0, -1, 0] * h[-1]
    np.testing.assert_allclose(end, 0.0, atol=1e-3)


def test_natural_cubic_missing_matches_clean_on_dense_data():
    """The masked missing-value path must agree with the clean path when
    nothing is actually missing."""
    rng = np.random.default_rng(3)
    L, C = 10, 2
    times = jnp.asarray(np.sort(rng.uniform(0, 1, L)), jnp.float32)
    x = rng.normal(size=(3, L, C)).astype(np.float32)

    clean = natural_cubic_coeffs(times, jnp.asarray(x))
    # force the missing path by inserting one NaN into a throwaway channel
    x_aug = np.concatenate([x, x[..., :1]], axis=-1)
    x_aug[0, 1, -1] = np.nan
    missing = natural_cubic_coeffs(times, jnp.asarray(x_aug))
    for c_clean, c_missing in zip(clean, missing):
        np.testing.assert_allclose(
            np.asarray(c_missing)[..., :C], np.asarray(c_clean),
            rtol=2e-3, atol=2e-3,
        )


def test_natural_cubic_missing_values_interpolates_observed():
    rng = np.random.default_rng(4)
    L = 12
    times = jnp.linspace(0.0, 1.0, L)
    x = rng.normal(size=(1, L, 1)).astype(np.float32)
    x[0, [2, 3, 7], 0] = np.nan
    coeffs = natural_cubic_coeffs(times, jnp.asarray(x))
    path = CubicPath(coeffs, times)
    for k in range(L):
        if np.isnan(x[0, k, 0]):
            continue
        v = float(path.evaluate(times[k])[0, 0])
        np.testing.assert_allclose(v, x[0, k, 0], atol=2e-4)


def test_natural_cubic_missing_endpoints_imputed():
    L = 8
    times = jnp.linspace(0.0, 1.0, L)
    x = np.full((1, L, 1), np.nan, np.float32)
    x[0, 2, 0] = 1.0
    x[0, 5, 0] = -1.0
    coeffs = natural_cubic_coeffs(times, jnp.asarray(x))
    path = CubicPath(coeffs, times)
    # endpoint imputation: start = first observed, end = last observed
    np.testing.assert_allclose(float(path.evaluate(times[0])[0, 0]), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(float(path.evaluate(times[-1])[0, 0]), -1.0,
                               atol=1e-4)


def test_natural_cubic_all_nan_channel_is_zero():
    L = 6
    times = jnp.linspace(0.0, 1.0, L)
    x = np.full((1, L, 1), np.nan, np.float32)
    coeffs = natural_cubic_coeffs(times, jnp.asarray(x))
    for c in coeffs:
        assert np.all(np.asarray(c) == 0.0)


def test_fill_missing_linear():
    times = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0])
    x = np.array([[np.nan, 1.0, np.nan, 3.0, np.nan]], np.float32).T[None]
    filled = np.asarray(fill_missing_linear(times, jnp.asarray(x)))[0, :, 0]
    np.testing.assert_allclose(filled, [1.0, 1.0, 2.0, 3.0, 3.0], atol=1e-6)


def test_hermite_knots_and_derivatives():
    rng = np.random.default_rng(5)
    L, C = 7, 2
    times = jnp.asarray(np.sort(rng.uniform(0, 2, L)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, L, C)), jnp.float32)
    packed = hermite_cubic_coeffs(times, x)
    path = CubicPath(packed, times)
    t_np = np.asarray(times)
    x_np = np.asarray(x)
    # interpolates every knot
    for k in range(L):
        np.testing.assert_allclose(
            np.asarray(path.evaluate(times[k])), x_np[:, k], atol=2e-4
        )
    # backward-difference derivative at interior knots
    for k in range(1, L - 1):
        slope = (x_np[:, k] - x_np[:, k - 1]) / (t_np[k] - t_np[k - 1])
        # derivative from the RIGHT interval's b coefficient
        a, b, two_c, three_d = unpack_coeffs(packed)
        np.testing.assert_allclose(np.asarray(b)[:, k], slope, atol=2e-3,
                                   rtol=2e-3)


def test_hermite_c1_continuity():
    """Backward-difference Hermite is C1 by construction: the derivative at
    the right end of interval i equals b_{i+1}. Check at coefficient level
    (finite-eps probing would amplify the 1/h^2 terms)."""
    rng = np.random.default_rng(6)
    L = 9
    times = jnp.asarray(np.sort(rng.uniform(0, 1, L)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, L, 1)), jnp.float32)
    a, b, two_c, three_d = unpack_coeffs(hermite_cubic_coeffs(times, x))
    h = np.diff(np.asarray(times))[None, :, None]
    a, b = np.asarray(a), np.asarray(b)
    two_c, three_d = np.asarray(two_c), np.asarray(three_d)
    deriv_right_end = b + two_c * h + three_d * h * h  # p'_i(h_i)
    scale = np.maximum(np.abs(deriv_right_end[:, :-1]), 1.0)
    np.testing.assert_allclose(
        deriv_right_end[:, :-1] / scale, b[:, 1:] / scale, atol=1e-3
    )
    # and C0: p_i(h_i) == a_{i+1}
    val_right_end = a + (b + (0.5 * two_c + three_d * h / 3.0) * h) * h
    np.testing.assert_allclose(val_right_end[:, :-1], a[:, 1:], atol=1e-4)


def test_cubic_path_vmap_scalar_eval_inside_scan():
    """Spline evaluation must be scan/vmap safe (solver hot path)."""
    rng = np.random.default_rng(7)
    L, C, B = 6, 3, 4
    times = jnp.linspace(0.0, 1.0, L)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    path = CubicPath(hermite_cubic_coeffs(times, x), times)

    @jax.jit
    def traj(ts):
        def body(carry, t):
            return carry, path.evaluate(t)

        _, out = jax.lax.scan(body, 0, ts)
        return out

    out = traj(jnp.linspace(0.0, 1.0, 11))
    assert out.shape == (11, B, C)
    assert np.all(np.isfinite(np.asarray(out)))


def test_clamped_evaluation_outside_range():
    times = jnp.linspace(0.0, 1.0, 5)
    x = jnp.ones((1, 5, 1))
    path = CubicPath(hermite_cubic_coeffs(times, x), times)
    for t in (-0.5, 1.5):
        v = float(path.evaluate(jnp.asarray(t, jnp.float32))[0, 0])
        assert np.isfinite(v)
