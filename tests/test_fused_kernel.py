"""Fused Pallas EM kernel parity tests (TPU only; skipped on the CPU test
mesh — the kernel requires Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel"
)


@requires_tpu
@pytest.mark.parametrize("io,no", [(4, 17), (2, 16), (6, 17)])
def test_fused_matches_scan(io, no):
    from snsde.fields import DiffusionField
    from snsde.kernels.fused_em import fused_em_solve, supports_fused
    from snsde.models.neuralsde import resolve_dt
    from snsde.ops.brownian import BrownianGrid, brownian_increments
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import make_grid, sdeint

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, L, C, H = 128, 12, 5, 33
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    path = CubicPath(coeffs, times)
    field = DiffusionField.create(
        key, C, H, H, 2, input_option=io, noise_option=no
    ).bind(path)
    assert supports_fused(field)
    y0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    kb = jax.random.fold_in(key, 7)
    grid, _ = make_grid(times, resolve_dt(times))
    # both sdeint(key=kb) and fused_em_solve(..., kb) draw dW from
    # split(kb)[0]; assert that explicitly and via the shared-key path
    kw, _ = jax.random.split(kb)
    dW = brownian_increments(kw, grid, (B, H))
    bm = BrownianGrid(grid=jnp.asarray(grid), dW=dW, U=None)
    ys_ref = sdeint(field.f, field.g, y0, times, bm=bm, method="euler")
    ys_fused = fused_em_solve(field, path, times, y0, kb)
    np.testing.assert_allclose(
        np.asarray(ys_ref), np.asarray(ys_fused), atol=5e-3
    )
    # cross-path reproducibility: same seed, no injected bm
    ys_keyed = sdeint(field.f, field.g, y0, times, key=kb, method="euler")
    np.testing.assert_allclose(
        np.asarray(ys_keyed), np.asarray(ys_fused), atol=5e-3
    )


@requires_tpu
def test_fused_gradients_match_scan():
    from snsde.fields import DiffusionField
    from snsde.kernels.fused_em import fused_em_solve
    from snsde.nn.core import filter_value_and_grad
    from snsde.models.neuralsde import resolve_dt
    from snsde.ops.brownian import BrownianGrid, brownian_increments
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import make_grid, sdeint

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, L, C, H = 64, 8, 4, 17
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    path = CubicPath(coeffs, times)
    field = DiffusionField.create(key, C, H, H, 2, input_option=4,
                                  noise_option=17)
    y0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    kb = jax.random.fold_in(key, 7)
    grid, _ = make_grid(times, resolve_dt(times))
    kw, _ = jax.random.split(kb)           # fused draws dW from split(kb)[0]
    dW = brownian_increments(kw, grid, (B, H))
    bm = BrownianGrid(grid=jnp.asarray(grid), dW=dW, U=None)

    def loss_scan(f):
        fb = f.bind(path)
        ys = sdeint(fb.f, fb.g, y0, times, bm=bm, method="euler")
        return jnp.mean(ys**2)

    def loss_fused(f):
        ys = fused_em_solve(f.bind(path), path, times, y0, kb)
        return jnp.mean(ys**2)

    l1, g1 = filter_value_and_grad(loss_scan)(field)
    l2, g2 = filter_value_and_grad(loss_fused)(field)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        if a is None:
            continue
        denom = max(float(jnp.abs(a).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) / denom < 2e-2


@requires_tpu
def test_bf16_streams_gradient_fidelity():
    """bf16 solver streams: gradients within 1% relative of the f32 path."""
    from snsde.fields import DiffusionField
    from snsde.kernels.fused_em import fused_em_solve
    from snsde.nn.core import filter_value_and_grad
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, L, C, H = 128, 10, 4, 25
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    path = CubicPath(coeffs, times)
    field = DiffusionField.create(key, C, H, H, 2, input_option=4,
                                  noise_option=17)
    y0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    kb = jax.random.fold_in(key, 7)

    def loss(f, sd):
        ys = fused_em_solve(f.bind(path), path, times, y0, kb,
                            stream_dtype=sd)
        return jnp.mean(ys**2)

    l32, g32 = filter_value_and_grad(lambda f: loss(f, jnp.float32))(field)
    l16, g16 = filter_value_and_grad(lambda f: loss(f, jnp.bfloat16))(field)
    np.testing.assert_allclose(float(l32), float(l16), rtol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g32),
                    jax.tree_util.tree_leaves(g16)):
        if a is None:
            continue
        denom = max(float(jnp.abs(a).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) / denom < 3e-2
