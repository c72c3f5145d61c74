"""Fused SRK (SRIW1) kernel parity on CPU via Pallas interpret mode.

`srk` is the reference's default solver for the whole torch-ists stream
family (torch-ists/torch_ists/diff_module/NSDE/nsde_model.py:63-69), so
the fused kernel gets the same treatment as the EM kernel: every config
branch — forward AND the hand-written tableau backward — validated
against the scan SRK solver on shared (dW, I10).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.fields import DiffusionField
from snsde.models.neuralsde import resolve_dt
from snsde.nn.core import filter_value_and_grad
from snsde.ops.brownian import (BrownianGrid, brownian_increments,
                                space_time_levy_area)
from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
from snsde.ops.solve import make_grid, sdeint


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("SNSDE_FUSED_INTERPRET", "1")
    monkeypatch.setenv("SNSDE_FUSED_STREAM", "f32")


@pytest.fixture(scope="module")
def setting():
    rng = np.random.default_rng(0)
    B, L, C, H = 8, 6, 3, 5
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x))
    path = CubicPath(coeffs, times)
    y0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    return path, times, y0, (B, C, H)


def _parity(path, times, y0, B, H, field, *, grads=True):
    from snsde.kernels.fused_srk import fused_srk_solve, supports_fused_srk

    fb = field.bind(path)
    assert supports_fused_srk(fb)
    dt = resolve_dt(times)
    k = jax.random.PRNGKey(7)
    kw, ku = jax.random.split(k)
    grid, _ = make_grid(times, dt)
    dW = brownian_increments(kw, grid, (B, H), jnp.float32)
    U = space_time_levy_area(ku, grid, (B, H), dW, jnp.float32)
    bm = BrownianGrid(grid=jnp.asarray(grid), dW=dW, U=U)
    ys_scan = sdeint(fb.f, fb.g, y0, times, bm=bm, method="srk")
    ys_fused = fused_srk_solve(fb, path, times, y0, k, dt=dt)
    np.testing.assert_allclose(np.asarray(ys_scan), np.asarray(ys_fused),
                               atol=1e-5)
    if not grads:
        return

    def loss_scan(f):
        fb2 = f.bind(path)
        ys = sdeint(fb2.f, fb2.g, y0, times, bm=bm, method="srk")
        return jnp.mean(ys ** 2)

    def loss_fused(f):
        ys = fused_srk_solve(f.bind(path), path, times, y0, k, dt=dt)
        return jnp.mean(ys ** 2)

    l1, g1 = filter_value_and_grad(loss_scan)(field)
    l2, g2 = filter_value_and_grad(loss_fused)(field)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for b, a in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        if a is None or b is None:
            continue
        # the kernel's gradients are always finite; the scan path NaNs
        # through sqrt(y<0) (0*NaN via nan_to_num, like the torch
        # reference) — compare only where the scan grad is finite
        assert bool(jnp.isfinite(a).all())
        fin = np.isfinite(np.asarray(b))
        if not fin.any():
            continue
        bb = np.asarray(b)[fin]
        aa = np.asarray(a)[fin]
        denom = max(float(np.abs(bb).max()), 1e-6)
        assert float(np.abs(aa - bb).max()) / denom < 1e-4


# one config per (drift mode x noise mode) cell plus the named models:
# neurallsde (2,16), neurallnsde (4,17), neuralgsde (6,17),
# naivesde (1,18), neuralsde_3_18 — reference common_sde.py:303-342
GRID_SAMPLE = [
    (2, 16), (4, 17), (6, 17), (1, 18), (3, 18),
    (0, 4),          # xt drift, precomp diag
    (0, 18),         # xt drift, net2 (interpolation default 0_18)
    (1, 0),          # staticsde: zero noise
    (3, 9),          # yy+time, elementwise sigmoid
    (5, 14),         # geometric yy, net1
    (6, 7),          # emb geometric, sqrt (nan_to_num path)
    (2, 11),         # t*y noise
    (4, 12),         # 1NN(t)
]


@pytest.mark.parametrize("io,no", GRID_SAMPLE)
def test_fused_srk_parity(setting, io, no):
    path, times, y0, (B, C, H) = setting
    field = DiffusionField.create(
        jax.random.PRNGKey(1), C, H, H, 2, input_option=io, noise_option=no
    )
    _parity(path, times, y0, B, H, field, grads=True)


def test_fused_srk_unroll_padding(setting, monkeypatch):
    """M not divisible by the unroll factor: dt=0 identity steps must be
    exact for the SRK tableau too (guarded 1/dt, zero increments)."""
    monkeypatch.setenv("SNSDE_FUSED_UNROLL", "4")
    path, times, y0, (B, C, H) = setting
    field = DiffusionField.create(
        jax.random.PRNGKey(2), C, H, H, 1, input_option=4, noise_option=17
    )
    # dt larger than every span -> one step per span, M = L-1 = 5,
    # padded to 8 by three dt=0 identity steps
    from snsde.kernels.fused_srk import fused_srk_solve

    fb = field.bind(path)
    k = jax.random.PRNGKey(3)
    kw, ku = jax.random.split(k)
    big_dt = 10.0
    grid, _ = make_grid(times, big_dt)
    assert grid.shape[0] - 1 == len(times) - 1   # no subdivision
    dW = brownian_increments(kw, grid, (B, H), jnp.float32)
    U = space_time_levy_area(ku, grid, (B, H), dW, jnp.float32)
    bm = BrownianGrid(grid=jnp.asarray(grid), dW=dW, U=U)
    ys_scan = sdeint(fb.f, fb.g, y0, times, bm=bm, method="srk")
    ys_fused = fused_srk_solve(fb, path, times, y0, k, dt=big_dt)
    np.testing.assert_allclose(np.asarray(ys_scan), np.asarray(ys_fused),
                               atol=1e-5)


def test_fused_srk_solve_dispatch(setting, monkeypatch):
    """solve_dispatch routes method='srk' to the fused kernel on TPU; on
    CPU it falls back to the scan path with identical (key-matched)
    noise, so the dispatch seam is behavior-preserving."""
    from snsde.models.neuralsde import solve_dispatch

    path, times, y0, (B, C, H) = setting
    field = DiffusionField.create(
        jax.random.PRNGKey(4), C, H, H, 1, input_option=2, noise_option=16
    ).bind(path)
    k = jax.random.PRNGKey(5)
    dt = resolve_dt(times)
    ys = solve_dispatch(field, path, times, y0, key=k, dt=dt, method="srk")
    from snsde.kernels.fused_srk import fused_srk_solve

    ys_fused = fused_srk_solve(field, path, times, y0, k, dt=dt)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_fused),
                               atol=1e-5)


@pytest.mark.parametrize("io,no", [(4, 17), (1, 18), (0, 4)])
def test_srk_lane_packed(setting, io, no):
    """K models through one lane-packed SRK kernel reproduce each
    single-model fused_srk_solve exactly (same per-model keys -> same
    (dW, I10))."""
    from snsde.kernels.fused_srk import fused_srk_solve
    from snsde.kernels.multi import fused_srk_solve_packed

    path, times, y0, (B, C, H) = setting
    K = 3
    fields = [DiffusionField.create(jax.random.PRNGKey(20 + i), C, H, H, 1,
                                    input_option=io, noise_option=no)
              for i in range(K)]
    keys = list(jax.random.split(jax.random.PRNGKey(4), K))
    y0s = jnp.stack([y0 + 0.1 * i for i in range(K)])
    dt = resolve_dt(times)
    ys_packed = fused_srk_solve_packed(fields, path, times, y0s, keys,
                                       dt=dt)
    for i in range(K):
        ys_i = fused_srk_solve(fields[i], path, times, y0s[i], keys[i],
                               dt=dt)
        np.testing.assert_allclose(np.asarray(ys_packed[i]),
                                   np.asarray(ys_i), atol=1e-5)
