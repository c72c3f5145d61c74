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
    # the scan side must run exact-f32 matmuls: XLA's TPU DEFAULT rounds
    # f32 dot operands to bf16 (measured 1.3e-1 max error on a 128-term
    # N(0,1) dot), which injects ~3e-3/step vs the kernel's pinned-HIGHEST
    # dots and the SDE amplifies it past any sane tolerance (round-4
    # triage, tools/triage_parity.py)
    with jax.default_matmul_precision("highest"):
        ys_ref = sdeint(field.f, field.g, y0, times, bm=bm, method="euler")
    ys_fused = fused_em_solve(field, path, times, y0, kb)
    # measured full-solve divergence on v5e: <= 7e-5 (triage growth curve)
    np.testing.assert_allclose(
        np.asarray(ys_ref), np.asarray(ys_fused), atol=1e-3
    )
    # cross-path reproducibility: same seed, no injected bm
    with jax.default_matmul_precision("highest"):
        ys_keyed = sdeint(field.f, field.g, y0, times, key=kb,
                          method="euler")
    np.testing.assert_allclose(
        np.asarray(ys_keyed), np.asarray(ys_fused), atol=1e-3
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
        with jax.default_matmul_precision("highest"):
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
def test_bf16x3_matmul_mode(monkeypatch):
    """SNSDE_FUSED_MATMUL=bf16x3 (3-pass split-operand matmuls, ~2^-16
    operand fidelity — tighter than the torch reference's TF32 regime):
    trajectories within 5e-3 of the exact-f32 kernel at the parity
    shape."""
    from snsde.fields import DiffusionField
    from snsde.kernels.fused_em import fused_em_solve
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, L, C, H = 128, 12, 5, 33
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    path = CubicPath(coeffs, times)
    field = DiffusionField.create(
        key, C, H, H, 2, input_option=4, noise_option=17
    ).bind(path)
    y0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    kb = jax.random.fold_in(key, 7)
    ys_f32 = fused_em_solve(field, path, times, y0, kb)
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "bf16x3")
    ys_x3 = fused_em_solve(field, path, times, y0, kb)
    np.testing.assert_allclose(
        np.asarray(ys_f32), np.asarray(ys_x3), atol=5e-3
    )


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


@requires_tpu
def test_in_kernel_rng_mode(monkeypatch):
    """SNSDE_FUSED_RNG=1: Brownian increments generated in-kernel from the
    hardware PRNG (no dW HBM stream). The realization differs from the
    streamed threefry draw, so assertions are distributional + structural:
    per-key determinism (incl. the backward's bit-identical regeneration),
    key sensitivity, and terminal moments matching the streamed path
    within Monte-Carlo error."""
    from snsde.fields import DiffusionField
    from snsde.kernels.fused_em import fused_em_solve
    from snsde.models.neuralsde import resolve_dt
    from snsde.nn.core import filter_value_and_grad
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs

    rng = np.random.default_rng(0)
    B, L, C, H = 2048, 12, 3, 8
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    path = CubicPath(coeffs, times)
    y0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    field = DiffusionField.create(jax.random.PRNGKey(1), C, H, H, 1,
                                  input_option=4, noise_option=17)
    dt = resolve_dt(times)
    kb = jax.random.PRNGKey(7)

    def solve(f, key):
        return fused_em_solve(f.bind(path), path, times, y0, key, dt=dt)

    ys_stream = solve(field, kb)

    monkeypatch.setenv("SNSDE_FUSED_RNG", "1")
    ys1 = solve(field, kb)
    ys2 = solve(field, kb)
    assert bool(jnp.array_equal(ys1, ys2))
    ys3 = solve(field, jax.random.PRNGKey(8))
    assert not bool(jnp.array_equal(ys1, ys3))

    # same SDE law as the streamed path: terminal mean within 3 MC
    # standard errors, per-lane variance ratio near 1
    mc = float(jnp.sqrt(jnp.mean(jnp.var(ys_stream[-1], 0)) / B))
    mean_diff = float(jnp.max(jnp.abs(
        jnp.mean(ys1[-1], 0) - jnp.mean(ys_stream[-1], 0))))
    assert mean_diff < 3.0 * mc, (mean_diff, mc)
    vr = jnp.var(ys1[-1], 0) / jnp.var(ys_stream[-1], 0)
    assert float(jnp.max(vr)) < 1.25 and float(jnp.min(vr)) > 0.8

    def loss(f, key):
        return jnp.mean(solve(f, key) ** 2)

    _, g1 = filter_value_and_grad(loss)(field, kb)
    _, g2 = filter_value_and_grad(loss)(field, kb)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        assert bool(jnp.all(jnp.isfinite(a)))
        assert bool(jnp.array_equal(a, b))


@requires_tpu
def test_fused_srk_matches_scan_tpu():
    """Compiled (Mosaic) fused SRK vs scan SRK on shared (dW, I10).

    Runs the scan side at exact-f32 matmul precision (HIGHEST): XLA's
    TPU default rounds matmul inputs to bf16 — a ~1e-3 input difference
    the SRK dynamics amplify past the comparison tolerance."""
    from snsde.fields import DiffusionField
    from snsde.kernels.fused_srk import fused_srk_solve
    from snsde.models.neuralsde import resolve_dt
    from snsde.ops.brownian import (BrownianGrid, brownian_increments,
                                    space_time_levy_area)
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
        key, C, H, H, 2, input_option=4, noise_option=17
    ).bind(path)
    y0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    kb = jax.random.fold_in(key, 7)
    grid, _ = make_grid(times, resolve_dt(times))
    kw, ku = jax.random.split(kb)
    dW = brownian_increments(kw, grid, (B, H))
    U = space_time_levy_area(ku, grid, (B, H), dW)
    bm = BrownianGrid(grid=jnp.asarray(grid), dW=dW, U=U)
    with jax.default_matmul_precision("highest"):
        ys_ref = sdeint(field.f, field.g, y0, times, bm=bm, method="srk")
    ys_fused = fused_srk_solve(field, path, times, y0, kb)
    # 2e-2 on chip: the SRK tableau runs 6 chained evals/step, so the
    # TPU matmul-precision floor (~1e-6 relative per matmul, different
    # rounding between Mosaic in-kernel dots and XLA scan dots) amplifies
    # ~10x more than the EM kernel's. Semantic parity is pinned at 1e-6
    # by the interpret-mode full-grid tests (tests/test_fused_srk.py).
    np.testing.assert_allclose(
        np.asarray(ys_ref), np.asarray(ys_fused), atol=2e-2
    )


@requires_tpu
@pytest.mark.parametrize("method", ["euler", "rk4"])
def test_fused_cde_matches_scan_tpu(method):
    """Compiled fused CDE kernel vs the scan cdeint on chip (semantic
    parity is pinned at ~1e-6 by the interpret-mode tests in
    tests/test_fused_cde.py; this validates the Mosaic compile)."""
    from snsde.kernels.fused_cde import fused_cde_solve, supports_fused_cde
    from snsde.models.neuralcde import FinalTanh
    from snsde.nn.core import filter_value_and_grad, partition
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import cdeint

    rng = np.random.default_rng(0)
    B, L, C, H, HH = 128, 12, 5, 33, 33
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    path = CubicPath(coeffs, times)
    func = FinalTanh.create(jax.random.PRNGKey(3), C, H, HH, 2)
    assert supports_fused_cde(func, method)
    z0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    dt = 0.5
    zs_fused = fused_cde_solve(func, path, times, z0, dt=dt, method=method)
    with jax.default_matmul_precision("highest"):
        zs_scan = cdeint(path, func, z0, times, dt=dt, method=method)
    np.testing.assert_allclose(
        np.asarray(zs_fused), np.asarray(zs_scan), atol=5e-3
    )

    def loss_fused(fld):
        return jnp.sum(
            fused_cde_solve(fld, path, times, z0, dt=dt, method=method)[-1]
            ** 2
        )

    def loss_scan(fld):
        with jax.default_matmul_precision("highest"):
            return jnp.sum(
                cdeint(path, fld, z0, times, dt=dt, method=method)[-1] ** 2
            )

    _, g1 = filter_value_and_grad(loss_fused)(func)
    _, g2 = filter_value_and_grad(loss_scan)(func)
    for a, b in zip(jax.tree_util.tree_leaves(partition(g1)[0]),
                    jax.tree_util.tree_leaves(partition(g2)[0])):
        if a is None or b is None:
            continue
        denom = float(np.abs(np.asarray(b)).max()) + 1e-8
        rel = float(np.abs(np.asarray(a) - np.asarray(b)).max()) / denom
        assert rel < 2e-2, rel


@requires_tpu
def test_fused_latent_matches_scan_tpu():
    """Compiled latent-mode EM kernel vs the scan augmented system."""
    from snsde.kernels.fused_em import fused_latent_em_solve
    from snsde.models.latent_sde import LatentSDE
    from snsde.models.neuralsde import resolve_dt
    from snsde.ops.solve import sdeint

    rng = np.random.default_rng(0)
    B, C, H = 128, 5, 33
    times = np.arange(10, dtype=np.float32)
    model = LatentSDE.create(jax.random.PRNGKey(1), C, H, H, 2,
                             method="euler")
    aug0 = jnp.concatenate(
        [jnp.asarray(rng.normal(size=(B, H - 1)), jnp.float32),
         jnp.zeros((B, 1))], axis=-1)
    key = jax.random.PRNGKey(5)
    dt = resolve_dt(times)
    ys_fused = fused_latent_em_solve(model, times, aug0, key, dt=dt)
    with jax.default_matmul_precision("highest"):
        ys_scan = sdeint(model.f_aug, model.g_aug, aug0, times, key=key,
                         dt=dt, method="euler")
    np.testing.assert_allclose(np.asarray(ys_fused), np.asarray(ys_scan),
                               atol=5e-3)


@requires_tpu
def test_fused_gru_matches_scan_tpu():
    """Compiled GRU kernel (with GRU-D decay rows + observation masking)
    vs lax.scan."""
    from snsde.kernels.fused_rnn import fused_gru_scan
    from snsde.nn.layers import GRUCell

    rng = np.random.default_rng(1)
    L, B, C, H = 19, 128, 5, 33
    cell = GRUCell.create(jax.random.PRNGKey(2), C, H)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)
    obs = jnp.asarray((rng.random((L, B)) < 0.5).astype(np.float32))
    hdec = jnp.asarray(np.exp(-rng.random((L, H))), jnp.float32)

    def step(h, x):
        xi, ob, dec = x
        h_in = h * dec[None]
        h2 = cell(xi, h_in)
        h2 = ob[:, None] * h2 + (1 - ob[:, None]) * h_in
        return h2, h2

    with jax.default_matmul_precision("highest"):
        _, hs_scan = jax.lax.scan(step, jnp.zeros((B, H)), (xs, obs, hdec))
    hs_fused = fused_gru_scan(cell, xs, obs=obs, hdec=hdec)
    np.testing.assert_allclose(np.asarray(hs_fused), np.asarray(hs_scan),
                               atol=5e-3)


@requires_tpu
def test_library_default_scan_parity_gated_shapes():
    """VERDICT r4 item 2: at the LIBRARY default (no explicit precision
    context), the scan paths the dispatch gates route to (C=20 CDE, H=32
    GRU) must match the fused kernels' pinned-HIGHEST numerics — i.e. the
    package-level jax_default_matmul_precision="highest" pin reaches the
    scan solvers on TPU. Pre-pin, the platform-default bf16-rounded dots
    diverge by ~1e-1 per dot (tools/probe_precision.py)."""
    import snsde  # noqa: F401  (applies the package precision pin)
    from snsde.kernels.fused_cde import fused_cde_solve, supports_fused_cde
    from snsde.kernels.fused_rnn import fused_gru_scan
    from snsde.models.neuralcde import FinalTanh
    from snsde.nn.layers import GRUCell
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import cdeint

    assert jax.config.jax_default_matmul_precision == "highest"

    # C=20 > SNSDE_FUSED_CDE_MAX_C=12: dispatch would route to scan.
    rng = np.random.default_rng(4)
    B, L, C, H = 64, 10, 20, 33
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    path = CubicPath(hermite_cubic_coeffs(jnp.asarray(times),
                                          jnp.asarray(X)), times)
    func = FinalTanh.create(jax.random.PRNGKey(5), C, H, H, 2)
    assert supports_fused_cde(func, "euler")
    z0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    zs_scan = cdeint(path, func, z0, times, dt=0.5, method="euler")
    zs_fused = fused_cde_solve(func, path, times, z0, dt=0.5,
                               method="euler")
    np.testing.assert_allclose(np.asarray(zs_scan), np.asarray(zs_fused),
                               atol=5e-3)

    # H=32 < SNSDE_FUSED_RNN_MIN_H=128: dispatch would route to scan.
    L, B, C, H = 19, 128, 5, 32
    cell = GRUCell.create(jax.random.PRNGKey(6), C, H)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)

    def step(h, x):
        h2 = cell(x, h)
        return h2, h2

    _, hs_scan = jax.lax.scan(step, jnp.zeros((B, H)), xs)
    hs_fused = fused_gru_scan(cell, xs)
    np.testing.assert_allclose(np.asarray(hs_scan), np.asarray(hs_fused),
                               atol=5e-3)


@requires_tpu
def test_fused_lstm_matches_scan_tpu():
    from snsde.kernels.fused_rnn import fused_lstm_scan
    from snsde.nn.layers import LSTMCell

    rng = np.random.default_rng(2)
    L, B, C, H = 19, 128, 5, 33
    cell = LSTMCell.create(jax.random.PRNGKey(3), C, H)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)
    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))

    def step(carry, x):
        h, carry = cell(x, carry)
        return carry, h

    with jax.default_matmul_precision("highest"):
        _, hs_scan = jax.lax.scan(step, init, xs)
    hs_fused = fused_lstm_scan(cell, xs)
    np.testing.assert_allclose(np.asarray(hs_fused), np.asarray(hs_scan),
                               atol=5e-3)


def test_backward_block_caps():
    """Scoped-VMEM regression pins (CPU-checkable, pure block math).

    Each row reproduces a config that overflowed Mosaic's 16M scoped-VMEM
    stack on v5e before the backward-aware caps (round-4 logs:
    flagship_sepsis 16.50M @ EM bwd 1024 rows; ab/srk_baseline 17.06M @
    SRK bwd 512; stage2 bench_cde 18.27M @ CDE bwd 512)."""
    from snsde.kernels.fused_cde import _pick_cde_block
    from snsde.kernels.fused_em import _config, _pick_block_cfg
    from snsde.kernels.fused_srk import _pick_block as srk_pick

    # EM, exact-f32 matmuls + f32 streams (flagship config): bwd <= 512
    cfg = _config(4, 17, False, False, 49, False)
    assert _pick_block_cfg(cfg, 1024, 128) == 1024
    assert _pick_block_cfg(cfg, 1024, 128, bwd=True) == 512
    # bf16 streams ALSO overflow at 1024 once exact-f32 matmuls add
    # operand-split scratch (16.52M @ L=160, round-4 bench_shapes_r2.log)
    cfg_b = _config(4, 17, False, False, 49, True)
    assert _pick_block_cfg(cfg_b, 1024, 128, bwd=True) == 512
    # single-pass bf16 matmuls ALSO cap at 512: no operand-split scratch,
    # but the [L,*] residual streams still overflowed at L=160 with f32
    # streams (20.50M > 16M, round-4 h_speech_bf16.log)
    cfg_mm = _config(4, 17, True, False, 49, True)
    assert _pick_block_cfg(cfg_mm, 1024, 128, bwd=True) == 512
    # SRK: exact/x3 backward drops a notch; bf16 keeps the 512 optimum
    assert srk_pick(1024, 128) == 512
    assert srk_pick(1024, 128, bwd=True, mm=False) == 256
    assert srk_pick(1024, 128, bwd=True, mm="x3") == 256
    assert srk_pick(1024, 128, bwd=True, mm=True) == 512
    # CDE: backward quarters the row budget (block 256 at bench CHp=256)
    cde_cfg = {"CHp": 256}
    assert _pick_cde_block(1024, cde_cfg) == 1024
    assert _pick_cde_block(1024, cde_cfg, bwd=True) == 256
