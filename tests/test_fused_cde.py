"""Fused CDE kernel parity on CPU via Pallas interpret mode.

Validates the fused explicit-RK CDE kernel (snsde/kernels/fused_cde.py)
— forward AND the hand-written backward — against ops.solve.cdeint (the
scan path) on identical grids, for every tableau, both supported vector
fields, and the lane-packing edge cases (multi-row stage lanes, step
counts not divisible by the unroll). Gradients are compared for the
field weights, z0, AND the interpolation coefficients (the control
stream is differentiated, unlike the SDE kernels' Brownian stream).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.models.neuralcde import FinalTanh, SingleHiddenLayer
from snsde.nn.core import filter_value_and_grad, partition
from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
from snsde.ops.solve import cdeint


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("SNSDE_FUSED_INTERPRET", "1")
    monkeypatch.setenv("SNSDE_FUSED_STREAM", "f32")


def _setting(B=8, L=6, C=3, H=5, seed=0):
    rng = np.random.default_rng(seed)
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x))
    path = CubicPath(coeffs, times)
    z0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    return path, times, z0


def _make_field(kind, C, H, HH, n_inner, key=3):
    k = jax.random.PRNGKey(key)
    if kind == "final_tanh":
        return FinalTanh.create(k, C, H, HH, n_inner + 1)
    return SingleHiddenLayer.create(k, C, H, HH)


@pytest.mark.parametrize("method", ["euler", "midpoint", "heun", "rk4"])
def test_fused_cde_matches_scan(method):
    from snsde.kernels.fused_cde import fused_cde_solve, supports_fused_cde

    path, times, z0 = _setting()
    func = _make_field("final_tanh", 3, 5, 7, 1)
    assert supports_fused_cde(func, method)
    dt = 0.08
    zs_fused = fused_cde_solve(func, path, times, z0, dt=dt, method=method)
    zs_scan = cdeint(path, func, z0, times, dt=dt, method=method)
    np.testing.assert_allclose(np.asarray(zs_fused), np.asarray(zs_scan),
                               atol=3e-5)


@pytest.mark.parametrize("kind,n_inner", [("final_tanh", 0),
                                          ("final_tanh", 2),
                                          ("single", 0)])
def test_fused_cde_field_variants(kind, n_inner):
    from snsde.kernels.fused_cde import fused_cde_solve

    path, times, z0 = _setting()
    func = _make_field(kind, 3, 5, 7, n_inner)
    zs_fused = fused_cde_solve(func, path, times, z0, dt=0.1, method="rk4")
    zs_scan = cdeint(path, func, z0, times, dt=0.1, method="rk4")
    np.testing.assert_allclose(np.asarray(zs_fused), np.asarray(zs_scan),
                               atol=3e-5)


def test_fused_cde_wide_channels():
    """C large enough that the packed stage row spans >1 lane tile and
    H*C spans multiple tiles (SW=256, CHp=256 at C=50, H=3, rk4)."""
    from snsde.kernels.fused_cde import fused_cde_solve, supports_fused_cde

    path, times, z0 = _setting(C=50, H=3)
    func = _make_field("final_tanh", 50, 3, 9, 1)
    assert supports_fused_cde(func, "rk4")
    zs_fused = fused_cde_solve(func, path, times, z0, dt=0.11, method="rk4")
    zs_scan = cdeint(path, func, z0, times, dt=0.11, method="rk4")
    np.testing.assert_allclose(np.asarray(zs_fused), np.asarray(zs_scan),
                               atol=3e-5)


@pytest.mark.parametrize("method", ["euler", "rk4"])
def test_fused_cde_gradients_match_scan(method):
    from snsde.kernels.fused_cde import fused_cde_solve

    path, times, z0 = _setting()
    func = _make_field("final_tanh", 3, 5, 7, 1)
    dt = 0.09

    def loss_fused(fld):
        return jnp.sum(
            fused_cde_solve(fld, path, times, z0, dt=dt, method=method)[-1]
            ** 2
        )

    def loss_scan(fld):
        return jnp.sum(
            cdeint(path, fld, z0, times, dt=dt, method=method)[-1] ** 2
        )

    _, g1 = filter_value_and_grad(loss_fused)(func)
    _, g2 = filter_value_and_grad(loss_scan)(func)
    for a, b in zip(jax.tree_util.tree_leaves(partition(g1)[0]),
                    jax.tree_util.tree_leaves(partition(g2)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_cde_control_and_z0_gradients():
    """The control stream is differentiated: grads reach the interpolation
    coefficients exactly (learned-control support), and z0 grads match."""
    from snsde.kernels.fused_cde import fused_cde_solve

    rng = np.random.default_rng(1)
    B, L, C, H = 4, 5, 3, 5
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    z0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    func = _make_field("final_tanh", C, H, 7, 1)
    dt = 0.07

    def loss(fn, series, z_init):
        coeffs = hermite_cubic_coeffs(jnp.asarray(times), series)
        p = CubicPath(coeffs, times)
        zs = fn(p, z_init)
        return jnp.sum(zs[-1] ** 2)

    fused = lambda p, zi: fused_cde_solve(func, p, times, zi, dt=dt,
                                          method="rk4")
    scan = lambda p, zi: cdeint(p, func, zi, times, dt=dt, method="rk4")

    gx1, gz1 = jax.grad(lambda s, zi: loss(fused, s, zi), argnums=(0, 1))(
        x, z0
    )
    gx2, gz2 = jax.grad(lambda s, zi: loss(scan, s, zi), argnums=(0, 1))(
        x, z0
    )
    assert float(jnp.abs(gx2).max()) > 1e-6   # the comparison is non-vacuous
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gz1), np.asarray(gz2),
                               rtol=2e-4, atol=2e-5)


def test_fused_cde_unroll_padding(monkeypatch):
    """Step counts not divisible by the unroll hit the dt=0 identity-step
    padding; results must be unchanged."""
    from snsde.kernels.fused_cde import fused_cde_solve

    path, times, z0 = _setting(L=5)
    func = _make_field("final_tanh", 3, 5, 7, 1)
    dt = None  # step exactly on the 4 intervals -> M=4
    monkeypatch.setenv("SNSDE_FUSED_UNROLL", "3")   # M=4 -> pad to 6
    zs_pad = fused_cde_solve(func, path, times, z0, dt=dt, method="rk4")
    monkeypatch.setenv("SNSDE_FUSED_UNROLL", "1")
    zs_exact = fused_cde_solve(func, path, times, z0, dt=dt, method="rk4")
    np.testing.assert_allclose(np.asarray(zs_pad), np.asarray(zs_exact),
                               atol=1e-6)


def test_fused_cde_vmap_falls_back(monkeypatch):
    """SNSDE_VMAP_ROUTE=0 restores the warned scan fallback under vmap
    (routing onto the packed kernel is the default — see the routed
    tests below)."""
    from snsde.kernels.fused_cde import fused_cde_solve

    monkeypatch.setenv("SNSDE_VMAP_ROUTE", "0")
    path, times, z0 = _setting(B=4)
    func = _make_field("final_tanh", 3, 5, 7, 1)
    z0s = jnp.stack([z0, z0 + 0.1])
    with pytest.warns(UserWarning, match="under vmap"):
        out = jax.vmap(
            lambda zi: fused_cde_solve(func, path, times, zi, dt=0.1,
                                       method="rk4")
        )(z0s)
    ref = cdeint(path, func, z0, times, dt=0.1, method="rk4")
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(jnp.moveaxis(ref, 0, 0)),
                               atol=1e-5)


def test_supports_fused_cde_guards():
    from snsde.kernels.fused_cde import supports_fused_cde
    from snsde.models.neuralcde import GRUODEField

    func = _make_field("final_tanh", 3, 5, 7, 1)
    assert supports_fused_cde(func, "rk4")
    assert not supports_fused_cde(func, "dopri5")       # adaptive -> scan
    gru = GRUODEField.create(jax.random.PRNGKey(0), 3, 5)
    assert supports_fused_cde(gru, "rk4")               # gruode field kind
    # gruode keeps THREE [Hp, H*C] gate weights VMEM-resident -> the
    # budget trips at widths a FinalTanh of the same shape still passes
    gru_wide = GRUODEField.create(jax.random.PRNGKey(0), 32, 128)
    assert not supports_fused_cde(gru_wide, "rk4")
    assert not supports_fused_cde(object(), "rk4")      # unknown field kind
    huge = _make_field("final_tanh", 200, 64, 16, 0)    # H*C = 12800 lanes
    assert not supports_fused_cde(huge, "rk4")


def _stack_fields(fields):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fields)


def test_fused_cde_packed_matches_sequential():
    """K lane-packed members == K sequential fused solves (shared path)."""
    from snsde.kernels.fused_cde import fused_cde_solve
    from snsde.kernels.multi import fused_cde_solve_packed

    path, times, z0 = _setting()
    fields = [_make_field("final_tanh", 3, 5, 7, 1, key=i) for i in range(3)]
    z0s = jnp.stack([z0, z0 + 0.3, z0 - 0.2])
    zs_packed = fused_cde_solve_packed(fields, path, times, z0s, dt=0.09,
                                       method="rk4")
    for i, f in enumerate(fields):
        zs_i = fused_cde_solve(f, path, times, z0s[i], dt=0.09,
                               method="rk4")
        np.testing.assert_allclose(np.asarray(zs_packed[i]),
                                   np.asarray(zs_i), atol=1e-5)


def test_fused_cde_packed_per_member_paths():
    """Per-member control paths (the robustness sweep's per-seed
    missingness case): member-major packed stream, member-aware E."""
    from snsde.kernels.fused_cde import fused_cde_solve
    from snsde.kernels.multi import fused_cde_solve_packed

    fields, paths, z0s = [], [], []
    times = np.linspace(0.0, 1.0, 6).astype(np.float32)
    for i in range(3):
        p, _, z0 = _setting(seed=10 + i)
        fields.append(_make_field("final_tanh", 3, 5, 7, 1, key=i))
        paths.append(p)
        z0s.append(z0)
    z0s = jnp.stack(z0s)
    zs_packed = fused_cde_solve_packed(fields, paths[0], times, z0s,
                                       dt=0.09, method="rk4", paths=paths)
    for i in range(3):
        zs_i = fused_cde_solve(fields[i], paths[i], times, z0s[i], dt=0.09,
                               method="rk4")
        np.testing.assert_allclose(np.asarray(zs_packed[i]),
                                   np.asarray(zs_i), atol=1e-5)


def test_fused_cde_routed_vmap():
    """vmap over a fused CDE solve routes onto the packed kernel (no
    fallback warning) and matches sequential solves; grads flow."""
    import warnings as _w

    from snsde.kernels.fused_cde import fused_cde_solve

    path, times, z0 = _setting()
    fields = [_make_field("final_tanh", 3, 5, 7, 1, key=i) for i in range(2)]
    stacked = _stack_fields(fields)
    z0s = jnp.stack([z0, z0 + 0.1])

    with _w.catch_warnings():
        _w.simplefilter("error")        # any fallback warning -> failure
        out = jax.vmap(
            lambda f, zi: fused_cde_solve(f, path, times, zi, dt=0.1,
                                          method="rk4")
        )(stacked, z0s)
    for i, f in enumerate(fields):
        ref = fused_cde_solve(f, path, times, z0s[i], dt=0.1, method="rk4")
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   atol=1e-5)

    # grad around vmap reaches per-member weights through the packed VJP
    def loss(st):
        zs = jax.vmap(
            lambda f, zi: fused_cde_solve(f, path, times, zi, dt=0.1,
                                          method="rk4")
        )(st, z0s)
        return jnp.sum(zs[:, -1] ** 2)

    from snsde.nn.core import filter_value_and_grad, partition

    def loss_seq(st):
        zs = jnp.stack([
            fused_cde_solve(
                jax.tree_util.tree_map(lambda l: l[i], st), path, times,
                z0s[i], dt=0.1, method="rk4")
            for i in range(2)
        ])
        return jnp.sum(zs[:, -1] ** 2)

    _, g1 = filter_value_and_grad(loss)(stacked)
    _, g2 = filter_value_and_grad(loss_seq)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(partition(g1)[0]),
                    jax.tree_util.tree_leaves(partition(g2)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_cde_routed_vmap_too_wide_falls_back():
    from snsde.kernels.fused_cde import fused_cde_solve

    path, times, z0 = _setting(C=50, H=3)
    # K=4, NT=3, C=50 -> packed SW 600 > 512: warned scan fallback
    fields = [_make_field("final_tanh", 50, 3, 9, 1, key=i)
              for i in range(4)]
    # per-member paths force the K*NT*C packed stream width
    paths = [jax.tree_util.tree_map(lambda l: l, path) for _ in range(4)]
    stacked = _stack_fields(fields)
    stacked_paths = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *paths
    )
    z0s = jnp.stack([z0] * 4)
    with pytest.warns(UserWarning, match="lane caps|scan"):
        out = jax.vmap(
            lambda f, p, zi: fused_cde_solve(f, p, times, zi, dt=0.1,
                                             method="rk4")
        )(stacked, stacked_paths, z0s)
    ref = cdeint(path, fields[0], z0, times, dt=0.1, method="rk4")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                               atol=1e-5)


def test_fused_cde_routed_vmap_wide_c_gates_to_scan():
    """The measured packed perf gate (BENCH_PACKED_CDE.json: packed
    loses past C=16) routes wide-C routed vmaps onto the vmapped scan
    QUIETLY — correct results, no fallback warning."""
    import warnings as _w

    from snsde.kernels.fused_cde import fused_cde_solve

    path, times, z0 = _setting(C=20, H=5)
    fields = [_make_field("final_tanh", 20, 5, 7, 1, key=i)
              for i in range(2)]
    stacked = _stack_fields(fields)
    z0s = jnp.stack([z0, z0 + 0.1])
    with _w.catch_warnings():
        _w.simplefilter("error")        # the gate branch must NOT warn
        out = jax.vmap(
            lambda f, zi: fused_cde_solve(f, path, times, zi, dt=0.1,
                                          method="rk4")
        )(stacked, z0s)
    for i, f in enumerate(fields):
        ref = cdeint(path, f, z0s[i], times, dt=0.1, method="rk4")
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   atol=1e-5)


def test_fused_cde_gruode_matches_scan():
    """The GRU-ODE vector field (continuous GRU gating, reference
    vector_fields.py GRU_ODE) through the fused kernel == scan cdeint,
    forward and gradients (incl. the state-expand z @ S^T chain)."""
    from snsde.kernels.fused_cde import fused_cde_solve, supports_fused_cde
    from snsde.models.neuralcde import GRUODEField

    path, times, z0 = _setting()
    func = GRUODEField.create(jax.random.PRNGKey(4), 3, 5)
    assert supports_fused_cde(func, "rk4")
    zs_fused = fused_cde_solve(func, path, times, z0, dt=0.09, method="rk4")
    zs_scan = cdeint(path, func, z0, times, dt=0.09, method="rk4")
    np.testing.assert_allclose(np.asarray(zs_fused), np.asarray(zs_scan),
                               atol=3e-5)

    def loss_fused(fld):
        return jnp.sum(
            fused_cde_solve(fld, path, times, z0, dt=0.09,
                            method="rk4")[-1] ** 2
        )

    def loss_scan(fld):
        return jnp.sum(
            cdeint(path, fld, z0, times, dt=0.09, method="rk4")[-1] ** 2
        )

    _, g1 = filter_value_and_grad(loss_fused)(func)
    _, g2 = filter_value_and_grad(loss_scan)(func)
    compared = 0
    for a, b in zip(jax.tree_util.tree_leaves(partition(g1)[0]),
                    jax.tree_util.tree_leaves(partition(g2)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
        compared += 1
    assert compared >= 6               # 3 gate weights + 3 biases


def test_fused_cde_gruode_packed():
    from snsde.kernels.fused_cde import fused_cde_solve
    from snsde.kernels.multi import fused_cde_solve_packed
    from snsde.models.neuralcde import GRUODEField

    path, times, z0 = _setting()
    funcs = [GRUODEField.create(jax.random.PRNGKey(i), 3, 5)
             for i in range(2)]
    z0s = jnp.stack([z0, z0 - 0.4])
    zs_packed = fused_cde_solve_packed(funcs, path, times, z0s, dt=0.09,
                                       method="rk4")
    for i, f in enumerate(funcs):
        ref = fused_cde_solve(f, path, times, z0s[i], dt=0.09,
                              method="rk4")
        np.testing.assert_allclose(np.asarray(zs_packed[i]),
                                   np.asarray(ref), atol=1e-5)


def test_fused_cde_linear_path():
    """LinearPath controls (neuralcde-l/-r variants) ride the fused
    kernel via LinearPath.derivative_grid; parity vs scan."""
    from snsde.kernels.fused_cde import fused_cde_solve
    from snsde.ops.interp import LinearPath

    rng = np.random.default_rng(2)
    B, L, C, H = 8, 6, 3, 5
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    vals = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    path = LinearPath(times=jnp.asarray(times), values=vals)
    func = _make_field("final_tanh", C, H, 7, 1)
    z0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    zs_fused = fused_cde_solve(func, path, times, z0, dt=0.09,
                               method="rk4")
    zs_scan = cdeint(path, func, z0, times, dt=0.09, method="rk4")
    np.testing.assert_allclose(np.asarray(zs_fused), np.asarray(zs_scan),
                               atol=3e-5)


def test_ancde_dispatch_parity(monkeypatch):
    """ANCDE end-to-end through the fused dispatch (interpret mode,
    backend monkeypatched to 'tpu') == the scan path — including the
    LEARNED second-phase control (Y_path), whose gradient flows through
    the kernel's differentiated control stream."""
    from snsde.models.ancde import ANCDE
    from snsde.nn.core import filter_value_and_grad, partition

    rng = np.random.default_rng(8)
    B, L, C, H = 6, 6, 3, 5
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x))
    model = ANCDE.create(jax.random.PRNGKey(2), C, H, 7, 2)

    def loss(m):
        out = m(times, coeffs)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(jnp.asarray(out) ** 2)

    l_scan, g_scan = filter_value_and_grad(loss)(model)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        l_fused, g_fused = filter_value_and_grad(loss)(model)
    finally:
        monkeypatch.undo()

    np.testing.assert_allclose(float(l_fused), float(l_scan), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(partition(g_fused)[0]),
                    jax.tree_util.tree_leaves(partition(g_scan)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_fused_cde_exact_tile_widths():
    """H*C an exact 128 multiple (no CHp padding) and H=128 state."""
    from snsde.kernels.fused_cde import fused_cde_solve

    rng = np.random.default_rng(21)
    B, L, C, H = 4, 4, 4, 32          # H*C = 128 exactly
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x))
    path = CubicPath(coeffs, times)
    func = FinalTanh.create(jax.random.PRNGKey(22), C, H, 16, 1)
    z0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    zs_fused = fused_cde_solve(func, path, times, z0, dt=0.3, method="rk4")
    zs_scan = cdeint(path, func, z0, times, dt=0.3, method="rk4")
    np.testing.assert_allclose(np.asarray(zs_fused), np.asarray(zs_scan),
                               atol=3e-5)


def test_gruode_pinned_exact_under_matmul_env(monkeypatch):
    """GRU-ODE ignores SNSDE_FUSED_MATMUL: its z-feedback through the gate
    matmuls amplifies operand rounding (NaN at iter 1 on v5e at platform
    default, divergence after ~10 iters under bf16x3 — round-4
    probe_gruode_nan.py), so the fused kernel pins the gruode kind to
    exact-f32 dots. FinalTanh, by contrast, must still honor the env."""
    from snsde.kernels.fused_cde import fused_cde_solve
    from snsde.models.neuralcde import GRUODEField

    assert GRUODEField.precision_sensitive

    path, times, z0 = _setting()
    gru = GRUODEField.create(jax.random.PRNGKey(4), 3, 5)
    base = fused_cde_solve(gru, path, times, z0, dt=0.09, method="rk4")
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "bf16x3")
    pinned = fused_cde_solve(gru, path, times, z0, dt=0.09, method="rk4")
    assert bool(jnp.array_equal(base, pinned))   # bitwise: env ignored

    ft = _make_field("final_tanh", 3, 5, 7, 1)
    monkeypatch.delenv("SNSDE_FUSED_MATMUL")
    ft_base = fused_cde_solve(ft, path, times, z0, dt=0.09, method="rk4")
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "bf16x3")
    ft_x3 = fused_cde_solve(ft, path, times, z0, dt=0.09, method="rk4")
    assert not bool(jnp.array_equal(ft_base, ft_x3))  # env honored
