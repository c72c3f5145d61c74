"""Model zoo shape/finiteness contracts + cross-model consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snsde.models import (
    GRUD,
    FinalTanh,
    GRUODEField,
    GRUdt,
    LatentSDE,
    NeuralCDE,
    NeuralCDEStream,
    ODERNN,
    SeqCNN,
    SeqRNN,
    SeqTransformer,
    SingleHiddenLayer,
)
from snsde.ops.interp import hermite_cubic_coeffs


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, L, C = 4, 10, 3
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    intensity = np.cumsum(rng.random((B, L, C)) < 0.7, axis=1).astype(
        np.float32
    )
    tchan = np.broadcast_to(times[None, :, None], (B, L, 1))
    Xg = np.concatenate([tchan, intensity, X], -1)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(Xg))
    fi = np.full(B, L - 1, np.int64)
    return key, times, coeffs, fi, X, (B, L, C)


def test_ncde_terminal_and_stream(setup):
    key, times, coeffs, fi, X, (B, L, C) = setup
    ic = 1 + 2 * C
    func = FinalTanh.create(key, ic, 16, 16, 2)
    m = NeuralCDE.create(key, func, ic, 16, 5)
    out, _ = m(times, coeffs, fi, key=key)
    assert out.shape == (B, 5)
    ms = NeuralCDEStream.create(key, func, ic, 16, 5)
    out, stream = ms(times, coeffs)
    assert out.shape == (B, L, 5) and stream.shape == (B, L, 16)
    assert bool(jnp.isfinite(out).all())


def test_ncde_final_index_gather_matches_stream(setup):
    """Terminal output at final_index must equal the stream value there."""
    key, times, coeffs, fi, X, (B, L, C) = setup
    ic = 1 + 2 * C
    func = SingleHiddenLayer.create(key, ic, 8, 8)
    m = NeuralCDE.create(key, func, ic, 8, 2)
    fi_var = np.array([L - 1, L - 2, 3, 5], np.int64)
    out_term, _ = m(times, coeffs, fi_var, key=key)
    out_stream, _ = m(times, coeffs, fi_var, key=key, stream=True)
    picked = np.stack(
        [np.asarray(out_stream)[i, fi_var[i]] for i in range(B)]
    )
    np.testing.assert_allclose(np.asarray(out_term), picked, atol=1e-5)


def test_gru_family_masked_updates(setup):
    """With zero intensity everywhere after step 0, hidden state must stay
    frozen for GRU-dt (no evolve, no update)."""
    key, times, coeffs, fi, X, (B, L, C) = setup
    ic = 1 + 2 * C
    tchan = np.broadcast_to(
        np.asarray(times)[None, :, None], (B, L, 1)
    ).astype(np.float32)
    intensity = np.zeros((B, L, C), np.float32)
    intensity[:, 0, :] = 1.0  # only first step observed
    Xg = np.concatenate([tchan, intensity, X], -1)
    cg = hermite_cubic_coeffs(jnp.asarray(np.asarray(times)), jnp.asarray(Xg))
    m = GRUdt.create(key, ic, 8, 2)
    _, stream = m(times, cg, fi)
    s = np.asarray(stream)
    # states after the first update never change
    np.testing.assert_allclose(s[:, 1:], np.repeat(s[:, :1], L - 1, axis=1),
                               atol=1e-5)


def test_grud_decays_toward_zero(setup):
    key, times, coeffs, fi, X, (B, L, C) = setup
    ic = 1 + 2 * C
    m = GRUD.create(key, ic, 8, 2)
    o, stream = m(times, coeffs, fi)
    assert bool(jnp.isfinite(o).all())


def test_odernn_runs(setup):
    key, times, coeffs, fi, X, (B, L, C) = setup
    ic = 1 + 2 * C
    m = ODERNN.create(key, ic, 8, 2, 8, 2)
    o, _ = m(times, coeffs, fi)
    assert o.shape == (B, 2) and bool(jnp.isfinite(o).all())


def test_seq_baselines(setup):
    key, times, coeffs, fi, X, (B, L, C) = setup
    x = jnp.asarray(X)
    for m in [
        SeqRNN.create(key, C, 8, 2, "gru"),
        SeqRNN.create(key, C, 8, 2, "lstm", bidirectional=True),
        SeqCNN.create(key, C, 8, 2),
        SeqTransformer.create(key, C, 8, 2, num_heads=2, num_layers=1),
    ]:
        o, s = m(x)
        assert o.shape == (B, 10, 2)
        assert bool(jnp.isfinite(o).all())


def test_latent_sde_kl_positive_and_grads(setup):
    key, times, coeffs, fi, X, (B, L, C) = setup
    tchan = np.broadcast_to(
        np.asarray(times)[None, :, None], (B, L, 1)
    ).astype(np.float32)
    cv = hermite_cubic_coeffs(
        jnp.asarray(np.asarray(times)),
        jnp.asarray(np.concatenate([tchan, X], -1)),
    )
    m = LatentSDE.create(key, 1 + C, 8, 8, 1)
    out, latent, logqp = m(cv, times, key=key, method="euler")
    assert out.shape == (B, L, 8) and latent.shape == (B, L, 7)
    assert float(logqp) >= 0.0

    from snsde.nn.core import filter_value_and_grad

    def loss(mm):
        o, _, kl = mm(cv, times, key=key, method="euler")
        return jnp.mean(o**2) + 0.1 * kl

    # perturb q(y0) away from p(y0): at q==p the KL gradient is exactly 0
    m = m.replace(qy0_logvar=m.qy0_logvar + 0.5)
    val, grads = filter_value_and_grad(loss)(m)
    gleaves = [
        g for g in jax.tree_util.tree_leaves(grads) if g is not None
    ]
    assert all(bool(jnp.isfinite(g).all()) for g in gleaves)
    # the KL term must produce gradient signal on q(y0)
    assert float(jnp.abs(grads.qy0_logvar).max()) > 0


def test_latent_sde_zero_kl_when_posterior_equals_prior(setup):
    """If f == h and q(y0)==p(y0), logqp must be ~0 (ELBO decomposition
    theory check, tutorial LSDE+KLD notebook)."""
    key, times, coeffs, fi, X, (B, L, C) = setup
    m = LatentSDE.create(key, 1 + C, 8, 8, 1)

    # force posterior drift == prior drift by zeroing the drift MLP and
    # aligning theta/mu so h(t,y) == 0 == f(t,y)
    import dataclasses

    zeroed = jax.tree_util.tree_map(jnp.zeros_like, m.linear_out)
    m = m.replace(linear_out=zeroed)
    from snsde.nn.core import Buffer

    m = m.replace(theta=Buffer(jnp.zeros((1, 1))))
    tchan = np.broadcast_to(
        np.asarray(times)[None, :, None], (B, L, 1)
    ).astype(np.float32)
    cv = hermite_cubic_coeffs(
        jnp.asarray(np.asarray(times)),
        jnp.asarray(np.concatenate([tchan, X], -1)),
    )
    _, _, logqp = m(cv, times, key=key, method="euler")
    assert abs(float(logqp)) < 1e-5


class TestSeedEnsemble:
    """K seed-replicas trained through one lane-packed solve
    (models/ensemble.py; mirrors the reference's 5-repeat grids)."""

    def _setup(self, K=3):
        from snsde.fields import DiffusionField
        from snsde.models import SeedEnsemble

        rng = np.random.default_rng(0)
        B, L, C, H = 16, 8, 3, 6
        times = np.arange(L, dtype=np.float32)
        X = rng.normal(size=(B, L, C)).astype(np.float32)
        coeffs = hermite_cubic_coeffs(jnp.asarray(times),
                                      jnp.asarray(X))
        y = jnp.asarray((rng.random(B) < 0.5).astype(np.float32))
        fi = jnp.full((B,), L - 1, jnp.int32)
        ens = SeedEnsemble.create(
            jax.random.PRNGKey(0),
            lambda k: DiffusionField.create(k, C, H, H, 1, input_option=4,
                                            noise_option=17),
            input_channels=C, hidden_channels=H, output_channels=1,
            n_members=K,
        )
        return ens, times, coeffs, y, fi, (B, K)

    def test_members_independent_and_match_solo(self):
        ens, times, coeffs, y, fi, (B, K) = self._setup()
        logits, _ = ens(times, coeffs, fi, key=jax.random.PRNGKey(1))
        assert logits.shape == (K, B, 1)
        # different weights + noise -> distinct members
        assert not bool(jnp.allclose(logits[0], logits[1]))
        # member i's solve must equal a solo solve of the same field with
        # the same per-member key (the ensemble's key-split contract)
        ksolve, _ = jax.random.split(jax.random.PRNGKey(1))
        keys = jax.random.split(ksolve, K)
        zs = ens.solve(times, coeffs, key=ksolve)
        from snsde.models.neuralsde import solve_dispatch
        from snsde.ops.interp import CubicPath

        path = CubicPath(coeffs, times)
        for i in range(K):
            y0 = ens.initial_networks[i](
                path.evaluate(jnp.asarray(times)[0]))
            zi = solve_dispatch(ens.fields[i].bind(path), path, times, y0,
                                key=keys[i], dt=None, method="euler")
            np.testing.assert_allclose(np.asarray(zs[i]), np.asarray(zi),
                                       atol=1e-5)

    def test_ensemble_trains(self):
        import optax

        from snsde.nn.core import combine, filter_value_and_grad, partition
        from snsde.train.loop import bce_with_logits

        ens, times, coeffs, y, fi, (B, K) = self._setup()
        tx = optax.adam(1e-2)
        params, _ = partition(ens)
        opt_state = tx.init(params)

        def loss_fn(m, key):
            logits, new_m = m(times, coeffs, fi, key=key, train=True)
            per = jnp.stack([
                bce_with_logits(logits[i, :, 0], y) for i in range(K)
            ])
            return jnp.sum(per), (per, new_m)

        vg = filter_value_and_grad(loss_fn, has_aux=True)

        @jax.jit
        def step(m, os_, key):
            (tot, (per, new_m)), grads = vg(m, key)
            p, rest = partition(new_m)
            up, os2 = tx.update(grads, os_, p)
            return combine(optax.apply_updates(p, up), rest), os2, per

        key = jax.random.PRNGKey(3)
        ens2, opt_state, per0 = step(ens, opt_state, key)
        for i in range(25):
            ens2, opt_state, per = step(ens2, opt_state,
                                        jax.random.fold_in(key, i))
        # every member's loss decreases independently
        assert bool(jnp.all(per < per0))
