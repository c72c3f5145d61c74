"""Behavioral (semantic) assertions for the model zoo — one per family,
beyond shape/finiteness (VERDICT round-1 item 7), plus a full-registry
execution sweep so every one of the 226 names runs at least once."""

import jax
import jax.numpy as jnp
import zlib

import numpy as np
import pytest

from snsde.ops.interp import hermite_cubic_coeffs
from snsde.registry import MODEL_NAMES, make_seq_layer


# ---------------------------------------------------------------------------
# per-family semantics
# ---------------------------------------------------------------------------

def test_hard_sigmoid_ste_binarizes_with_straight_through_grads():
    """ANCDE's binarizer (reference Hardsigmoid + RoundFunctionST,
    ancde_model.py:15-40): forward emits exact {0,1}, backward passes the
    hard-sigmoid gradient straight through."""
    from snsde.models.ancde import hard_sigmoid_ste

    x = jnp.asarray([-3.0, -0.4, 0.0, 0.4, 3.0])
    y = hard_sigmoid_ste(x)
    assert set(np.unique(np.asarray(y))).issubset({0.0, 1.0})
    g = jax.grad(lambda v: jnp.sum(hard_sigmoid_ste(v)))(x)
    assert float(jnp.abs(g).max()) > 0.0     # not a dead zero gradient


def test_grud_hidden_decay_contracts_and_is_exponential():
    """GRU-D family: evolve(h, Δt) = h * exp(-relu(Linear(Δt))) (reference
    GRU_D, other.py:96-104) — never expands |h| (rate >= 0), and with a
    unit-weight decay layer equals exact exponential decay."""
    from snsde.models.rnn import GRUD
    from snsde.nn.layers import Linear

    m = GRUD.create(jax.random.PRNGKey(0), 5, 8, 2)
    h = jnp.ones((8,))
    for d in (0.0, 0.5, 2.0, 10.0):
        out = m.evolve(h, jnp.asarray(d))
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-6   # contraction

    unit = m.replace(decay=Linear(weight=jnp.ones((1, 8)),
                                  bias=jnp.zeros((8,))))
    for d in (0.3, 1.7):
        np.testing.assert_allclose(
            np.asarray(unit.evolve(h, jnp.asarray(d))),
            np.exp(-d) * np.ones(8), rtol=1e-5,
        )


def test_coupling_flow_identity_at_t0_and_invertible():
    """Neural-flow family: flows are identity at t=0 (TimeTanh(0)=0) and
    coupling layers are analytically invertible given the untransformed
    half (the defining property the reference inherits from stribor)."""
    from snsde.models.flows import CouplingFlowLayer

    key = jax.random.PRNGKey(1)
    layer = CouplingFlowLayer.create(key, 6, 16, parity=0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 6))
    t0 = jnp.zeros((4, 1))
    np.testing.assert_allclose(np.asarray(layer(x, t0)), np.asarray(x),
                               atol=1e-6)

    t = 0.7 * jnp.ones((4, 1))
    y = layer(x, t)
    # invert: the masked half is untouched; recompute (s, u) from it
    D = 6
    idx = jnp.arange(D)
    mask = ((idx % 2) == 0).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(y * mask), np.asarray(x * mask),
                               atol=1e-6)
    h = jax.nn.relu(layer.net1(jnp.concatenate([y * mask, t], axis=-1)))
    su = layer.net2(h) * layer.time_net(t)
    s, u = su[..., :D], su[..., D:]
    x_rec = (y - u * (1 - mask)) * jnp.exp(-s * (1 - mask))
    x_rec = x_rec * (1 - mask) + y * mask
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


def test_resnet_and_gru_flows_identity_at_t0():
    from snsde.models.flows import GRUFlowBlock, ResNetFlowLayer

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 6))
    t0 = jnp.zeros((4, 1))
    r = ResNetFlowLayer.create(key, 6, 16)
    np.testing.assert_allclose(np.asarray(r(x, t0)), np.asarray(x),
                               atol=1e-6)
    g = GRUFlowBlock.create(key, 6)
    np.testing.assert_allclose(np.asarray(g(x, t0)), np.asarray(x),
                               atol=1e-6)


def test_ancde_attention_actually_gates():
    """ANCDE: the bottom-CDE attention is a (0,1) gate that varies over
    time and input — not a constant passthrough."""
    from snsde.models.ancde import ANCDE

    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(0)
    B, L, C = 4, 8, 3
    times = np.linspace(0, 1, L).astype(np.float32)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x))
    m = ANCDE.create(key, C, 8, 8, method="rk4")
    att = m.attention_path(times, coeffs)
    att = np.asarray(att)
    assert att.min() >= 0.0 and att.max() <= 1.0
    assert att.std() > 1e-4                     # actually varies


def test_sand_dense_interpolation_matches_reference_loop():
    """SAnD dense interpolation weights equal the reference's explicit
    double loop (SAnD_modules.py:96-115)."""
    from snsde.models.attn import dense_interpolation

    L, M, H = 9, 4, 3
    W = np.zeros((M, L), np.float32)
    for t in range(L):
        s = (M * (t + 1)) / L
        for m_ in range(M):
            W[m_, t] = (1 - abs(s - (1 + m_)) / M) ** 2
    x = np.random.default_rng(0).normal(size=(2, L, H)).astype(np.float32)
    expect = np.einsum("ml,blh->bmh", W, x)
    got = np.asarray(dense_interpolation(jnp.asarray(x), M))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_sand_stream_is_repeated_classification_vector():
    """SAnD_layer emits hn = the dense-interpolated classification vector
    repeated over the sequence (SAnD_model.py:78-84)."""
    from snsde.models.attn import SAnDLayer

    s = SAnDLayer.create(jax.random.PRNGKey(0), 3, 10, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 3))
    _, hn = s(x)
    np.testing.assert_allclose(np.asarray(hn - hn[:, :1]), 0.0, atol=1e-6)


def test_miam_time_descriptor_pe_matches_reference_loop():
    """MIAM's positional encoding from actual observation times equals the
    reference's numpy table construction (MIAM_models.py:183-199)."""
    from snsde.models.attn import miam_time_descriptor_pe

    B, L, d_model, max_len = 2, 5, 6, 5
    t = np.random.default_rng(0).random((B, L)).astype(np.float32)

    def cal_angle(position, hid_idx):
        return position / np.power(max_len, 2 * (hid_idx // 2) / d_model)

    table = np.array(
        [[cal_angle(t[b], j) for j in range(d_model)] for b in range(B)]
    )                                            # [B, d, L]
    table[:, 0::2, :] = np.sin(table[:, 0::2, :])
    table[:, 1::2, :] = np.cos(table[:, 1::2, :])
    expect = table.transpose(0, 2, 1)            # [B, L, d]
    got = np.asarray(miam_time_descriptor_pe(jnp.asarray(t), d_model,
                                             max_len))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_miam_masked_observations_are_fully_blocked():
    """MIAM's attention distillation erases masked-timestep observations
    completely: after the distillation loop the query stream comes from the
    missingness branch and every data path to a masked key position is
    attention-masked, so perturbing the observation at a masked timestep
    changes NO output anywhere — while perturbing an unmasked timestep
    does (MIAM_models.py:84-122 structure)."""
    from snsde.models.attn import MIAMLayer

    key = jax.random.PRNGKey(4)
    rng = np.random.default_rng(0)
    B, L, D, H = 2, 6, 3, 8
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    mask = np.ones((B, L, D), np.float32)
    delta = rng.random((B, L, D)).astype(np.float32) + 0.1
    p = 3
    delta[:, p, 0] = 0.0                          # position p: masked key
    ts = np.broadcast_to(np.linspace(0, 1, L), (B, L)).astype(np.float32)

    m = MIAMLayer.create(key, D, H, L)

    def run(xa):
        out, _ = m(jnp.asarray(xa), jnp.asarray(mask), jnp.asarray(delta),
                   jnp.asarray(ts))
        return np.asarray(out)

    out1 = run(x)
    x_masked_pert = x.copy()
    x_masked_pert[:, p] += 5.0
    np.testing.assert_allclose(run(x_masked_pert), out1, atol=1e-5)
    x_open_pert = x.copy()
    x_open_pert[:, p - 1] += 5.0                  # unmasked position
    assert np.abs(run(x_open_pert) - out1).max() > 1e-3


def test_miam_decoder_tied_to_obs_embedding_at_init():
    from snsde.models.attn import MIAMPipeline

    p = MIAMPipeline.create(jax.random.PRNGKey(0), 4, 8, 10)
    np.testing.assert_array_equal(np.asarray(p.decoder.weight),
                                  np.asarray(p.obs_embed.weight.T))


def test_mtan_attention_weights_normalized():
    """mTAN: multi-time attention weights are a softmax over observed
    positions — rows sum to 1."""
    from snsde.models.mtan import MultiTimeAttention

    key = jax.random.PRNGKey(5)
    att = MultiTimeAttention.create(key, 2 * 3, 8, embed_time=16,
                                    num_heads=1)
    B, Lq, Lk = 2, 4, 6
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, Lq, 16))
    k = jax.random.normal(jax.random.fold_in(key, 2), (B, Lk, 16))
    v = jax.random.normal(jax.random.fold_in(key, 3), (B, Lk, 6))
    w = att.attention_weights(q, k)
    np.testing.assert_allclose(np.asarray(w.sum(axis=-1)), 1.0, rtol=1e-5)
    # per-channel masked weights mirror __call__ exactly: missing
    # (position, channel) pairs get zero weight, rows renormalize
    mask = (jax.random.uniform(jax.random.fold_in(key, 4),
                               (B, Lk, 6)) > 0.4).astype(np.float32)
    wm = att.attention_weights(q, k, mask=mask)
    assert wm.shape == (B, 1, Lq, Lk, 6)
    np.testing.assert_allclose(np.asarray(wm.sum(axis=-2)), 1.0,
                               rtol=1e-5)
    dead = np.asarray(wm)[:, 0] * (1 - np.asarray(mask))[:, None]
    assert float(dead.max()) < 1e-6


# ---------------------------------------------------------------------------
# full-registry sweep: every name executes once
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_every_registry_name_executes():
    """All 226 names build and run forward with finite outputs (tiny
    shapes; compile-dominated). Complements the per-name representative
    tests in test_registry.py."""
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    # D=4 -> coeff_dim 5 (odd): the observation-GRU family (gru-dt/gru-d/
    # ode-rnn) requires the odd [t ‖ K intensity ‖ K values] layout
    # (reference other.py:18-20 asserts the same).
    B, L, D = 2, 6, 4
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    mask = (rng.random((B, L, D)) < 0.7).astype(np.float32)
    delta = rng.random((B, L, D)).astype(np.float32)
    seq = jnp.asarray(np.stack([x, mask, delta], 1))
    times = np.linspace(0, 1, L).astype(np.float32)
    tchan = np.broadcast_to(times[None, :, None], (B, L, 1))
    coeffs = hermite_cubic_coeffs(
        jnp.asarray(times), jnp.asarray(np.concatenate([tchan, x], -1))
    )
    failures = []
    for name in MODEL_NAMES:
        try:
            layer = make_seq_layer(key, name, D, L, 4, 4)
            res = layer(seq, coeffs, key=jax.random.fold_in(key, zlib.crc32(name.encode()) % 2**31))
            out = res[0]
            assert out.shape[0] == B, name
            assert bool(jnp.isfinite(out).all()), name
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures[:20])
