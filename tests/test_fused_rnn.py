"""Fused GRU kernel parity on CPU via Pallas interpret mode.

Validates the fused GRU recurrence (snsde/kernels/fused_rnn.py) — forward
AND the hand-written backward — against lax.scan over GRUCell, in both
directions, including the valid-mask sequence padding and the hoisted
input-projection gradient chain.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.nn.core import filter_value_and_grad, partition
from snsde.nn.layers import GRUCell


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("SNSDE_FUSED_INTERPRET", "1")
    monkeypatch.setenv("SNSDE_FUSED_STREAM", "f32")


def _scan_gru(cell, xs, reverse=False):
    B = xs.shape[1]
    H = cell.hidden_size

    def step(h, x):
        h2 = cell(x, h)
        return h2, h2

    _, hs = jax.lax.scan(step, jnp.zeros((B, H), xs.dtype), xs,
                         reverse=reverse)
    return hs


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("L", [8, 7])   # 7: valid-mask padding (U=4)
def test_fused_gru_matches_scan(reverse, L):
    from snsde.kernels.fused_rnn import fused_gru_scan, supports_fused_gru

    rng = np.random.default_rng(0)
    B, C, H = 6, 4, 5
    cell = GRUCell.create(jax.random.PRNGKey(1), C, H)
    assert supports_fused_gru(cell)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)
    hs_fused = fused_gru_scan(cell, xs, reverse=reverse)
    hs_scan = _scan_gru(cell, xs, reverse=reverse)
    np.testing.assert_allclose(np.asarray(hs_fused), np.asarray(hs_scan),
                               atol=2e-6)


def test_fused_gru_gradients_match_scan():
    from snsde.kernels.fused_rnn import fused_gru_scan

    rng = np.random.default_rng(1)
    L, B, C, H = 7, 6, 4, 5
    cell = GRUCell.create(jax.random.PRNGKey(2), C, H)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)

    def loss_fused(c, x):
        return jnp.sum(fused_gru_scan(c, x)[-1] ** 2)

    def loss_scan(c, x):
        return jnp.sum(_scan_gru(c, x)[-1] ** 2)

    (_, gx1), g1 = (jax.value_and_grad(
        lambda c, x: loss_fused(c, x), argnums=1)(cell, xs),
        filter_value_and_grad(lambda c: loss_fused(c, xs))(cell)[1])
    (_, gx2), g2 = (jax.value_and_grad(
        lambda c, x: loss_scan(c, x), argnums=1)(cell, xs),
        filter_value_and_grad(lambda c: loss_scan(c, xs))(cell)[1])
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-4, atol=2e-6)
    compared = 0
    for a, b in zip(jax.tree_util.tree_leaves(partition(g1)[0]),
                    jax.tree_util.tree_leaves(partition(g2)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
        compared += 1
    assert compared >= 4    # w_ih, w_hh, b_ih, b_hh


def test_bigru_dispatch_parity(monkeypatch):
    """models/mtan._bigru through the fused dispatch (interpret mode,
    backend monkeypatched) == the scan path."""
    from snsde.models.mtan import _bigru

    rng = np.random.default_rng(2)
    L, B, C, H = 9, 4, 3, 5
    cf = GRUCell.create(jax.random.PRNGKey(3), C, H)
    cb = GRUCell.create(jax.random.PRNGKey(4), C, H)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)
    ref = _bigru(cf, cb, xs)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        out = _bigru(cf, cb, xs)
    finally:
        monkeypatch.undo()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_seqrnn_dispatch_parity(monkeypatch):
    """SeqRNN gru stream through the fused dispatch == scan."""
    from snsde.models.rnn import SeqRNN

    rng = np.random.default_rng(3)
    B, L, D, H = 4, 9, 3, 6
    model = SeqRNN.create(jax.random.PRNGKey(5), D, H, 2, kind="gru",
                          bidirectional=True)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    ref, _ = model(x)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        out, _ = model(x)
    finally:
        monkeypatch.undo()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("name", ["grudt", "grud", "odernn"])
def test_observation_gru_dispatch_parity(name, monkeypatch):
    """GRU-dt / GRU-D through the fused path (closed-form dt_acc, decay
    rows, masked updates) == the reference scan recurrence — outputs AND
    gradients, on sparse observation patterns."""
    from snsde.models.rnn import GRUD, GRUdt
    from snsde.ops.interp import hermite_cubic_coeffs

    rng = np.random.default_rng(5)
    B, L, K = 5, 11, 3
    C = 2 * K + 1                       # (t, intensity*K, values*K)
    times = np.sort(rng.uniform(0, 1, L)).astype(np.float32)
    # sparse binary observation pattern via cumulative intensity
    obs = (rng.random((B, L, K)) < 0.4).astype(np.float32)
    cum = np.cumsum(obs, axis=1)
    vals = rng.normal(size=(B, L, K)).astype(np.float32)
    X = np.concatenate(
        [np.broadcast_to(times[None, :, None], (B, L, 1)), cum, vals],
        axis=-1,
    )
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    from snsde.models.rnn import ODERNN

    if name == "odernn":
        model = ODERNN.create(jax.random.PRNGKey(7), C, 6, 2,
                              hidden_hidden_channels=5,
                              num_hidden_layers=2, ode_steps=2)
    else:
        cls = {"grudt": GRUdt, "grud": GRUD}[name]
        model = cls.create(jax.random.PRNGKey(7), C, 6, 2)
    fin = jnp.full((B,), L - 1, jnp.int32)

    def loss(m):
        logits, outs = m(times, coeffs, fin)
        return jnp.sum(logits ** 2) + jnp.sum(outs[:, -1] ** 2)

    l_scan, g_scan = filter_value_and_grad(loss)(model)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        l_fused, g_fused = filter_value_and_grad(loss)(model)
    finally:
        monkeypatch.undo()
    np.testing.assert_allclose(float(l_fused), float(l_scan), rtol=1e-5)
    compared = 0
    for a, b in zip(jax.tree_util.tree_leaves(partition(g_fused)[0]),
                    jax.tree_util.tree_leaves(partition(g_scan)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)
        compared += 1
    assert compared >= 5


def _scan_lstm(cell, xs, reverse=False):
    B = xs.shape[1]
    H = cell.hidden_size
    init = (jnp.zeros((B, H), xs.dtype), jnp.zeros((B, H), xs.dtype))

    def step(carry, x):
        h, carry = cell(x, carry)
        return carry, h

    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("L", [8, 7])
def test_fused_lstm_matches_scan(reverse, L):
    from snsde.kernels.fused_rnn import fused_lstm_scan, supports_fused_lstm
    from snsde.nn.layers import LSTMCell

    rng = np.random.default_rng(4)
    B, C, H = 6, 4, 5
    cell = LSTMCell.create(jax.random.PRNGKey(6), C, H)
    assert supports_fused_lstm(cell)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)
    hs_fused = fused_lstm_scan(cell, xs, reverse=reverse)
    hs_scan = _scan_lstm(cell, xs, reverse=reverse)
    np.testing.assert_allclose(np.asarray(hs_fused), np.asarray(hs_scan),
                               atol=2e-6)


def test_fused_lstm_gradients_match_scan():
    from snsde.kernels.fused_rnn import fused_lstm_scan
    from snsde.nn.layers import LSTMCell

    rng = np.random.default_rng(6)
    L, B, C, H = 7, 6, 4, 5
    cell = LSTMCell.create(jax.random.PRNGKey(8), C, H)
    xs = jnp.asarray(rng.normal(size=(L, B, C)), jnp.float32)

    def loss_fused(c):
        return jnp.sum(fused_lstm_scan(c, xs) ** 2)

    def loss_scan(c):
        return jnp.sum(_scan_lstm(c, xs) ** 2)

    _, g1 = filter_value_and_grad(loss_fused)(cell)
    _, g2 = filter_value_and_grad(loss_scan)(cell)
    compared = 0
    for a, b in zip(jax.tree_util.tree_leaves(partition(g1)[0]),
                    jax.tree_util.tree_leaves(partition(g2)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
        compared += 1
    assert compared >= 4


def test_seqrnn_lstm_dispatch_parity(monkeypatch):
    from snsde.models.rnn import SeqRNN

    rng = np.random.default_rng(7)
    B, L, D, H = 4, 9, 3, 6
    model = SeqRNN.create(jax.random.PRNGKey(9), D, H, 2, kind="lstm",
                          bidirectional=True)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    ref, _ = model(x)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        out, _ = model(x)
    finally:
        monkeypatch.undo()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_grud_full_dispatch_parity(monkeypatch):
    """GRUD-full (trainable input decay toward means + per-sample hidden
    decay) through the fused path == the scan recurrence, outputs and
    gradients incl. gamma_x/gamma_h/x_mean through the precomputes."""
    from snsde.models.time_rnn import GRUDFull

    rng = np.random.default_rng(9)
    B, L, D, H = 5, 11, 3, 6
    model = GRUDFull.create(jax.random.PRNGKey(11), D, H,
                            x_mean=rng.normal(size=(D,)).astype(np.float32))
    m = (rng.random((B, L, D)) < 0.5).astype(np.float32)
    x = rng.normal(size=(B, L, D)).astype(np.float32) * m
    # per-channel elapsed time since last observation
    delta = rng.uniform(0.1, 1.0, (B, L, D)).astype(np.float32)
    x, m, delta = jnp.asarray(x), jnp.asarray(m), jnp.asarray(delta)

    def loss(mod):
        return jnp.sum(mod(x, m, delta)[:, -1] ** 2)

    l_scan, g_scan = filter_value_and_grad(loss)(model)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        l_fused, g_fused = filter_value_and_grad(loss)(model)
    finally:
        monkeypatch.undo()
    np.testing.assert_allclose(float(l_fused), float(l_scan), rtol=1e-5)
    compared = 0
    for a, b in zip(jax.tree_util.tree_leaves(partition(g_fused)[0]),
                    jax.tree_util.tree_leaves(partition(g_scan)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)
        compared += 1
    assert compared >= 7   # w_ih/w_hh/b_ih/b_hh + gamma_x/gamma_h weights


@pytest.mark.parametrize("kind", ["plstm", "tglstm", "tlstm"])
def test_time_lstm_dispatch_parity(kind, monkeypatch):
    """PLSTM (phased sel stream) / TGLSTM (gate-modifier stream) through
    the fused LSTM kernel == the scan cells, outputs AND gradients incl.
    the time parameters through the stream precomputes."""
    from snsde.models.time_rnn import PLSTM, TGLSTM, TLSTM

    rng = np.random.default_rng(12)
    B, L, D, H = 5, 11, 3, 6
    cls = {"plstm": PLSTM, "tglstm": TGLSTM, "tlstm": TLSTM}[kind]
    model = cls.create(jax.random.PRNGKey(13), D, H, num_layers=2)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.uniform(0.1, 1.0, (B, L)), axis=1),
                     jnp.float32)

    def loss(m):
        out, _ = m(x, ts)
        return jnp.sum(out[:, -1] ** 2)

    l_scan, g_scan = filter_value_and_grad(loss)(model)
    # force BOTH dispatch gates open (opt-in SNSDE_FUSED_TIME_RNN + the
    # H>=128 perf gate) and assert the kernel really ran — without this
    # the "fused" arm silently takes the scan path and the test compares
    # scan vs scan
    import snsde.kernels.fused_rnn as fr
    calls = []
    real_fused = fr.fused_lstm_scan

    def spy(*a, **k):
        calls.append(1)
        return real_fused(*a, **k)

    monkeypatch.setenv("SNSDE_FUSED_TIME_RNN", "1")
    monkeypatch.setenv("SNSDE_FUSED_RNN_MIN_H", "0")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fr, "fused_lstm_scan", spy)
    try:
        l_fused, g_fused = filter_value_and_grad(loss)(model)
    finally:
        monkeypatch.undo()
    assert len(calls) == 2   # one fused dispatch per stacked layer
    np.testing.assert_allclose(float(l_fused), float(l_scan), rtol=1e-5)
    compared = 0
    for a, b in zip(jax.tree_util.tree_leaves(partition(g_fused)[0]),
                    jax.tree_util.tree_leaves(partition(g_scan)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)
        compared += 1
    assert compared >= 6


def test_odelstm_dispatch_parity(monkeypatch):
    """ODE-LSTM (euler, per-sample dt, in-kernel MLP evolve of h after
    the cell) through the fused path == scan, outputs AND gradients
    incl. the f1/f2 field weights."""
    from snsde.models.time_rnn import ODELSTM

    rng = np.random.default_rng(14)
    B, L, D, H = 5, 11, 3, 6
    model = ODELSTM.create(jax.random.PRNGKey(15), D, H, solver="euler",
                           ode_steps=2)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    ts = jnp.asarray(rng.uniform(0.1, 1.0, (B, L)), jnp.float32)

    def loss(m):
        return jnp.sum(m(x, ts)[:, -1] ** 2)

    l_scan, g_scan = filter_value_and_grad(loss)(model)
    # force the H>=128 perf gate open and assert the kernel really ran
    # (H=6 would otherwise fall back to scan in both arms)
    import snsde.kernels.fused_rnn as fr
    calls = []
    real_fused = fr.fused_lstm_scan

    def spy(*a, **k):
        calls.append(1)
        return real_fused(*a, **k)

    monkeypatch.setenv("SNSDE_FUSED_RNN_MIN_H", "0")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fr, "fused_lstm_scan", spy)
    try:
        l_fused, g_fused = filter_value_and_grad(loss)(model)
    finally:
        monkeypatch.undo()
    assert len(calls) == 1
    np.testing.assert_allclose(float(l_fused), float(l_scan), rtol=1e-5)
    compared = 0
    for a, b in zip(jax.tree_util.tree_leaves(partition(g_fused)[0]),
                    jax.tree_util.tree_leaves(partition(g_scan)[0])):
        if a is None or b is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)
        compared += 1
    assert compared >= 6   # lstm weights + f1/f2


@pytest.mark.parametrize("H", [128, 5])
def test_fused_gru_edge_shapes(H):
    """Exact-tile hidden width (no padding) and L=1 sequences."""
    from snsde.kernels.fused_rnn import fused_gru_scan

    rng = np.random.default_rng(20)
    cell = GRUCell.create(jax.random.PRNGKey(21), 3, H)
    for L in (1, 4):
        xs = jnp.asarray(rng.normal(size=(L, 4, 3)), jnp.float32)
        hs_fused = fused_gru_scan(cell, xs)
        hs_scan = _scan_gru(cell, xs)
        np.testing.assert_allclose(np.asarray(hs_fused),
                                   np.asarray(hs_scan), atol=3e-6)
