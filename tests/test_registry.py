"""Registry coverage: every implemented name builds and produces a finite
stream with the normalized (out, hn) interface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snsde.ops.interp import hermite_cubic_coeffs
from snsde.registry import MODEL_NAMES, make_seq_layer

@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, L, D = 4, 8, 4
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    mask = (rng.random((B, L, D)) < 0.7).astype(np.float32)
    delta = rng.random((B, L, D)).astype(np.float32)
    seq = jnp.asarray(np.stack([x, mask, delta], 1))
    times = np.linspace(0, 1, L).astype(np.float32)
    tchan = np.broadcast_to(times[None, :, None], (B, L, 1))
    coeffs = hermite_cubic_coeffs(
        jnp.asarray(times), jnp.asarray(np.concatenate([tchan, x], -1))
    )
    return key, seq, coeffs, (B, L, D)


def test_name_list_cardinality():
    """37 base + 48 flow + 140 grid names + 1 (gru-simple counted in base)
    — matches the reference registry size (_layer.py:21-46)."""
    assert len(MODEL_NAMES) == len(set(MODEL_NAMES))
    grid = [n for n in MODEL_NAMES if n.startswith("neuralsde_")]
    flows = [
        n for n in MODEL_NAMES
        if n.split("_")[0] in ("neuralflow", "neuralflowcde",
                               "neuralmixture", "neuralcontrolledflow")
    ]
    assert len(grid) == 140
    assert len(flows) == 48


REPRESENTATIVES = [
    "cnn", "cnn-7", "rnn", "lstm", "gru", "gru-simple", "grud", "bilstm",
    "tlstm", "plstm", "tglstm", "transformer", "mtan",
    "gru-dt", "gru-d", "gru-ode", "ode-rnn", "ode-lstm",
    "neuralcde", "neuralcde-l", "neuralcde-r", "neuralcde-h",
    "sand", "miam", "ancde", "exit", "leap",
    "neuralrde-1", "neuralrde-2", "neuralrde-3",
    "latentsde", "neuralsde-x", "neuralsde-z",
    "neuralflow_z_c", "neuralflow_y_r", "neuralflow_x_g", "neuralflow_z_n",
    "neuralflowcde_z_c", "neuralmixture_z_r", "neuralcontrolledflow_y_g",
    "neuralsde_0_00", "neuralsde_2_16", "neuralsde_4_17", "neuralsde_6_17",
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_registry_model_runs(data, name):
    key, seq, coeffs, (B, L, D) = data
    layer = make_seq_layer(key, name, D, L, 8, 8)
    res = layer(seq, coeffs, key=key)
    out = res[0]
    assert out.shape[0] == B and out.shape[1] == L
    assert bool(jnp.isfinite(out).all()), name
    if name.startswith("latentsde"):
        assert len(res) == 3 and np.isfinite(float(res[2]))


def test_sde_grid_default_solver_is_srk(data):
    """The torch-ists stream solves with srk unless told otherwise
    (reference diff_module/NSDE/nsde_model.py:67 default_method='srk');
    an explicit method= overrides."""
    key, seq, coeffs, (B, L, D) = data
    layer = make_seq_layer(key, "neuralsde_4_17", D, L, 8, 8)
    assert layer.inner.method == "srk"
    layer = make_seq_layer(key, "neuralsde_4_17", D, L, 8, 8,
                           method="euler")
    assert layer.inner.method == "euler"


def test_unknown_name_raises(data):
    key, seq, coeffs, (B, L, D) = data
    with pytest.raises(NotImplementedError):
        make_seq_layer(key, "not_a_model", D, L, 8)


def test_ists_classifier_end_to_end(data):
    from snsde.harness.robustness import (
        ISTSClassifier,
        preprocess_ists,
        train_ists_model,
    )
    from snsde.data.common import stratified_split

    rng = np.random.default_rng(1)
    B, L, D = 64, 8, 3
    X = rng.normal(size=(B, L, D)).astype(np.float32)
    y = rng.integers(0, 2, B)
    d = preprocess_ists(X, missing_rate=0.3)
    assert d["seq"].shape == (B, 3, L, D)
    # masked entries are zero-filled; delta accumulates over gaps
    assert np.isfinite(d["seq"]).all()
    assert np.isfinite(d["coeffs"]).all()

    key = jax.random.PRNGKey(0)
    model = ISTSClassifier.create(key, "gru", D, L, 8, 2)
    splits = stratified_split(y, seed=0)
    model, metrics = train_ists_model(key, model, d, y, splits,
                                      max_epochs=2, batch_size=32)
    assert np.isfinite(metrics.loss)
