"""Control-family dispatch through the neuralcde name variants
(VERDICT r4 item 7; reference torch-ists/_layer.py:201-213 +
model_run.py:127-130 intent — upstream the -c/-h variants are
import-broken, so the INTENDED semantics are implemented here).

neuralcde -> natural spline coeffs, -c -> cubic (torchcde natural cubic,
the same spline family), -h -> hermite, -l -> linear knots,
-r -> rectilinear knots. On NaN-gapped data the families produce
measurably different paths, hence different model outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.harness.robustness import (ISTSClassifier, coeff_family,
                                      preprocess_ists)


def _nan_gapped_data(seed=0, B=8, L=12, D=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(B, L, D)).astype(np.float32)
    # hand-placed gaps (interior, so families genuinely disagree)
    X[:, 3:6, 0] = np.nan
    X[:, 7, 1] = np.nan
    X[::2, 2:9, 2] = np.nan
    return X


def test_coeff_family_mapping():
    assert coeff_family("neuralcde") == "natural"
    assert coeff_family("neuralcde-c") == "natural"
    assert coeff_family("neuralcde-h") == "hermite"
    # reference model_run.py:127-130 natural list
    for name in ("gru-dt", "gru-d", "gru-ode", "ode-rnn", "ancde", "exit"):
        assert coeff_family(name) == "natural"
    for name in ("gru", "lstm", "mtan", "neuralsde_4_17"):
        assert coeff_family(name) == "hermite"


def test_registry_control_attrs():
    from snsde.registry import make_seq_layer

    key = jax.random.PRNGKey(0)
    controls = {}
    for suffix, expect in (("", "natural"), ("-c", "cubic"),
                           ("-h", "hermite")):
        layer = make_seq_layer(key, "neuralcde" + suffix, 3, 12, 8)
        controls[suffix] = layer.inner.control
        assert layer.inner.control == expect, (suffix, layer.inner.control)


def _forward(name, X, key):
    data = preprocess_ists(X, interpolation=coeff_family(name))
    model = ISTSClassifier.create(key, name, X.shape[-1], X.shape[1],
                                  8, 2)
    logits, _, _ = model(jnp.asarray(data["seq"]),
                         jnp.asarray(data["coeffs"]),
                         key=jax.random.PRNGKey(1), train=False)
    return np.asarray(logits)


def test_families_distinct_on_nan_gaps():
    X = _nan_gapped_data()
    key = jax.random.PRNGKey(3)
    out = {name: _forward(name, X, key)
           for name in ("neuralcde", "neuralcde-c", "neuralcde-h",
                        "neuralcde-l", "neuralcde-r")}
    for a, b in (("neuralcde", "neuralcde-h"),
                 ("neuralcde-h", "neuralcde-l"),
                 ("neuralcde-l", "neuralcde-r"),
                 ("neuralcde", "neuralcde-l")):
        diff = float(np.abs(out[a] - out[b]).max())
        assert diff > 1e-4, f"{a} vs {b} identical (diff {diff})"
    # natural and torchcde-cubic are the SAME spline family: identical
    # coefficients, identical outputs (documented equivalence)
    np.testing.assert_allclose(out["neuralcde"], out["neuralcde-c"],
                               atol=1e-6)


def test_sweep_uses_family_coeffs():
    """run_robustness_sweep builds natural coeffs for neuralcde and
    hermite for the rest (the reference model_run.py regime)."""
    X = _nan_gapped_data(B=12)
    nat = preprocess_ists(X, interpolation="natural")
    herm = preprocess_ists(X, interpolation="hermite")
    assert float(np.abs(nat["coeffs"] - herm["coeffs"]).max()) > 1e-4
