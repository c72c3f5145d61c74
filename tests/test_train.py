"""End-to-end harness smoke tests on synthetic data (SURVEY.md §4 item 4)."""

import jax
import numpy as np
import pytest

from snsde.harness.classification import (
    HarnessConfig,
    make_sde_model,
    parse_model_name,
    run_sepsis,
    run_speech,
)
from snsde.train.metrics import auroc, average_precision, weighted_f1
from snsde.train.schedule import ReduceLROnPlateau


def test_parse_model_name_contract():
    # canonical bindings (reference common_sde.py:303-342, neuralsde.py:23-27)
    assert parse_model_name("staticsde") == (1, 0)
    assert parse_model_name("naivesde") == (1, 18)
    assert parse_model_name("neurallsde") == (2, 16)
    assert parse_model_name("neurallnsde") == (4, 17)
    assert parse_model_name("neuralgsde") == (6, 17)
    assert parse_model_name("neuralsde_3_18") == (3, 18)
    assert parse_model_name("neuralsde_0_00") == (0, 0)
    with pytest.raises(ValueError):
        parse_model_name("neuralsde_7_5")
    with pytest.raises(ValueError):
        parse_model_name("bogus")


def test_metrics_against_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 500)
    s = rng.normal(size=500) + y * 0.8
    np.testing.assert_allclose(auroc(y, s), sklearn.roc_auc_score(y, s),
                               atol=1e-12)
    np.testing.assert_allclose(
        average_precision(y, s), sklearn.average_precision_score(y, s),
        atol=1e-12,
    )


def test_weighted_f1_against_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(1)
    y = rng.integers(0, 4, 300)
    p = rng.integers(0, 4, 300)
    from snsde.train.metrics import confusion_matrix

    cm = confusion_matrix(y, p, 4)
    np.testing.assert_allclose(
        weighted_f1(cm),
        sklearn.f1_score(y, p, average="weighted"),
        atol=1e-12,
    )


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(lr=1.0, mode="max", patience=2, factor=0.5)
    for v in [0.5, 0.6, 0.7]:
        assert s.step(v) == 1.0
    # stall for patience+1 evaluations
    assert s.step(0.7) == 1.0
    assert s.step(0.7) == 1.0
    assert s.step(0.7) == 0.5


@pytest.mark.slow
def test_sepsis_harness_smoke():
    cfg = HarnessConfig(hidden_channels=16, hidden_hidden_channels=16,
                        num_hidden_layers=1, batch_size=64, max_epochs=2)
    res = run_sepsis(cfg, n=256)
    assert np.isfinite(res.test_metrics.loss)
    assert res.test_metrics.auroc is not None
    assert 0.0 <= res.test_metrics.accuracy <= 1.0


@pytest.mark.slow
def test_speech_harness_smoke():
    cfg = HarnessConfig(model_name="neurallsde", hidden_channels=16,
                        hidden_hidden_channels=16, num_hidden_layers=1,
                        batch_size=64, max_epochs=2)
    res = run_speech(cfg, n=256)
    assert np.isfinite(res.test_metrics.loss)


def test_all_grid_options_produce_finite_fg():
    """Every (input_option, noise_option) cell of the grid must produce
    finite f and g (grid contract, SURVEY.md §2.1)."""
    import jax.numpy as jnp

    from snsde.fields import DiffusionField
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs

    rng = np.random.default_rng(0)
    L, C, B, H = 8, 3, 4, 8
    times = jnp.linspace(0.0, 1.0, L)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    path = CubicPath(hermite_cubic_coeffs(times, x), times)
    y = jnp.asarray(rng.normal(size=(B, H)) * 0.5 + 1.0, jnp.float32)
    key = jax.random.PRNGKey(0)

    for io in range(7):
        for no in range(20):
            field = DiffusionField.create(
                jax.random.fold_in(key, io * 20 + no), C, H, H, 2,
                input_option=io, noise_option=no,
            ).bind(path)
            fv = field.f(jnp.asarray(0.3), y)
            gv = field.g(jnp.asarray(0.3), y)
            assert fv.shape == (B, H) and gv.shape == (B, H)
            assert bool(jnp.isfinite(fv).all()), (io, no)
            assert bool(jnp.isfinite(gv).all()), (io, no)
            # runtime clipping contract: |f|<=1, |g|<=1
            assert float(jnp.abs(fv).max()) <= 1.0 + 1e-6
            assert float(jnp.abs(gv).max()) <= 1.0 + 1e-6


def test_theory_checks_lsde_lnsde_gsde():
    """Tutorial theory-check cells as tests (tutorial/README.md:7-19):
    LSDE diffusion is state-independent; LNSDE diffusion is linear in y;
    GSDE drift/diffusion vanish at y=0 (positivity structure)."""
    import jax.numpy as jnp

    from snsde.fields import (
        NeuralGSDEFunc,
        NeuralLNSDEFunc,
        NeuralLSDEFunc,
    )
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs

    rng = np.random.default_rng(0)
    L, C, B, H = 8, 2, 4, 16
    times = jnp.linspace(0.0, 1.0, L)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    path = CubicPath(hermite_cubic_coeffs(times, x), times)
    key = jax.random.PRNGKey(0)
    y = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    t = jnp.asarray(0.4)

    lsde = NeuralLSDEFunc.create(key, C, H, H, 1).bind(path)
    g1 = lsde.g(t, y)
    g2 = lsde.g(t, jnp.flip(y, axis=-1))
    assert float(jnp.abs(g1 - g2).max()) < 1e-6  # state independence

    lnsde = NeuralLNSDEFunc.create(key, C, H, H, 1).bind(path)
    g_y = lnsde.g(t, y)
    g_2y = lnsde.g(t, 2.0 * y)
    np.testing.assert_allclose(np.asarray(g_2y), 2.0 * np.asarray(g_y),
                               rtol=1e-5, atol=1e-6)  # linear in y

    gsde = NeuralGSDEFunc.create(key, C, H, H, 1).bind(path)
    zero = jnp.zeros_like(y)
    assert float(jnp.abs(gsde.f(t, zero)).max()) < 1e-7
    assert float(jnp.abs(gsde.g(t, zero)).max()) < 1e-7
