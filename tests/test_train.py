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


def test_readout_grad_hook_scales_only_target_leaves():
    """readout_grad_hook reproduces the reference's 100x register_hook on
    the final readout linear (sepsis-sde.py:55-56): only that layer's
    weight+bias gradients are scaled."""
    import jax.numpy as jnp

    from snsde.nn.core import partition
    from snsde.train.loop import readout_grad_hook

    model, _ = make_sde_model(
        jax.random.PRNGKey(0), "neurallnsde", input_channels=3,
        hidden_channels=8, hidden_hidden_channels=8, num_hidden_layers=1,
        output_channels=2,
    )
    grads, _ = partition(model)  # stand-in gradient tree (same structure)
    hook = readout_grad_hook("readout.linear2", scale=100.0)
    scaled = hook(grads)
    np.testing.assert_allclose(
        np.asarray(scaled.readout.linear2.weight),
        100.0 * np.asarray(grads.readout.linear2.weight),
    )
    np.testing.assert_allclose(
        np.asarray(scaled.readout.linear2.bias),
        100.0 * np.asarray(grads.readout.linear2.bias),
    )
    # everything else untouched
    np.testing.assert_array_equal(
        np.asarray(scaled.readout.linear1.weight),
        np.asarray(grads.readout.linear1.weight),
    )
    np.testing.assert_array_equal(
        np.asarray(scaled.initial_network.weight),
        np.asarray(grads.initial_network.weight),
    )
    np.testing.assert_array_equal(
        np.asarray(scaled.func.linear_in.weight),
        np.asarray(grads.func.linear_in.weight),
    )


def _tiny_linear_setup(n, d=5, nc=2, seed=0):
    import jax.numpy as jnp

    from snsde.nn.core import Module, module
    from snsde.nn.layers import Linear

    @module
    class Lin(Module):
        lin: Linear

        def __call__(self, x):
            return self.lin(x)

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.integers(0, nc, n).astype(np.int64)
    model = Lin(lin=Linear.create(jax.random.PRNGKey(seed), d, nc))

    def apply_fn(m, batch, key, train):
        out = m(batch["x"])
        return (out[..., 0] if nc == 2 else out), m

    return model, apply_fn, {"x": X, "y": y}


def test_eval_loss_ignores_batch_padding():
    """Padded final eval batches must not contaminate the reported loss:
    the loss for a 37-sample set must be identical whether evaluated in one
    padded batch of 64 or batches of 8+5-pad (reference runs a smaller
    final batch; we mask instead)."""
    from snsde.train.loop import TrainConfig, fit_classifier

    model, apply_fn, data = _tiny_linear_setup(37)
    losses = {}
    for ebs in (8, 64):
        cfg = TrainConfig(batch_size=16, eval_batch_size=ebs, max_epochs=0,
                          num_classes=2, verbose=False)
        res = fit_classifier(model, apply_fn, lambda m: m, data, data, data,
                             cfg)
        losses[ebs] = res.val_metrics.loss
    np.testing.assert_allclose(losses[8], losses[64], rtol=1e-5)


def test_fit_trains_on_nondivisible_dataset():
    """Device-resident scanned epochs handle n % batch_size != 0 (padded,
    masked) and still learn; coupled and decoupled weight-decay modes both
    run."""
    from snsde.train.loop import TrainConfig, fit_classifier

    rng = np.random.default_rng(0)
    n, d = 100, 4
    X = rng.normal(size=(n, d)).astype(np.float32)
    w_true = rng.normal(size=(d,)).astype(np.float32)
    y = (X @ w_true > 0).astype(np.int64)
    model, apply_fn, _ = _tiny_linear_setup(n, d=d)
    data = {"x": X, "y": y}
    for coupled in (True, False):
        cfg = TrainConfig(batch_size=32, max_epochs=30, num_classes=2,
                          verbose=False, lr=1e-1, step_mode="none",
                          coupled_weight_decay=coupled)
        res = fit_classifier(model, apply_fn, lambda m: m, data, data, data,
                             cfg)
        assert res.train_metrics.accuracy > 0.9, (
            f"coupled={coupled}: {res.train_metrics.accuracy}")


def test_best_restore_is_state_consistent():
    """The restored best model must reproduce its recorded in-loop val
    metrics exactly: the snapshot keeps weights AND BatchNorm running
    stats from the same epoch (the reference deep-copies the full
    state_dict, common_sde.py:178-181). The pre-round-4 code combined
    best weights with FINAL-epoch BN stats, which skewed final metrics
    whenever the best epoch was not the last. Uses a deterministic
    BN+Linear model so eval carries no SDE sampling noise."""
    import jax.numpy as jnp

    from snsde.nn import Module, module
    from snsde.nn.layers import BatchNorm, Linear
    from snsde.train.loop import TrainConfig, fit_classifier

    @module
    class BNClassifier(Module):
        bn: BatchNorm
        linear: Linear

        def __call__(self, x, *, train=False):
            h, bn = self.bn(x, train=train)
            return self.linear(h), self.replace(bn=bn)

    rng = np.random.default_rng(0)
    n, d = 256, 8
    X = rng.normal(size=(n, d)).astype(np.float32)
    # drifting feature scale so BN stats move substantially across epochs
    y = (X[:, 0] + 0.3 * rng.normal(size=n) > 0).astype(np.int64)
    # shift + rescale so BN running stats need many EMA steps to converge
    # from their (0, 1) init — early-epoch and final stats then differ
    X *= 4.0
    X += 3.0
    data = {"x": X, "y": y}
    tr = {k: v[:160] for k, v in data.items()}
    va = {k: v[160:208] for k, v in data.items()}
    te = {k: v[208:] for k, v in data.items()}

    key = jax.random.PRNGKey(0)
    model = BNClassifier(
        bn=BatchNorm.create(d),
        linear=Linear.create(key, d, 1),
    )

    def apply_fn(m, batch, key, train):
        logits, new_m = m(batch["x"], train=train)
        return logits[:, 0], new_m

    # a divergent lr makes val accuracy peak at an EARLY epoch,
    # while BN stats keep EMA-converging afterwards — the exact
    # mismatch the old combine(best_params, final_rest) exposed
    tc = TrainConfig(lr=3.0, batch_size=64, max_epochs=8, num_classes=2,
                     step_mode="valaccuracy", seed=0)
    res = fit_classifier(model, apply_fn, lambda m: m.linear, tr, va, te,
                         tc)
    best_in_loop = max(h["val"]["accuracy"] for h in res.history)
    # deterministic eval (no dropout, BN running stats): the restored
    # model must reproduce the best epoch's val accuracy exactly
    assert res.val_metrics.accuracy == pytest.approx(best_in_loop, abs=0.0)
