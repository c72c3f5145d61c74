"""Lane-packed seed-ensemble training (VERDICT r2 item 3).

The reference's dominant workloads repeat the same config over seeds
(sepsis-sde.py:70-83 runs the full grid 5 times; model_run.py trains 5
seeds per cell). fit_classifier_ensemble trains K replicas through one
packed solve with per-member policy; these tests pin the member-
independence contract and the harness wiring (CPU: packed_solve falls
back to per-member scan solves with identical key handling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_ensemble(K=2, hidden=8, static_dim=5, channels=7):
    from snsde.fields import DiffusionField
    from snsde.models.ensemble import InitialValueSeedEnsemble

    def make_field(k):
        return DiffusionField.create(k, channels, hidden, hidden, 1,
                                     input_option=4, noise_option=17)

    return InitialValueSeedEnsemble.create(
        jax.random.PRNGKey(0), make_field, static_dim, hidden, 1, K,
    )


def test_member_gradients_are_independent():
    """Summed member losses over disjoint params: member 0's gradients
    must not change when member 1's params are perturbed."""
    from snsde.nn.core import filter_value_and_grad
    from snsde.ops.interp import hermite_cubic_coeffs

    K, B, L, C = 2, 6, 9, 7
    model = _tiny_ensemble(K=K, channels=C)
    times = np.linspace(0, 1, L).astype(np.float32)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    coeffs = hermite_cubic_coeffs(jnp.asarray(times), vals)
    static = jnp.asarray(rng.normal(size=(B, 5)).astype(np.float32))
    fidx = jnp.full((B,), L - 1, jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))

    def loss(m):
        logits, _ = m(times, coeffs, static, fidx,
                      key=jax.random.PRNGKey(3), train=True)
        per = jnp.mean(
            jnp.maximum(logits[..., 0], 0) - logits[..., 0] * y[None]
            + jnp.log1p(jnp.exp(-jnp.abs(logits[..., 0]))), axis=1)
        return jnp.sum(per)

    vg = filter_value_and_grad(loss)
    _, g_base = vg(model)

    # perturb member 1's field weights
    m1 = model.members[1]
    f1 = m1.field
    f1p = f1.replace(linear_out=f1.linear_out.replace(
        weight=f1.linear_out.weight + 0.37))
    model_p = model.replace(members=(
        model.members[0], m1.replace(field=f1p)))
    _, g_pert = vg(model_p)

    for a, b in zip(
        jax.tree_util.tree_leaves(g_base.members[0]),
        jax.tree_util.tree_leaves(g_pert.members[0]),
    ):
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
    # and member 1's gradients DID change
    changed = any(
        a is not None and not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(g_base.members[1]),
            jax.tree_util.tree_leaves(g_pert.members[1]),
        )
    )
    assert changed


@pytest.mark.slow
def test_run_sepsis_ensemble_smoke():
    """End-to-end packed-repeats sepsis run: per-member results, members
    genuinely differ (independent inits + noise), metrics finite."""
    from snsde.harness.classification import (HarnessConfig,
                                              run_sepsis_ensemble)

    cfg = HarnessConfig(model_name="neurallnsde", hidden_channels=8,
                        hidden_hidden_channels=8, num_hidden_layers=1,
                        batch_size=32, use_intensity=False)
    results = run_sepsis_ensemble(cfg, repeats=2, n=96, max_epochs=3)
    assert len(results) == 2
    accs = []
    for res in results:
        assert np.isfinite(res.test_metrics.loss)
        assert 0.0 <= res.test_metrics.accuracy <= 1.0
        assert len(res.history) == 3
        accs.append(res.val_metrics.loss)
    # members restored from their own best snapshots: the two replicas'
    # final params must differ (fresh inits)
    m = results[0].model
    w0 = np.asarray(m.members[0].field.linear_out.weight)
    w1 = np.asarray(m.members[1].field.linear_out.weight)
    assert not np.allclose(w0, w1)


@pytest.mark.slow
def test_ensemble_history_tracks_per_member_lr():
    """Per-member ReduceLROnPlateau: histories are per member and carry
    member-specific learning rates."""
    from snsde.harness.classification import (HarnessConfig,
                                              run_sepsis_ensemble)

    cfg = HarnessConfig(model_name="neurallsde", hidden_channels=8,
                        hidden_hidden_channels=8, num_hidden_layers=1,
                        batch_size=32, use_intensity=False)
    results = run_sepsis_ensemble(cfg, repeats=2, n=64, max_epochs=2)
    for res in results:
        for h in res.history:
            assert "lr" in h and h["lr"] > 0


@pytest.mark.slow
def test_packed_robustness_sweep_cell(tmp_path):
    """pack_seeds=True trains an SDE cell's seeds concurrently (per-member
    missingness + splits, per-member control paths); records appear per
    seed with the packed marker and finite metrics."""
    from snsde.data.synthetic import synthetic_uea
    from snsde.harness.robustness import SweepConfig, run_robustness_sweep

    cfg = SweepConfig(models=("neuralsde_4_17",), missing_rates=(0.3,),
                      seeds=(0, 1), hidden_dim=8, batch_size=32,
                      max_epochs=2, out_dir=str(tmp_path), save_preds=True)
    res = run_robustness_sweep(cfg, n=96, verbose=False, pack_seeds=True)
    assert len(res) == 2
    for r in res:
        assert "error" not in r, r
        assert r["packed"] == 2
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["method"] == "srk"        # reference nsde_model.py:67
    for seed in (0, 1):                    # per-member prediction dumps
        import numpy as np
        d = np.load(tmp_path / "synthetic_uea" / "30"
                    / f"neuralsde_4_17_{seed}.npz")
        assert (d["y_pred"] == d["logits"].argmax(-1)).all()
    # resume: a second call reads the records back, trains nothing
    res2 = run_robustness_sweep(cfg, n=96, verbose=False, pack_seeds=True)
    assert len(res2) == 2


@pytest.mark.slow
def test_sweep_prediction_dump(tmp_path):
    """save_preds writes the reference's per-run (y_true, y_pred, logits)
    triple (model_run.py:262-274 pickles it; .npz here) whose argmax
    reproduces the recorded accuracy."""
    import numpy as np
    from snsde.harness.robustness import SweepConfig, run_robustness_sweep

    cfg = SweepConfig(models=("gru",), missing_rates=(0.0,), seeds=(0,),
                      hidden_dim=8, batch_size=32, max_epochs=2,
                      out_dir=str(tmp_path), save_preds=True)
    res = run_robustness_sweep(cfg, n=96, verbose=False)
    (rec,) = res
    d = np.load(tmp_path / "synthetic_uea" / "0" / "gru_0.npz")
    assert d["logits"].shape[0] == d["y_true"].shape[0]
    assert (d["y_pred"] == d["logits"].argmax(-1)).all()
    acc = float((d["y_pred"] == d["y_true"]).mean())
    assert abs(acc - rec["accuracy"]) < 1e-6


@pytest.mark.slow
def test_packed_sweep_members_see_their_own_data():
    """Member k of the packed cell must train on seed k's missingness and
    split: per-seed preprocessed arrays differ, and the per-member paths
    flow through train_ists_ensemble (behavioral: metrics finite, members
    end with different params)."""
    from snsde.data.synthetic import synthetic_uea
    from snsde.data.common import stratified_split
    from snsde.harness.robustness import (ISTSSeedEnsembleSDE,
                                          preprocess_ists,
                                          train_ists_ensemble)

    X, y, _ = synthetic_uea(n=80)
    datas = [preprocess_ists(X, missing_rate=0.5, seed=s) for s in (0, 1)]
    # per-seed missingness genuinely differs
    assert not np.allclose(datas[0]["seq"], datas[1]["seq"])
    splits = [stratified_split(y, seed=s) for s in (0, 1)]
    assert not np.array_equal(np.sort(splits[0][0]), np.sort(splits[1][0]))
    model = ISTSSeedEnsembleSDE.create(
        jax.random.PRNGKey(0), "neuralsde_2_16", X.shape[-1], X.shape[1],
        8, int(y.max()) + 1, 2)
    model, test_ms = train_ists_ensemble(
        jax.random.PRNGKey(0), model, datas, y, splits, batch_size=32,
        max_epochs=2)
    assert len(test_ms) == 2
    for tm in test_ms:
        assert np.isfinite(tm.loss)
    w0 = np.asarray(model.members[0].fc2.weight)
    w1 = np.asarray(model.members[1].fc2.weight)
    assert not np.allclose(w0, w1)


def test_freeze_inactive_rest_pins_bn_buffers():
    """Early-stopped members' non-param leaves (BatchNorm running stats)
    must freeze at their pre-step values while active members take the
    post-step values (code-review round-3 finding: masked param updates
    alone let inactive members' running stats keep drifting)."""
    from snsde.nn.core import partition
    from snsde.train.ensemble_loop import freeze_inactive_rest

    K = 2
    model = _tiny_ensemble(K=K)
    cls = type(model)
    # fabricate a "post-step" model with every array leaf shifted
    new_m = jax.tree_util.tree_map(
        lambda x: x + 1.0 if jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else x, model)
    active = jnp.asarray([0.0, 1.0])          # member 0 terminated
    rest = freeze_inactive_rest(cls, K, active, model, new_m)

    _, rest_old = partition(model)
    _, rest_new = partition(new_m)
    frozen = cls.member_subtree(rest, 0)
    stepped = cls.member_subtree(rest, 1)
    old0 = cls.member_subtree(rest_old, 0)
    new1 = cls.member_subtree(rest_new, 1)
    n_checked = 0
    for a, b in zip(jax.tree_util.tree_leaves(frozen),
                    jax.tree_util.tree_leaves(old0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        n_checked += 1
    for a, b in zip(jax.tree_util.tree_leaves(stepped),
                    jax.tree_util.tree_leaves(new1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert n_checked > 0    # the members DO carry non-param buffers


def test_packed_robustness_sweep_ncde_cell(tmp_path):
    """pack_seeds=True now also packs `neuralcde` cells (deterministic
    CDE members through packed_cde_solve, rk4 reference default)."""
    from snsde.harness.robustness import SweepConfig, run_robustness_sweep

    cfg = SweepConfig(models=("neuralcde",), missing_rates=(0.3,),
                      seeds=(0, 1), hidden_dim=8, batch_size=32,
                      max_epochs=2, out_dir=str(tmp_path))
    res = run_robustness_sweep(cfg, n=96, verbose=False, pack_seeds=True)
    assert len(res) == 2
    for r in res:
        assert "error" not in r, r
        assert r["packed"] == 2
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["method"] == "rk4"        # NCDE reference default


def test_packed_cde_solve_matches_per_member():
    """packed_cde_solve (CPU fallback: per-member cdeint) == stacking
    individual cdeint solves; with SNSDE_FUSED_INTERPRET the fused packed
    path is pinned by tests/test_fused_cde.py."""
    import numpy as np

    from snsde.models.ensemble import packed_cde_solve
    from snsde.models.neuralcde import FinalTanh
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import cdeint

    rng = np.random.default_rng(0)
    B, L, C, H = 6, 5, 3, 4
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    paths = []
    for i in range(2):
        x = rng.normal(size=(B, L, C)).astype(np.float32)
        coeffs = hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x))
        paths.append(CubicPath(coeffs, times))
    funcs = [FinalTanh.create(jax.random.PRNGKey(i), C, H, 6, 1)
             for i in range(2)]
    z0s = jnp.asarray(rng.normal(size=(2, B, H)), jnp.float32)
    zs = packed_cde_solve(funcs, paths[0], times, z0s, method="rk4",
                          dt=0.2, paths=paths)
    for i in range(2):
        ref = cdeint(paths[i], funcs[i], z0s[i], times, dt=0.2,
                     method="rk4")
        np.testing.assert_allclose(np.asarray(zs[i]), np.asarray(ref),
                                   atol=1e-6)


def test_speech_ensemble_member_hook_scales_final_linear_only():
    """run_speech_ensemble's member hook must reproduce the reference's
    100x register_hook on the LAST linear of the readout (weight+bias)
    and leave everything else untouched
    (speech_commands-sde.py:33-34)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snsde.fields import DiffusionField
    from snsde.models.ensemble import SeedEnsemble

    def make_field(k):
        return DiffusionField.create(k, 4, 8, 8, 1, input_option=4,
                                     noise_option=17)

    ens = SeedEnsemble.create(jax.random.PRNGKey(0), make_field, 4, 8,
                              10, 2)
    member = SeedEnsemble.member_subtree(ens, 0)

    # the hook defined inside run_speech_ensemble (classification.py)
    def member_hook(g):
        head = g.readouts[0]
        head = head.replace(linear2=jax.tree_util.tree_map(
            lambda x: x * 100.0, head.linear2))
        return g.replace(readouts=(head,))

    hooked = member_hook(member)
    np.testing.assert_allclose(
        np.asarray(hooked.readouts[0].linear2.weight),
        100.0 * np.asarray(member.readouts[0].linear2.weight))
    np.testing.assert_allclose(
        np.asarray(hooked.readouts[0].linear2.bias),
        100.0 * np.asarray(member.readouts[0].linear2.bias))
    # the rest of the head and the field are untouched
    np.testing.assert_array_equal(
        np.asarray(hooked.readouts[0].linear1.weight),
        np.asarray(member.readouts[0].linear1.weight))
    for a, b in zip(jax.tree_util.tree_leaves(hooked.fields[0]),
                    jax.tree_util.tree_leaves(member.fields[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
