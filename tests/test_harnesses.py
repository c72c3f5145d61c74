"""Forecasting + interpolation harness smokes and the param-search /
analysis layers (CPU, tiny)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_forecasting_harness():
    from snsde.data.synthetic import synthetic_mujoco
    from snsde.harness.forecasting import ForecastConfig, run_mujoco

    cfg = ForecastConfig(hidden_channels=8, hidden_hidden_channels=8,
                         batch_size=64, max_epochs=2, time_seq=20, y_seq=5,
                         verbose=False, missing_rate=0.3, loss="huber",
                         reg="l2", lr=1e-3)
    res = run_mujoco(cfg, n=128, data_fn=synthetic_mujoco)
    assert np.isfinite(res["test_mse"])
    assert len(res["history"]) == 2


def test_real_mujoco_windows_match_reference_semantics():
    """Real-data pipeline (VERDICT round-1 item 4): stride-1 windows over
    the bundled mujoco.npy, whole-timestep seed-56789 missingness, exact
    counts per the reference's _process_data (mujoco.py:40-53)."""
    from snsde.data.mujoco import default_npy_path, get_data

    path = default_npy_path()
    if path is None:
        pytest.skip("bundled reference mujoco.npy not available")
    X_in, y_out, times = get_data(npy_path=path, missing_rate=0.3)
    # 100 trajectories x (100 - 50 - 10) = 40 stride-1 windows
    assert X_in.shape == (4000, 50, 14)
    assert y_out.shape == (4000, 10, 14)
    assert times.shape == (50,)
    # each window: exactly int(50*0.3)=15 whole timestep rows NaN'd
    nan_rows = np.isnan(X_in).all(axis=-1)        # [N, 50]
    partial = np.isnan(X_in).any(axis=-1) & ~nan_rows
    assert not partial.any()                      # whole rows only
    assert (nan_rows.sum(axis=1) == 15).all()
    # targets untouched
    assert np.isfinite(y_out).all()
    # torch-generator exactness: sequential draw reproduces torch.randperm
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(56789)
    expect0 = torch.randperm(50, generator=g)[:15].sort().values.numpy()
    np.testing.assert_array_equal(np.where(nan_rows[0])[0], expect0)
    expect1 = torch.randperm(50, generator=g)[:15].sort().values.numpy()
    np.testing.assert_array_equal(np.where(nan_rows[1])[0], expect1)


@pytest.mark.slow
def test_interpolation_harness():
    from snsde.harness.interpolation import (
        InterpolationConfig,
        run_interpolation,
    )

    cfg = InterpolationConfig(latent_dim=4, rec_hidden=8, gen_hidden=8,
                              num_ref_points=16, k_iwae=2, niters=3,
                              batch_size=32, verbose=False)
    res = run_interpolation(cfg, n=64)
    assert np.isfinite(res["test_mse"])


@pytest.mark.slow
def test_interpolation_rnn3_decoder():
    from snsde.harness.interpolation import (
        InterpolationConfig,
        run_interpolation,
    )

    cfg = InterpolationConfig(dec="rnn3", latent_dim=4, rec_hidden=8,
                              gen_hidden=8, num_ref_points=16, k_iwae=2,
                              niters=2, batch_size=32, verbose=False)
    res = run_interpolation(cfg, n=64)
    assert np.isfinite(res["test_mse"])


@pytest.mark.slow
def test_asha_search():
    from snsde.data.synthetic import synthetic_uea
    from snsde.harness.param_search import asha_search

    X, y, _ = synthetic_uea(n=64, length=8, channels=2)
    out = asha_search("gru", X, y, num_samples=3, rungs=(1, 2), seed=0)
    assert out["best_config"] is not None
    assert 0.0 <= out["best_score"] <= 1.0
    # pruning happened
    assert sum(t["alive"] for t in out["trials"]) < 3


@pytest.mark.slow
def test_asha_search_packed():
    """pack=True groups same-shape SDE trials per rung and trains them
    through the packed ensemble with per-member lrs; scores must be
    populated for every trial and pruning must still happen."""
    from snsde.data.synthetic import synthetic_uea
    from snsde.harness.param_search import SearchSpace, asha_search

    X, y, _ = synthetic_uea(n=64, length=8, channels=2)
    # single shape choice -> every rung is one packed group
    space = SearchSpace(hidden_choices=(8,), layer_choices=(1,))
    out = asha_search("neuralsde_4_17", X, y, num_samples=3,
                      rungs=(1, 2), seed=0, space=space, pack=True)
    assert out["best_config"] is not None
    assert all(t["score"] is not None for t in out["trials"])
    assert 0.0 <= out["best_score"] <= 1.0
    assert sum(t["alive"] for t in out["trials"]) < 3
    lrs = {round(t["config"]["lr"], 8) for t in out["trials"]}
    assert len(lrs) == 3  # distinct per-member lrs went through one pack


def test_asha_search_packed_ncde():
    """pack=True now also packs neuralcde trials (deterministic CDE
    members through packed_cde_solve with per-member lrs)."""
    from snsde.data.synthetic import synthetic_uea
    from snsde.harness.param_search import SearchSpace, asha_search

    X, y, _ = synthetic_uea(n=64, length=8, channels=2)
    space = SearchSpace(hidden_choices=(8,), layer_choices=(1,))
    out = asha_search("neuralcde", X, y, num_samples=3,
                      rungs=(1, 2), seed=0, space=space, pack=True)
    assert out["best_config"] is not None
    assert all(t["score"] is not None for t in out["trials"])
    assert 0.0 <= out["best_score"] <= 1.0


def test_resolve_sde_method_contract():
    from snsde.harness.forecasting import resolve_sde_method

    assert resolve_sde_method("rk4") == "euler"
    assert resolve_sde_method("srk") == "srk"
    with pytest.raises(ValueError):
        resolve_sde_method("dopri5")


@pytest.mark.slow
def test_interpolation_resume_reproduces_uninterrupted(tmp_path):
    """A resumed run must reproduce the uninterrupted run it continues:
    per-iteration RNG is a pure function of (seed, itr) and the cosine LR
    schedule is re-advanced on resume (ADVICE round-1 item 4)."""
    from snsde.harness.interpolation import (
        InterpolationConfig,
        run_interpolation,
    )

    base = dict(latent_dim=4, rec_hidden=8, gen_hidden=8,
                num_ref_points=16, k_iwae=2, batch_size=32, verbose=False)
    # checkpoint every 20 iters -> use niters that crosses one checkpoint
    full = run_interpolation(
        InterpolationConfig(niters=22, save_dir=None, **base), n=64)
    _ = run_interpolation(
        InterpolationConfig(niters=20, save_dir=str(tmp_path), **base), n=64)
    resumed = run_interpolation(
        InterpolationConfig(niters=22, save_dir=str(tmp_path), resume=True,
                            **base), n=64)
    full_tail = [h["elbo"] for h in full["history"][-2:]]
    res_tail = [h["elbo"] for h in resumed["history"][-2:]]
    np.testing.assert_allclose(res_tail, full_tail, rtol=1e-4)
    np.testing.assert_allclose(resumed["test_mse"], full["test_mse"],
                               rtol=1e-4)
