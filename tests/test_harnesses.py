"""Forecasting + interpolation harness smokes and the param-search /
analysis layers (CPU, tiny)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_forecasting_harness():
    from snsde.harness.forecasting import ForecastConfig, run_mujoco

    cfg = ForecastConfig(hidden_channels=8, hidden_hidden_channels=8,
                         batch_size=64, max_epochs=2, time_seq=20, y_seq=5,
                         verbose=False, missing_rate=0.3, loss="huber",
                         reg="l2")
    res = run_mujoco(cfg, n=128)
    assert np.isfinite(res["test_mse"])
    assert len(res["history"]) == 2


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


def test_resolve_sde_method_contract():
    from snsde.harness.forecasting import resolve_sde_method

    assert resolve_sde_method("rk4") == "euler"
    assert resolve_sde_method("srk") == "srk"
    with pytest.raises(ValueError):
        resolve_sde_method("dopri5")
