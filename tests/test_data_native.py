"""Data loaders, native C++ path, logsig, configs, analysis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_psv_parse_roundtrip():
    from snsde.data.sepsis import parse_psv

    text = b"HR|O2Sat|ICULOS|SepsisLabel\n80|97|1|0\n|96|2|1\nNaN|95|3|1\n"
    values, header = parse_psv(text)
    assert header == ["HR", "O2Sat", "ICULOS", "SepsisLabel"]
    assert values.shape == (3, 4)
    assert np.isnan(values[1, 0]) and np.isnan(values[2, 0])
    np.testing.assert_allclose(values[:, 1], [97, 96, 95])


def test_sepsis_record_processing():
    from snsde.data.sepsis import _process_record, TS_COLUMNS

    header = [f"v{i}" for i in range(TS_COLUMNS)] + [
        "Age", "Gender", "Unit1", "Unit2", "HospAdmTime", "ICULOS",
        "SepsisLabel",
    ]
    rows = np.full((3, len(header)), np.nan, np.float32)
    rows[:, TS_COLUMNS + 5] = [1, 2, 5]       # ICULOS
    rows[:, 0] = [80, 81, 82]
    rows[:, TS_COLUMNS] = 65                   # Age
    rows[:, -1] = [0, 0, 1]
    series, static, label = _process_record(rows, header)
    assert series.shape == (72, TS_COLUMNS)
    assert label == 1
    assert series[0, 0] == 80 and series[4, 0] == 82
    assert np.isnan(series[2, 0])              # unobserved hour
    assert static[0] == 65


def test_mfcc_shapes_and_tone():
    from snsde.data.speech_commands import mfcc

    t = np.arange(16000) / 16000
    clip = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    m = mfcc(clip)
    assert m.shape == (161, 20)
    assert np.isfinite(m).all()
    # a pure tone has higher energy than silence
    silent = mfcc(np.zeros(16000, np.float32))
    assert m[:, 0].mean() > silent[:, 0].mean()


def test_ts_parser():
    from snsde.data.uea import equal_length, parse_ts_file
    import tempfile, os

    content = (
        "@problemName toy\n@timeStamps false\n@data\n"
        "1,2,3,4:5,6,7,8:walk\n1,2:3,4:run\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".ts", delete=False) as f:
        f.write(content)
        path = f.name
    cases, labels = parse_ts_file(path)
    os.unlink(path)
    assert labels == ["walk", "run"]
    X = equal_length(cases)
    assert X.shape == (2, 4, 2)
    # resampled short series keeps endpoints
    np.testing.assert_allclose(X[1, 0, 0], 1.0)
    np.testing.assert_allclose(X[1, -1, 0], 2.0)


def test_native_matches_jax_when_available():
    from snsde.data.native import (
        get_lib,
        hermite_coeffs_native,
        natural_cubic_coeffs_native,
    )
    from snsde.ops.interp import hermite_cubic_coeffs, natural_cubic_coeffs

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    B, L, C = 4, 10, 2
    times = np.linspace(0, 1, L).astype(np.float32)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[rng.random((B, L, C)) < 0.25] = np.nan
    hn = hermite_coeffs_native(times, x)
    hj = np.asarray(hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(x)))
    np.testing.assert_allclose(hn, hj, atol=1e-4, rtol=1e-4)
    nn_ = natural_cubic_coeffs_native(times, x)
    nj = np.asarray(
        natural_cubic_coeffs(jnp.asarray(times), jnp.asarray(x), pack=True)
    )
    # function-level agreement (coefficients of near-singular intervals
    # differ at float32 precision)
    from snsde.ops.interp import CubicPath

    pc, pj = CubicPath(jnp.asarray(nn_), times), CubicPath(
        jnp.asarray(nj), times
    )
    ts = jnp.linspace(0.0, 1.0, 33)
    vc = jax.vmap(pc.evaluate)(ts)
    vj = jax.vmap(pj.evaluate)(ts)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(vj), atol=1e-3)


def test_native_delta_matches_python():
    from snsde.data.native import compute_delta_native, get_lib
    from snsde.harness.robustness import preprocess_ists

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    X = rng.normal(size=(3, 8, 2)).astype(np.float32)
    X[rng.random(X.shape) < 0.4] = np.nan
    d = preprocess_ists(X, missing_rate=0.0)
    mask = d["seq"][:, 1]
    times = np.linspace(0, 1, 8, dtype=np.float32)
    dn = compute_delta_native(times, mask)
    np.testing.assert_allclose(dn, d["seq"][:, 2], atol=1e-6)


def test_config_roundtrip():
    from snsde.configs import ExperimentConfig, from_args, from_json, to_json

    cfg = from_args(
        ["--task", "mujoco", "--forecasting.lr", "0.01",
         "--forecasting.loss", "huber"]
    )
    assert cfg.task == "mujoco"
    assert cfg.forecasting.lr == 0.01
    assert cfg.forecasting.loss == "huber"
    cfg2 = from_json(to_json(cfg))
    assert cfg2.forecasting.lr == 0.01


def test_logsig_vs_bruteforce_levy_area():
    """Depth-2 logsig of a 2-D path: Lévy area matches the direct
    trapezoid computation of 0.5*∮(x dy - y dx)."""
    from snsde.ops.logsig import logsig_windows

    rng = np.random.default_rng(1)
    L = 5
    path = rng.normal(size=(1, L, 2)).astype(np.float32)
    _, feats = logsig_windows(jnp.asarray(path), depth=2,
                              window_length=L - 1)
    levy = float(feats[0, 1, 2])
    x, y = path[0, :, 0], path[0, :, 1]
    dx, dy = np.diff(x), np.diff(y)
    xm = (x[:-1] + x[1:]) / 2 - x[0]
    ym = (y[:-1] + y[1:]) / 2 - y[0]
    area = 0.5 * np.sum(xm * dy - ym * dx)
    np.testing.assert_allclose(levy, area, atol=1e-5)


def test_cd_analysis_detects_dominant_model():
    from snsde.analysis import cd_analysis

    rng = np.random.default_rng(0)
    scores = rng.normal(0.7, 0.02, (12, 3))
    scores[:, 2] += 0.2   # clearly better model
    res = cd_analysis(scores, ["a", "b", "c"])
    assert res.avg_ranks[2] == res.avg_ranks.min()
    assert res.friedman_p < 0.05
