"""Mesh-sharded sweep cells (harness/sweep_sharded.py) on the 8-device
virtual CPU mesh: exact parity with the sequential sweep trainer, early
stopping, any-family coverage, and the chunked JSON-record runner.

Reference analogue: torch-ists/model_run.py run once per seed/GPU
process; here the cells ride one shard_map program with zero
collectives."""

import os

import jax
import numpy as np

from snsde.data.common import stratified_split
from snsde.data.synthetic import synthetic_uea
from snsde.harness.robustness import (ISTSClassifier, SweepConfig,
                                      preprocess_ists, train_ists_model)
from snsde.harness.sweep_sharded import (extract_cell,
                                         run_robustness_sweep_sharded,
                                         train_ists_cells_sharded)


def _sequential(model_name, X, y, rate, seed, **kw):
    data = preprocess_ists(X, missing_rate=rate, seed=seed)
    key = jax.random.PRNGKey(seed)
    model = ISTSClassifier.create(key, model_name, X.shape[-1], X.shape[1],
                                  kw.pop("hidden_dim"), int(y.max()) + 1)
    _, tm = train_ists_model(key, model, data, y,
                             stratified_split(y, seed=seed), **kw)
    return tm


def test_sharded_matches_sequential_exactly():
    """Each sharded cell reproduces its sequential run: same init key,
    same shuffles, same key chain -> same test metrics."""
    X, y, _ = synthetic_uea(n=64, length=16, channels=2)
    cells = [(0.0, 0), (0.5, 1), (0.3, 2)]
    _, test_ms, _ = train_ists_cells_sharded(
        "gru", X, y, cells, hidden_dim=8, batch_size=16, max_epochs=3,
        patience=10)
    assert len(test_ms) == 3
    for (rate, seed), tm in zip(cells, test_ms):
        tm_seq = _sequential("gru", X, y, rate, seed, hidden_dim=8,
                             batch_size=16, max_epochs=3, patience=10)
        assert np.isclose(tm.accuracy, tm_seq.accuracy, atol=1e-6), \
            (rate, seed, tm.accuracy, tm_seq.accuracy)
        assert np.isclose(tm.loss, tm_seq.loss, rtol=1e-4), \
            (rate, seed, tm.loss, tm_seq.loss)


def test_sharded_early_stop_parity():
    """Patience-1 stopping: frozen cells and snapshot keys reproduce the
    sequential early-stopped runs."""
    X, y, _ = synthetic_uea(n=64, length=16, channels=2)
    cells = [(0.0, 0), (0.7, 1)]
    _, test_ms, _ = train_ists_cells_sharded(
        "gru", X, y, cells, hidden_dim=8, batch_size=16, max_epochs=6,
        patience=1)
    for (rate, seed), tm in zip(cells, test_ms):
        tm_seq = _sequential("gru", X, y, rate, seed, hidden_dim=8,
                             batch_size=16, max_epochs=6, patience=1)
        assert np.isclose(tm.accuracy, tm_seq.accuracy, atol=1e-6)
        assert np.isclose(tm.loss, tm_seq.loss, rtol=1e-4)


def test_sharded_sde_family():
    """SDE-grid cells run through the sharded path (scan solvers on CPU;
    the per-device program is the single-model program, so the fused
    kernel dispatches unchanged on TPU)."""
    X, y, _ = synthetic_uea(n=48, length=12, channels=2)
    cells = [(0.0, 0), (0.3, 1)]
    m_stk, test_ms, _ = train_ists_cells_sharded(
        "neuralsde_4_17", X, y, cells, hidden_dim=8, batch_size=16,
        max_epochs=2, patience=10)
    assert len(test_ms) == 2
    for tm in test_ms:
        assert np.isfinite(tm.accuracy) and np.isfinite(tm.loss)
    m0 = extract_cell(m_stk, 0)
    assert isinstance(m0, ISTSClassifier)


def test_sharded_runner_records_and_resume(tmp_path):
    """Chunked runner: JSON records with cells_sharded, skip-if-exists
    resume reloads without retraining."""
    cfg = SweepConfig(models=("gru",), missing_rates=(0.0, 0.3),
                      seeds=(0, 1), hidden_dim=8, batch_size=16,
                      max_epochs=2, out_dir=str(tmp_path))
    res = run_robustness_sweep_sharded(cfg, n=48, verbose=False)
    assert len(res) == 4
    for r in res:
        assert "error" not in r, r
        assert r["cells_sharded"] == 4
        assert 0.0 <= r["accuracy"] <= 1.0
    before = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(tmp_path) for f in fs
    }
    res2 = run_robustness_sweep_sharded(cfg, n=48, verbose=False)
    assert len(res2) == 4
    after = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(tmp_path) for f in fs
    }
    assert before == after  # resumed, not retrained
