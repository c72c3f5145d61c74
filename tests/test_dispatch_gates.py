"""Measured perf-gate policy for the fused-kernel dispatch sites.

Round-4 v5e gate sweep (BENCH_GATE.json / BENCH_CDE_X3.json): the fused
CDE kernel loses to scan above C=12, the GRU-ODE and latent kernels lose
at every measured shape, and the fused GRU/LSTM recurrences only win at
MXU-tile hidden widths. These tests pin the dispatch policy (pure
host-side logic — no TPU needed)."""

import jax
import pytest

from snsde.models.neuralcde import FinalTanh, GRUODEField, _fused_cde_pays
from snsde.models.rnn import _fused_rnn_enabled


@pytest.fixture
def fake_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def _field(C, H):
    return FinalTanh.create(jax.random.PRNGKey(0), C, H, H, 1)


def test_cde_gate_c_threshold(monkeypatch):
    # round-5 fidelity-matched, regime-aware defaults (BENCH_GATE_R5):
    # bf16x3 wins through C=16; exact-f32 never beats scan-HIGHEST
    monkeypatch.delenv("SNSDE_FUSED_CDE_MAX_C", raising=False)
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "bf16x3")
    assert _fused_cde_pays(_field(6, 32))
    assert _fused_cde_pays(_field(16, 32))
    assert not _fused_cde_pays(_field(20, 32))
    assert not _fused_cde_pays(_field(35, 32))
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "f32")
    assert not _fused_cde_pays(_field(6, 32))
    assert not _fused_cde_pays(_field(12, 32))
    monkeypatch.setenv("SNSDE_FUSED_CDE_MAX_C", "12")
    assert _fused_cde_pays(_field(12, 32))
    monkeypatch.setenv("SNSDE_FUSED_CDE_MAX_C", "0")
    assert _fused_cde_pays(_field(35, 32))


def test_gruode_gate_opt_in(monkeypatch):
    fld = GRUODEField.create(jax.random.PRNGKey(0), 6, 32)
    monkeypatch.delenv("SNSDE_FUSED_GRUODE", raising=False)
    assert not _fused_cde_pays(fld)
    monkeypatch.setenv("SNSDE_FUSED_GRUODE", "1")
    assert _fused_cde_pays(fld)


def test_rnn_gate_h_threshold(monkeypatch, fake_tpu):
    monkeypatch.delenv("SNSDE_FUSED_RNN_MIN_H", raising=False)
    monkeypatch.delenv("SNSDE_NO_FUSED", raising=False)
    assert _fused_rnn_enabled(128)
    # H=64 measured LOSING (BENCH_GATE2.json: 0.76x GRU / 0.67x LSTM)
    assert not _fused_rnn_enabled(64)
    assert not _fused_rnn_enabled(32)
    assert _fused_rnn_enabled(None)          # no-width callers unchanged
    monkeypatch.setenv("SNSDE_FUSED_RNN_MIN_H", "0")
    assert _fused_rnn_enabled(32)
    monkeypatch.setenv("SNSDE_NO_FUSED", "1")
    assert not _fused_rnn_enabled(128)


def test_rnn_gate_off_tpu():
    # on the CPU test backend the fused RNN path never dispatches
    assert not _fused_rnn_enabled(128)


def test_packed_cde_gate_c_threshold(monkeypatch):
    from snsde.kernels.multi import packed_cde_pays

    monkeypatch.delenv("SNSDE_FUSED_CDE_PACKED_MAX_C", raising=False)
    # regime-aware default (round-5 fidelity-matched crossover): 12 for
    # exact-f32 kernels (1.21x at C=12, 0.67x at C=16), 20 for bf16x3
    # (BENCH_PACKED_CDE_R5.json x3 arm: 1.23x at C=20, loses by C=28)
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "f32")
    assert packed_cde_pays(5)
    assert packed_cde_pays(12)
    assert not packed_cde_pays(16)
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "bf16x3")
    assert packed_cde_pays(16)
    assert packed_cde_pays(20)       # r5 x3 arm: 1.23x at C=20
    assert not packed_cde_pays(28)
    assert not packed_cde_pays(35)
    monkeypatch.setenv("SNSDE_FUSED_CDE_PACKED_MAX_C", "0")
    assert packed_cde_pays(35)
    monkeypatch.setenv("SNSDE_FUSED_CDE_PACKED_MAX_C", "14")
    monkeypatch.setenv("SNSDE_FUSED_MATMUL", "f32")
    assert packed_cde_pays(14) and not packed_cde_pays(15)
