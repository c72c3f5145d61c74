"""Quality-regression pin checks (snsde/train/pins.py)."""

import numpy as np
import pytest

from snsde.train.pins import FLAGSHIP_PINS, PinSpec, assert_pins, check_history


def _hist(losses, accs):
    return [{"epoch": i,
             "train": {"loss": lo, "accuracy": a},
             "val": {"loss": lo, "accuracy": a}}
            for i, (lo, a) in enumerate(zip(losses, accs))]


def test_pins_fail_on_r4_speech_divergence():
    """The exact round-4 divergence shape (d_speech.log epochs 26-32:
    1.44 -> 2.94 -> 4.9 -> 6.6 -> 8.3 -> 9.4, acc -> 0.10) must fail."""
    losses = [2.3, 2.0, 1.8, 1.7, 1.6, 1.5, 1.44,
              2.94, 4.90, 6.55, 8.27, 9.40]
    accs = [0.1, 0.2, 0.3, 0.35, 0.4, 0.45, 0.50,
            0.35, 0.12, 0.11, 0.10, 0.10]
    res = check_history(_hist(losses, accs), FLAGSHIP_PINS["speech"])
    assert not res["ok"]
    assert any("climb" in v for v in res["violations"])
    with pytest.raises(AssertionError, match="climb"):
        assert_pins(_hist(losses, accs), "speech")


def test_pins_pass_on_healthy_run():
    losses = list(np.linspace(2.3, 0.4, 20))
    accs = list(np.linspace(0.1, 0.92, 20))
    res = check_history(_hist(losses, accs), FLAGSHIP_PINS["speech"])
    assert res["ok"], res["violations"]
    assert res["best_metric"] > 0.9


def test_pins_catch_nonfinite_and_floor():
    losses = [2.0, 1.5, float("nan"), 1.2]
    accs = [0.1, 0.2, 0.25, 0.3]
    res = check_history(_hist(losses, accs), FLAGSHIP_PINS["speech"])
    assert not res["ok"]
    assert any("non-finite" in v for v in res["violations"])
    assert any("floor" in v for v in res["violations"])


def test_pins_warmup_exempts_early_noise():
    # big relative moves in the first epochs are normal
    losses = [10.0, 35.0, 3.0, 2.0, 1.5, 1.2]
    accs = [0.1, 0.1, 0.3, 0.5, 0.6, 0.7]
    spec = PinSpec(metric="accuracy", floor=0.4, warmup=3)
    assert check_history(_hist(losses, accs), spec)["ok"]


def test_pins_flat_history_keys():
    hist = [{"epoch": i, "train_loss": 2.0 - 0.1 * i,
             "val_accuracy": 0.1 + 0.05 * i} for i in range(10)]
    spec = PinSpec(metric="accuracy", floor=0.3)
    res = check_history(hist, spec)
    assert res["ok"], res["violations"]


def test_pins_allow_recovered_transient_bump():
    """2/5 healthy 200-epoch speech repeats show a late transient bump
    (loss 0.32 -> 1.66 over 3 epochs, recovered by the plateau LR cut,
    final acc 0.98) — a climb that stays BELOW the early-training loss
    level is not a divergence."""
    losses = [5.0, 3.0, 2.4, 2.2, 1.5, 1.0, 0.7, 0.5, 0.32,
              0.9, 1.66, 0.8, 0.4, 0.3, 0.25]
    accs = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.85,
            0.7, 0.6, 0.8, 0.9, 0.95, 0.97]
    res = check_history(_hist(losses, accs), FLAGSHIP_PINS["speech"])
    assert res["ok"], res["violations"]


def test_pins_min_mode_ceiling():
    """mse flagships (mode='min'): best = min of vals, and the quality
    bound is a ceiling — an untrained/diverged run whose best mse never
    gets below it must fail, a healthy one must pass and record the
    MINIMUM (not epoch-0) as best_metric."""
    hist = [{"epoch": i, "train": 0.5 - 0.04 * i, "val": 0.5 - 0.04 * i}
            for i in range(10)]
    spec = PinSpec(metric="mse", mode="min", ceiling=0.2)
    res = check_history(hist, spec)
    assert res["ok"], res["violations"]
    assert res["best_metric"] == pytest.approx(0.5 - 0.04 * 9)

    flat = [{"epoch": i, "train": 0.5, "val": 0.5} for i in range(10)]
    res = check_history(flat, spec)
    assert not res["ok"]
    assert any("ceiling" in v for v in res["violations"])


def test_pins_mujoco_interpolation_ceilings_live():
    """The shipped mse flagships carry real ceilings: the healthy r5
    trajectories pass, an untrained-level one fails."""
    for name, healthy, bad in (("mujoco", 0.024, 0.5),
                               ("interpolation", 0.069, 0.9)):
        spec = FLAGSHIP_PINS[name]
        good = [{"epoch": i, "train": healthy * (3 - 0.02 * i),
                 "val": healthy * (3 - 0.02 * i)} for i in range(101)]
        res = check_history(good, spec)
        assert res["ok"], (name, res["violations"])
        stuck = [{"epoch": i, "train": bad, "val": bad} for i in range(20)]
        res = check_history(stuck, spec)
        assert not res["ok"], name
