"""Flagship quality-regression pins (VERDICT r4 item 6).

Round 4's speech flagship silently regressed 0.801 -> 0.56 via a
mid-training divergence nothing asserted on. These checks codify
"trajectory health" so every flagship run fails loudly instead:

  * every logged loss is finite
  * no epoch-to-epoch train-loss spike above `max_spike`x
    (the round-4 divergence was 1.44 -> 2.94 -> 9.4, a 2x+ spike chain)
  * the selected (best-val) metric clears a pinned floor

`check_history` consumes a `fit_classifier`-style history (list of dicts
with train/val metric sub-dicts); flagship tools call `assert_pins` after
training and record the verdict in their JSON artifact.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

__all__ = ["PinSpec", "check_history", "assert_pins", "FLAGSHIP_PINS"]


@dataclass
class PinSpec:
    """Trajectory-health thresholds for one flagship."""
    metric: str = "accuracy"        # key inside history[i]["val"]
    mode: str = "max"               # "max": higher is better (accuracy/
                                    # auroc); "min": lower is better (mse)
    floor: float = 0.0              # max-mode: min acceptable best metric
    ceiling: float = math.inf       # min-mode: max acceptable best metric
    max_spike: float = 3.0          # max allowed epoch/epoch train-loss ratio
    # sustained-climb guard: max cumulative train-loss ratio over any
    # `climb_window`-epoch window. The round-4 speech divergence climbs
    # ~1.7x/epoch for 5 epochs (never tripping a 3x single-epoch check);
    # measured: diverged run max 3-epoch climb 4.55x, healthy runs 1.46x
    # (/tmp/r5/s0_base vs s0_ds1 diagnostics) — 2.0x splits them cleanly.
    max_climb: float = 2.0
    climb_window: int = 3
    warmup: int = 3                 # epochs exempt from the spike check


# Floors sit safely below healthy runs but far above a diverged one:
# sepsis synthetic AUROC runs ~0.98 (RESULTS_sepsis_r4.json), speech
# healthy seeds reach 0.9+ at 200 epochs / ~0.5 at 40 (r4 A/B logs),
# a diverged speech run shows 0.10-0.18.
FLAGSHIP_PINS: Dict[str, PinSpec] = {
    "sepsis": PinSpec(metric="auroc", floor=0.95),
    "speech": PinSpec(metric="accuracy", floor=0.40),
    # mse/elbo trajectories: KL annealing and plateau-LR kinks make modest
    # climbs normal; only catastrophic blow-ups should trip. Ceilings sit
    # ~2x above healthy (interp 0.0692±0.0006, mujoco 0.0240±0.0028 —
    # RESULTS_*_r5.json) but far below an untrained/diverged run.
    "interpolation": PinSpec(metric="mse", mode="min", ceiling=0.15,
                             max_spike=5.0, max_climb=5.0, warmup=10),
    "mujoco": PinSpec(metric="mse", mode="min", ceiling=0.10,
                      max_spike=5.0, max_climb=5.0),
    # healthy flagship run reaches val 0.60 (RESULTS_activity.json);
    # chance is 1/7=0.143 — 0.35 splits them with wide margin
    "activity": PinSpec(metric="accuracy", floor=0.35),
}


def check_history(history: List[Dict], spec: PinSpec) -> Dict:
    """Returns {"ok": bool, "violations": [str, ...], "best_metric": float}.

    Works on fit_classifier histories (entries carry "train"/"val" metric
    dicts) and on simpler histories with flat "val_loss"/"val_acc" keys.
    """
    violations: List[str] = []

    def _train_loss(e):
        t = e.get("train")
        if isinstance(t, dict):
            return t.get("loss")
        if isinstance(t, (int, float)):       # forecasting: train = mse
            return t
        if "elbo" in e:                       # interpolation: loss = -elbo
            return -e["elbo"]
        return e.get("train_loss", e.get("loss"))

    def _val_metric(e):
        v = e.get("val")
        if isinstance(v, dict):
            return v.get(spec.metric)
        if isinstance(v, (int, float)) and spec.metric in ("mse", "loss"):
            return v
        return e.get(f"val_{spec.metric}",
                     e.get("val_acc" if spec.metric == "accuracy"
                           else f"val_{spec.metric}"))

    losses = [_train_loss(e) for e in history]
    for i, lo in enumerate(losses):
        if lo is not None and not math.isfinite(lo):
            violations.append(f"non-finite train loss at epoch {i}: {lo}")

    # a relative climb only counts as divergence if it ALSO carries the
    # loss back above the early-training level: the round-4 blow-up ends
    # at 9.4 >> the epoch-3 loss (~2.2), while late-training transient
    # bumps (0.32 -> 1.66, recovered by the plateau LR cut — seen in 2/5
    # healthy 200-epoch speech repeats) stay below it
    finite = [lo for lo in losses[:max(1, spec.warmup) + 1]
              if lo is not None and math.isfinite(lo)]
    early_level = min(finite) if finite else math.inf

    for i in range(max(1, spec.warmup), len(losses)):
        a, b = losses[i - 1], losses[i]
        if a is None or b is None or not (math.isfinite(a)
                                          and math.isfinite(b)):
            continue
        if a > 0 and b / a > spec.max_spike and b > early_level:
            violations.append(
                f"train-loss spike at epoch {i}: {a:.4g} -> {b:.4g} "
                f"({b / a:.2f}x > {spec.max_spike}x)"
            )

    w = spec.climb_window
    for i in range(max(w, spec.warmup + w), len(losses)):
        a, b = losses[i - w], losses[i]
        if a is None or b is None or not (math.isfinite(a)
                                          and math.isfinite(b)):
            continue
        if a > 0 and b / a > spec.max_climb and b > early_level:
            violations.append(
                f"sustained train-loss climb over epochs {i - w}-{i}: "
                f"{a:.4g} -> {b:.4g} ({b / a:.2f}x > {spec.max_climb}x)"
            )

    vals = [_val_metric(e) for e in history]
    vals = [v for v in vals if v is not None and math.isfinite(v)]
    if spec.mode == "min":
        best = min(vals) if vals else float("inf")
        if best > spec.ceiling:
            violations.append(
                f"best val {spec.metric} {best:.4f} above ceiling "
                f"{spec.ceiling}"
            )
    else:
        best = max(vals) if vals else float("-inf")
        if best < spec.floor:
            violations.append(
                f"best val {spec.metric} {best:.4f} below floor "
                f"{spec.floor}"
            )
    return {"ok": not violations, "violations": violations,
            "best_metric": best}


def assert_pins(history: List[Dict], flagship: str,
                spec: Optional[PinSpec] = None) -> Dict:
    """check_history + raise AssertionError listing every violation."""
    spec = spec or FLAGSHIP_PINS[flagship]
    res = check_history(history, spec)
    assert res["ok"], (
        f"flagship '{flagship}' trajectory pins FAILED:\n  "
        + "\n  ".join(res["violations"])
    )
    return res
