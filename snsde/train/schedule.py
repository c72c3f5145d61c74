"""Host-side LR schedules mirroring the torch schedulers the reference
uses: ReduceLROnPlateau (common_sde.py:119-141), StepLR
(torch-ists/_model usage), CosineAnnealing (interpolation harness).

These run in the host training loop and feed a scalar LR into the jitted
step via optax.inject_hyperparams — the schedule logic is control-flow
heavy (patience counters, mode max/min), exactly what should stay off the
device (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

__all__ = ["ReduceLROnPlateau", "StepLR", "CosineAnnealingLR"]


@dataclass
class ReduceLROnPlateau:
    lr: float
    mode: str = "min"           # 'min' (loss) or 'max' (acc/auroc)
    factor: float = 0.1
    patience: int = 5
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = field(default=None)  # type: ignore
    num_bad: int = 0

    def __post_init__(self):
        if self.best is None:
            self.best = math.inf if self.mode == "min" else -math.inf

    def _improved(self, metric: float) -> bool:
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        if self._improved(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr


@dataclass
class StepLR:
    lr: float
    step_size: int = 10
    gamma: float = 0.5
    epoch: int = 0

    def step(self, metric: float = None) -> float:
        self.epoch += 1
        if self.epoch % self.step_size == 0:
            self.lr *= self.gamma
        return self.lr


@dataclass
class CosineAnnealingLR:
    lr: float
    t_max: int
    eta_min: float = 0.0
    epoch: int = 0
    base_lr: float = field(default=None)  # type: ignore

    def __post_init__(self):
        if self.base_lr is None:
            self.base_lr = self.lr

    def step(self, metric: float = None) -> float:
        self.epoch += 1
        self.lr = self.eta_min + 0.5 * (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.epoch / self.t_max)
        )
        return self.lr
