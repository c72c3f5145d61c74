"""Typed configuration tree (replaces the reference's heterogeneous flag
systems — argparse in forecasting/interpolation, hard-coded grids in
classification, ray pickles in torch-ists; SURVEY.md §5 config item).

One dataclass per harness plus `ExperimentConfig` composing them; all
round-trip to/from JSON and argv (`from_args`), so every entry point shares
a single config surface. The `neuralsde_{i}_{j}` model-name DSL remains the
public alias layer (fields.MODEL_NAME_GRID / harness.parse_model_name).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional

from .harness.classification import HarnessConfig
from .harness.forecasting import ForecastConfig
from .harness.interpolation import InterpolationConfig
from .harness.robustness import SweepConfig

__all__ = ["ExperimentConfig", "to_json", "from_json", "from_args",
           "HarnessConfig", "ForecastConfig", "InterpolationConfig",
           "SweepConfig"]


@dataclass
class ExperimentConfig:
    task: str = "sepsis"          # sepsis|speech|mujoco|interpolation|sweep
    seed: int = 0
    n_samples: int = 4096
    results_dir: Optional[str] = None
    classification: HarnessConfig = field(default_factory=HarnessConfig)
    forecasting: ForecastConfig = field(default_factory=ForecastConfig)
    interpolation: InterpolationConfig = field(
        default_factory=InterpolationConfig
    )
    sweep: SweepConfig = field(default_factory=SweepConfig)


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=list)


def _merge(dc, data: dict):
    kwargs = {}
    for f in dataclasses.fields(dc):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(getattr(dc, f.name, None)):
            v = _merge(getattr(dc, f.name), v)
        elif isinstance(getattr(dc, f.name, None), tuple) and isinstance(
            v, list
        ):
            v = tuple(v)
        kwargs[f.name] = v
    return dataclasses.replace(dc, **kwargs)


def from_json(text: str) -> ExperimentConfig:
    return _merge(ExperimentConfig(), json.loads(text))


def from_args(argv) -> ExperimentConfig:
    """Dotted-key CLI overrides: --task sepsis
    --classification.model_name neuralgsde --forecasting.lr 3e-4 ..."""
    cfg = ExperimentConfig()
    data: dict = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"unexpected argument {arg!r}")
        key = arg[2:]
        value = argv[i + 1]
        i += 2
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        try:
            node[parts[-1]] = json.loads(value)
        except json.JSONDecodeError:
            node[parts[-1]] = value
    return _merge(cfg, data)


def run(cfg: ExperimentConfig):
    """Dispatch an experiment from config (the L5 runner surface)."""
    if cfg.task == "sepsis":
        from .harness.classification import run_sepsis

        c = dataclasses.replace(cfg.classification, seed=cfg.seed,
                                results_dir=cfg.results_dir)
        return run_sepsis(c, n=cfg.n_samples)
    if cfg.task == "speech":
        from .harness.classification import run_speech

        c = dataclasses.replace(cfg.classification, seed=cfg.seed,
                                results_dir=cfg.results_dir)
        return run_speech(c, n=cfg.n_samples)
    if cfg.task == "mujoco":
        from .harness.forecasting import run_mujoco

        c = dataclasses.replace(cfg.forecasting, seed=cfg.seed)
        return run_mujoco(c, n=cfg.n_samples)
    if cfg.task == "interpolation":
        from .harness.interpolation import run_interpolation

        c = dataclasses.replace(cfg.interpolation, seed=cfg.seed)
        return run_interpolation(c, n=cfg.n_samples)
    if cfg.task == "sweep":
        from .harness.robustness import run_robustness_sweep

        return run_robustness_sweep(cfg.sweep, n=cfg.n_samples)
    raise ValueError(f"unknown task {cfg.task!r}")


def main(argv=None):
    import sys

    cfg = from_args(argv if argv is not None else sys.argv[1:])
    return run(cfg)


if __name__ == "__main__":
    main()
