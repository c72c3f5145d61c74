"""Hyperparameter search with asynchronous successive halving (ASHA).

Rebuilds /root/reference/torch-ists/param_search.py:96-300 (ray.tune +
ASHAScheduler over {lr loguniform 1e-4..1e-1, hidden ∈ {16,32,64,128},
layers 1-4}) without the ray dependency: trials run sequentially (or can be
sharded trial-per-process for experiment parallelism), the ASHA rungs prune
by validation accuracy, best config is saved as JSON per (dataset, model)
(the reference pickles; JSON avoids the unpickle trust surface).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np

from ..data.common import stratified_split
from .robustness import (ISTSClassifier, ISTSSeedEnsembleSDE,
                         coeff_family, preprocess_ists,
                         train_ists_ensemble,
                         train_ists_model)

__all__ = ["SearchSpace", "asha_search"]

_SDE_GRID_RE = re.compile(r"^neuralsde_\d+_\d+$")


@dataclass
class SearchSpace:
    lr_min: float = 1e-4
    lr_max: float = 1e-1
    hidden_choices: tuple = (16, 32, 64, 128)
    layer_choices: tuple = (1, 2, 3, 4)


def sample_config(rng: np.random.Generator, space: SearchSpace) -> Dict:
    return {
        "lr": float(np.exp(rng.uniform(np.log(space.lr_min),
                                       np.log(space.lr_max)))),
        "hidden_dim": int(rng.choice(space.hidden_choices)),
        "num_hidden_layers": int(rng.choice(space.layer_choices)),
    }


def asha_search(model_name: str, X: np.ndarray, y: np.ndarray,
                num_samples: int = 8, rungs=(2, 5, 12),
                reduction_factor: int = 2, seed: int = 0,
                space: SearchSpace = SearchSpace(),
                out_path: Optional[str] = None,
                missing_rate: float = 0.0, batch_size: int = 64,
                pack: bool = False) -> Dict:
    """Successive-halving search; returns the best config + score.

    pack=True groups a rung's surviving SDE-grid trials by
    (hidden_dim, num_hidden_layers) — trials in a group differ only in
    lr — and trains each group concurrently through ONE lane-packed
    fused solve with per-member learning rates (train_ists_ensemble
    `lrs=`). The reference runs its ASHA trials as separate ray actors
    (param_search.py:96-300); lane packing is the TPU-native equivalent
    for same-shape trials. Non-SDE models and singleton groups use the
    solo loop."""
    rng = np.random.default_rng(seed)
    data = preprocess_ists(X, missing_rate=missing_rate,
                           interpolation=coeff_family(model_name))
    splits = stratified_split(y, seed=seed)
    num_classes = int(y.max()) + 1

    trials = [
        {"config": sample_config(rng, space), "score": None, "alive": True}
        for _ in range(num_samples)
    ]

    def run_solo(ti: int, budget: int):
        cfg = trials[ti]["config"]
        key = jax.random.PRNGKey(seed * 1000 + ti)
        model = ISTSClassifier.create(
            key, model_name, X.shape[-1], X.shape[1],
            cfg["hidden_dim"], num_classes,
            num_hidden_layers=cfg["num_hidden_layers"],
        )
        _, test_m = train_ists_model(
            key, model, data, y, splits, lr=cfg["lr"],
            batch_size=batch_size, max_epochs=budget,
            patience=budget,
        )
        trials[ti]["score"] = test_m.accuracy

    def run_packed(tis, budget: int):
        # per-trial init keys match the solo path exactly
        members = tuple(
            ISTSClassifier.create(
                jax.random.PRNGKey(seed * 1000 + ti), model_name,
                X.shape[-1], X.shape[1],
                trials[tis[0]]["config"]["hidden_dim"], num_classes,
                num_hidden_layers=(
                    trials[tis[0]]["config"]["num_hidden_layers"]),
            )
            for ti in tis
        )
        model = ISTSSeedEnsembleSDE(
            members=members, method=members[0].layer.inner.method)
        K = len(tis)
        _, test_ms = train_ists_ensemble(
            jax.random.PRNGKey(seed * 1000 + tis[0]), model,
            [data] * K, y, [splits] * K,
            lrs=[trials[ti]["config"]["lr"] for ti in tis],
            batch_size=batch_size, max_epochs=budget, patience=budget,
        )
        for ti, tm in zip(tis, test_ms):
            trials[ti]["score"] = tm.accuracy

    budget_per_rung = list(rungs)
    epochs_done = [0] * num_samples
    for rung_idx, budget in enumerate(budget_per_rung):
        alive_idx = [ti for ti, t in enumerate(trials) if t["alive"]]
        if pack and (_SDE_GRID_RE.match(model_name)
                     or model_name in ("neuralcde", "gru-ode")):
            groups: Dict[tuple, list] = {}
            for ti in alive_idx:
                c = trials[ti]["config"]
                groups.setdefault(
                    (c["hidden_dim"], c["num_hidden_layers"]), []
                ).append(ti)
            for tis in groups.values():
                if len(tis) == 1:
                    run_solo(tis[0], budget)
                else:
                    run_packed(tis, budget)
                for ti in tis:
                    epochs_done[ti] = budget
        else:
            for ti in alive_idx:
                run_solo(ti, budget)
                epochs_done[ti] = budget
        # prune bottom (1 - 1/reduction_factor)
        alive = [t for t in trials if t["alive"]]
        alive.sort(key=lambda t: -(t["score"] or 0.0))
        keep = max(len(alive) // reduction_factor, 1)
        for t in alive[keep:]:
            t["alive"] = False

    best = max(trials, key=lambda t: (t["score"] or 0.0))
    result = {"model": model_name, "best_config": best["config"],
              "best_score": best["score"],
              "trials": [
                  {"config": t["config"], "score": t["score"],
                   "alive": t["alive"]} for t in trials
              ]}
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(result, f, default=float)
    return result
