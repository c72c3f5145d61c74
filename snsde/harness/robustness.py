"""Robustness-to-missingness sweep over the unified registry.

Rebuilds /root/reference/torch-ists/{torch_ists/_model.py, model_run.py,
set_splits.py}:
  * `ISTSClassifier`: seq layer -> last step -> BatchNorm-MLP head
    (_model.py:9-40), nan_to_num on logits + grad-clip 10 (_model.py:80-82),
    StepLR(10, 0.5), patience-10 early stop (model_run.py:220-228)
  * fixed stratified splits per seed (set_splits.py:64-119)
  * per-(dataset, missing_rate ∈ {0,.3,.5,.7}, model, seed) training with
    skip-if-exists resume, JSON result records (model_run.py:92-306 uses
    pickle; JSON here so resume never unpickles untrusted bytes)
  * (x, mask, delta) preprocessing with seeded missingness
    (_utils.py:115-185; missingness generator seed 56789)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.common import inject_missingness, stratified_split
from ..data.synthetic import synthetic_uea
from ..nn.core import Module, combine, filter_value_and_grad, module, partition
from ..nn.layers import BatchNorm, Linear
from ..ops.interp import hermite_cubic_coeffs, natural_cubic_coeffs
from ..registry import SeqLayer, make_seq_layer
from ..train.loop import (iterate_batches, readout_grad_hook,
                          softmax_cross_entropy)
from ..train.metrics import classification_metrics
from ..train.schedule import StepLR as StepLRSched

__all__ = ["ISTSClassifier", "preprocess_ists", "run_robustness_sweep",
           "make_fixed_splits", "train_ists_model"]


def preprocess_ists(X: np.ndarray, missing_rate: float = 0.0,
                    interpolation: str = "hermite", seed: int = 56789):
    """X [B, L, D] -> dict with seq [B,3,L,D] (x, mask, delta) and packed
    spline coeffs over (t ‖ x). Mirrors torch_ists.preprocess
    (_utils.py:115-185): seeded missingness, observation mask, per-channel
    elapsed-time delta, NaN->0 values."""
    B, L, D = X.shape
    Xm = inject_missingness(X, missing_rate, seed=seed)
    mask = np.isfinite(Xm).astype(np.float32)
    times = np.linspace(0.0, 1.0, L, dtype=np.float32)

    # delta: per-channel time since last observation (pandas groupby-cumsum
    # equivalent, _utils.py:139-149), vectorized
    delta = np.zeros((B, L, D), np.float32)
    dt = np.diff(times, prepend=times[0])
    for l in range(1, L):
        delta[:, l] = dt[l] + (1.0 - mask[:, l - 1]) * delta[:, l - 1]

    x_filled = np.nan_to_num(Xm, nan=0.0).astype(np.float32)
    seq = np.stack([x_filled, mask, delta], axis=1)      # [B,3,L,D]

    tchan = np.broadcast_to(times[None, :, None], (B, L, 1))
    vals = np.concatenate([tchan, Xm], axis=-1)
    if interpolation == "hermite":
        coeffs = np.asarray(
            hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(vals))
        )
    else:
        coeffs = np.asarray(
            natural_cubic_coeffs(jnp.asarray(times), jnp.asarray(vals),
                                 pack=True)
        )
    return {"seq": seq, "coeffs": coeffs, "times": times}


@module
class ISTSClassifier(Module):
    """seq layer -> last-step hidden -> BN-MLP classification head
    (reference _model.py:9-40)."""

    layer: SeqLayer
    norm: BatchNorm
    fc1: Linear
    fc2: Linear

    @staticmethod
    def create(key, model_name: str, input_dim: int, seq_len: int,
               hidden_dim: int, num_classes: int,
               hidden_hidden_dim: Optional[int] = None, num_layers: int = 1,
               num_hidden_layers: int = 1, method: Optional[str] = None):
        k1, k2, k3 = jax.random.split(key, 3)
        layer = make_seq_layer(k1, model_name, input_dim, seq_len,
                               hidden_dim, hidden_hidden_dim, num_layers,
                               num_hidden_layers, method=method)
        return ISTSClassifier(
            layer=layer,
            norm=BatchNorm.create(hidden_dim),
            fc1=Linear.create(k2, hidden_dim, hidden_dim),
            fc2=Linear.create(k3, hidden_dim, num_classes),
        )

    def __call__(self, seq, coeffs, *, key=None, train: bool = False):
        res = self.layer(seq, coeffs, key=key, train=train)
        aux = res[2] if len(res) == 3 else None
        out = res[0][:, -1, :]                      # last step
        h, norm = self.norm(out, train=train)
        h = jax.nn.relu(self.fc1(h))
        logits = self.fc2(h)
        logits = jnp.nan_to_num(logits)             # _model.py:80
        return logits, self.replace(norm=norm), aux


def make_fixed_splits(y: np.ndarray, seeds=(0, 1, 2, 3, 4),
                      path: Optional[str] = None):
    """Stratified 70/15/15 per seed, optionally persisted as JSON
    (set_splits.py:64-119; JSON instead of the reference's pickles so
    resumable records never require unpickling untrusted bytes)."""
    splits = {s: stratified_split(y, seed=s) for s in seeds}
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {str(s): [np.asarray(ix).tolist() for ix in sp]
                 for s, sp in splits.items()}, f)
    return splits


@dataclass
class SweepConfig:
    models: tuple = ("neuralsde_4_17", "neuralcde", "gru")
    missing_rates: tuple = (0.0, 0.3, 0.5, 0.7)
    seeds: tuple = (0,)
    hidden_dim: int = 16
    lr: float = 1e-3
    batch_size: int = 64
    max_epochs: int = 30
    patience: int = 10
    out_dir: str = "out"
    kl_weight: float = 1e-4


def train_ists_model(key, model: ISTSClassifier, data: Dict, y: np.ndarray,
                     splits, lr: float = 1e-3, batch_size: int = 64,
                     max_epochs: int = 30, patience: int = 10,
                     verbose: bool = False, kl_weight: float = 1e-4):
    """Train one registry model; returns (model, test metrics)."""
    tr, va, te = splits
    arrays = {"seq": data["seq"], "coeffs": data["coeffs"],
              "y": y.astype(np.int64)}
    split_data = {
        name: {k: v[idx] for k, v in arrays.items()}
        for name, idx in (("train", tr), ("val", va), ("test", te))
    }
    num_classes = int(y.max()) + 1

    def loss_fn(m, batch, key, train):
        logits, new_m, aux = m(batch["seq"], batch["coeffs"], key=key,
                               train=train)
        loss = softmax_cross_entropy(logits, batch["y"])
        if aux is not None:  # latentsde KL
            loss = loss + kl_weight * aux
        return loss, (logits, new_m)

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(10.0),       # _model.py:82
            optax.adam(learning_rate),
        )
    )(learning_rate=lr)
    params, _ = partition(model)
    opt_state = tx.init(params)
    vg = filter_value_and_grad(loss_fn, has_aux=True)
    # 100x grad scaling on the classifier head's final linear
    # (_model.py:27-28 register_hook), applied before the clip like torch
    # (backward hooks fire before clip_grad_norm_).
    grad_hook = readout_grad_hook("fc2")

    @jax.jit
    def train_step(m, opt_state, batch, key, lr_val):
        (loss, (_, new_m)), grads = vg(m, batch, key, True)
        grads = grad_hook(grads)
        params, rest = partition(new_m)
        opt_state.hyperparams["learning_rate"] = lr_val
        updates, opt_state = tx.update(grads, opt_state, params)
        return combine(optax.apply_updates(params, updates), rest), \
            opt_state, loss

    @jax.jit
    def eval_step(m, batch, key):
        loss, (logits, _) = loss_fn(m, batch, key, False)
        return logits, loss

    def evaluate(m, d, key):
        logits_all, ys, losses, ns = [], [], [], []
        for i, (batch, nv) in enumerate(iterate_batches(d, batch_size)):
            lo, ls = eval_step(m, batch, jax.random.fold_in(key, i))
            logits_all.append(np.asarray(lo)[:nv])
            ys.append(batch["y"][:nv])
            losses.append(float(ls) * nv)
            ns.append(nv)
        return classification_metrics(
            np.concatenate(ys), np.concatenate(logits_all),
            sum(losses) / sum(ns), num_classes,
        )

    sched = StepLRSched(lr=lr, step_size=10, gamma=0.5)
    rng = np.random.default_rng(0)
    best_val, best_params, stale = -np.inf, params, 0
    lr_val = lr
    for epoch in range(max_epochs):
        for batch, _ in iterate_batches(split_data["train"], batch_size,
                                        rng=rng):
            key, sub = jax.random.split(key)
            model, opt_state, _ = train_step(model, opt_state, batch, sub,
                                             jnp.asarray(lr_val))
        lr_val = sched.step()
        key, k1 = jax.random.split(key)
        val_m = evaluate(model, split_data["val"], k1)
        if verbose:
            print(f"  epoch {epoch}: val acc {val_m.accuracy:.3f}")
        if val_m.accuracy > best_val:
            best_val = val_m.accuracy
            best_params, _ = partition(model)
            stale = 0
        else:
            stale += 1
            if stale >= patience:
                break
    _, rest = partition(model)
    model = combine(best_params, rest)
    key, k1 = jax.random.split(key)
    return model, evaluate(model, split_data["test"], k1)


def run_robustness_sweep(cfg: SweepConfig = SweepConfig(), n: int = 256,
                         data_fn=synthetic_uea, dataset_name: str =
                         "synthetic_uea", verbose: bool = True) -> List[Dict]:
    """The model_run.py loop: dataset × missing_rate × model × seed with
    skip-if-exists resume and JSON result records."""
    X, y, _ = data_fn(n=n)
    results = []
    for rate in cfg.missing_rates:
        data = preprocess_ists(X, missing_rate=rate)
        for model_name in cfg.models:
            for seed in cfg.seeds:
                out_path = os.path.join(
                    cfg.out_dir, dataset_name, str(int(rate * 100)),
                    f"{model_name}_{seed}.json",
                )
                if os.path.exists(out_path):            # resume
                    with open(out_path) as f:
                        results.append(json.load(f))
                    continue
                key = jax.random.PRNGKey(seed)
                splits = stratified_split(y, seed=seed)
                t0 = time.time()
                try:
                    model = ISTSClassifier.create(
                        key, model_name, X.shape[-1], X.shape[1],
                        cfg.hidden_dim, int(y.max()) + 1,
                    )
                    model, test_m = train_ists_model(
                        key, model, data, y, splits, lr=cfg.lr,
                        batch_size=cfg.batch_size,
                        max_epochs=cfg.max_epochs, patience=cfg.patience,
                        kl_weight=cfg.kl_weight,
                    )
                    rec = {
                        "dataset": dataset_name,
                        "missing_rate": rate,
                        "model": model_name,
                        "seed": seed,
                        "accuracy": float(test_m.accuracy),
                        "f1_weighted": float(test_m.f1_weighted),
                        "wall_time": time.time() - t0,
                    }
                except Exception as e:  # model_run.py:297-305 blanket skip
                    rec = {
                        "dataset": dataset_name, "missing_rate": rate,
                        "model": model_name, "seed": seed,
                        "error": repr(e),
                    }
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                with open(out_path, "w") as f:
                    json.dump(rec, f)
                results.append(rec)
                if verbose:
                    print(rec, flush=True)
    return results
