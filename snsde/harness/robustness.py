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
import re
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.common import inject_missingness, stratified_split
from ..data.synthetic import synthetic_uea
from ..nn.core import (Module, combine, filter_value_and_grad, module,
                       partition, static_field)
from ..nn.layers import BatchNorm, Linear
from ..ops.interp import hermite_cubic_coeffs, natural_cubic_coeffs
from ..registry import SeqLayer, make_seq_layer
from ..train.loop import (iterate_batches, readout_grad_hook,
                          softmax_cross_entropy)
from ..train.metrics import classification_metrics
from ..train.schedule import StepLR as StepLRSched

__all__ = ["ISTSClassifier", "ISTSSeedEnsembleSDE", "predict_ists",
           "coeff_family", "preprocess_ists", "run_robustness_sweep",
           "make_fixed_splits",
           "train_ists_model", "train_ists_ensemble"]


def coeff_family(model_name: str) -> str:
    """Coefficient family a registry model consumes, per the reference's
    harness- and name-level semantics (torch-ists/model_run.py:127-130:
    interpolate='natural' for the CDE/ODE-hybrid family, 'hermite'
    otherwise; _layer.py:202-204: neuralcde->natural, -c->cubic,
    -h->hermite — upstream those name variants are import-broken, this
    implements the intended dispatch). 'cubic' is torchcde's natural cubic
    spline — the same spline family as controldiffeq's 'natural', so both
    map to natural_cubic_coeffs here; 'hermite' is the local
    backward-difference Hermite spline."""
    if model_name in ("gru-dt", "gru-d", "gru-ode", "ode-rnn", "ncde",
                      "neuralcde", "neuralcde-c", "ancde", "exit"):
        return "natural"
    return "hermite"


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
    # None -> each model family's reference default (SDE streams: srk,
    # nsde_model.py:67; NCDE: rk4). The reference sweep never overrides.
    method: object = None
    # write the reference's per-run prediction dump (y_true, y_pred,
    # logits — model_run.py:262-274 pickles this triple; .npz here) next
    # to each JSON record
    save_preds: bool = False


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
    # snapshot the FULL model (weights AND BatchNorm running stats from
    # the same epoch) — the reference deep-copies the state_dict
    # (_model.py best-restore); JAX pytrees are immutable so keeping the
    # reference is the deepcopy
    best_val, best_model, stale = -np.inf, model, 0
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
            best_model = model
            stale = 0
        else:
            stale += 1
            if stale >= patience:
                break
    model = best_model
    key, k1 = jax.random.split(key)
    return model, evaluate(model, split_data["test"], k1)


def predict_ists(model: ISTSClassifier, data: Dict, y: np.ndarray, idx,
                 batch_size: int = 64, key=None):
    """Test-split prediction triple (y_true, y_pred, logits) for one
    trained classifier — the payload the reference pickles per sweep run
    (model_run.py:262-274)."""
    key = jax.random.PRNGKey(0) if key is None else key
    d = {"seq": data["seq"][idx], "coeffs": data["coeffs"][idx],
         "y": y.astype(np.int64)[idx]}

    @jax.jit
    def fwd(m, batch, k):
        logits, _, _ = m(batch["seq"], batch["coeffs"], key=k, train=False)
        return logits

    logits_all, ys = [], []
    for i, (batch, nv) in enumerate(iterate_batches(d, batch_size)):
        lo = fwd(model, batch, jax.random.fold_in(key, i))
        logits_all.append(np.asarray(lo)[:nv])
        ys.append(batch["y"][:nv])
    logits = np.concatenate(logits_all)
    y_true = np.concatenate(ys)
    return y_true, logits.argmax(-1), logits


_SDE_GRID_RE_SWEEP = re.compile(r"^neuralsde_\d+_\d+$")


def run_robustness_sweep(cfg: SweepConfig = SweepConfig(), n: int = 256,
                         data_fn=synthetic_uea, dataset_name: str =
                         "synthetic_uea", verbose: bool = True,
                         pack_seeds: bool = False) -> List[Dict]:
    """The model_run.py loop: dataset × missing_rate × model × seed with
    skip-if-exists resume and JSON result records.

    The seed drives the split AND the missingness draw, matching the
    reference (model_run.py:155 passes SEED into preprocess).

    pack_seeds=True trains a cell's SDE-grid seeds concurrently through
    one lane-packed fused solve with per-member control paths
    (train_ists_ensemble; non-SDE models keep the solo loop)."""
    X, y, _ = data_fn(n=n)
    results = []
    data_cache: Dict = {}

    def _data(rate, seed, family="hermite"):
        k = (rate, seed, family)
        if k not in data_cache:
            data_cache[k] = preprocess_ists(X, missing_rate=rate,
                                            seed=seed,
                                            interpolation=family)
        return data_cache[k]

    def _write(rec, out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(rec, f)
        results.append(rec)
        if verbose:
            print(rec, flush=True)

    for rate in cfg.missing_rates:
        for model_name in cfg.models:
            pending = []
            for seed in cfg.seeds:
                out_path = os.path.join(
                    cfg.out_dir, dataset_name, str(int(rate * 100)),
                    f"{model_name}_{seed}.json",
                )
                if os.path.exists(out_path):            # resume
                    with open(out_path) as f:
                        results.append(json.load(f))
                    continue
                pending.append((seed, out_path))
            if not pending:
                continue

            if (pack_seeds and len(pending) > 1
                    and (_SDE_GRID_RE_SWEEP.match(model_name)
                         or model_name in ("neuralcde", "gru-ode"))):
                seeds = [s for s, _ in pending]
                t0 = time.time()
                written = set()
                try:
                    datas = [_data(rate, s, coeff_family(model_name))
                             for s in seeds]
                    splits_list = [stratified_split(y, seed=s)
                                   for s in seeds]
                    model = ISTSSeedEnsembleSDE.create(
                        jax.random.PRNGKey(seeds[0]), model_name,
                        X.shape[-1], X.shape[1], cfg.hidden_dim,
                        int(y.max()) + 1, len(seeds), method=cfg.method,
                    )
                    model, test_ms = train_ists_ensemble(
                        jax.random.PRNGKey(seeds[0]), model, datas, y,
                        splits_list, lr=cfg.lr,
                        batch_size=cfg.batch_size,
                        max_epochs=cfg.max_epochs, patience=cfg.patience,
                    )
                    wall = time.time() - t0
                    for k, ((seed, out_path), tm) in enumerate(
                            zip(pending, test_ms)):
                        if cfg.save_preds:
                            yt, yp, lo = predict_ists(
                                model.members[k], datas[k], y,
                                splits_list[k][2], cfg.batch_size)
                            os.makedirs(os.path.dirname(out_path),
                                        exist_ok=True)
                            np.savez(out_path[:-5] + ".npz", y_true=yt,
                                     y_pred=yp, logits=lo)
                        _write({
                            "dataset": dataset_name, "missing_rate": rate,
                            "model": model_name, "seed": seed,
                            "accuracy": float(tm.accuracy),
                            "f1_weighted": float(tm.f1_weighted),
                            "wall_time": wall / len(seeds),
                            "packed": len(seeds),
                            "method": model.method,
                        }, out_path)
                        written.add(out_path)
                    continue
                except Exception as e:  # blanket skip, as model_run.py
                    # only the cells whose record was NOT already written
                    # become error records — a failure in member k's
                    # post-training dump must not clobber members < k
                    for seed, out_path in pending:
                        if out_path in written:
                            continue
                        _write({
                            "dataset": dataset_name, "missing_rate": rate,
                            "model": model_name, "seed": seed,
                            "error": repr(e),
                        }, out_path)
                    continue

            for seed, out_path in pending:
                key = jax.random.PRNGKey(seed)
                splits = stratified_split(y, seed=seed)
                t0 = time.time()
                try:
                    data = _data(rate, seed, coeff_family(model_name))
                    model = ISTSClassifier.create(
                        key, model_name, X.shape[-1], X.shape[1],
                        cfg.hidden_dim, int(y.max()) + 1,
                        method=cfg.method,
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
                        "method": getattr(
                            getattr(model.layer, "inner", None),
                            "method", None),
                    }
                    if cfg.save_preds:
                        yt, yp, lo = predict_ists(model, data, y,
                                                  splits[2],
                                                  cfg.batch_size)
                        os.makedirs(os.path.dirname(out_path),
                                    exist_ok=True)
                        np.savez(out_path[:-5] + ".npz", y_true=yt,
                                 y_pred=yp, logits=lo)
                except Exception as e:  # model_run.py:297-305 blanket skip
                    rec = {
                        "dataset": dataset_name, "missing_rate": rate,
                        "model": model_name, "seed": seed,
                        "error": repr(e),
                    }
                _write(rec, out_path)
    return results


# ---------------------------------------------------------------------------
# Lane-packed K-seed sweep training (VERDICT r2 item 3)
# ---------------------------------------------------------------------------

@module
class ISTSSeedEnsembleSDE(Module):
    """K seeds of one `neuralsde_{i}_{j}` (or `neuralcde`) ISTS
    classifier solved through ONE lane-packed fused kernel with
    PER-MEMBER control paths.

    The reference sweep trains 5 seeds per (dataset, rate, model) cell in
    separate processes (model_run.py:294-305), where the seed changes the
    split AND the missingness pattern (preprocess(..., SEED=SEED),
    _utils.py:115-120) — so members see genuinely different data. The
    packed kernels take per-member paths (kernels/multi.py `paths=`); the
    per-member heads/BN/readouts run as ordinary per-member ops.

    forward(seqs [K,B,3,L,D], coeffs [K,B,L-1,4C]) -> logits [K,B,C].
    """

    members: Tuple[ISTSClassifier, ...]
    method: str = static_field(default="euler")

    @staticmethod
    def create(key, model_name: str, input_dim: int, seq_len: int,
               hidden_dim: int, num_classes: int, n_members: int,
               hidden_hidden_dim=None, num_layers: int = 1,
               num_hidden_layers: int = 1, method=None):
        keys = jax.random.split(key, n_members)
        members = tuple(
            ISTSClassifier.create(k, model_name, input_dim, seq_len,
                                  hidden_dim, num_classes,
                                  hidden_hidden_dim, num_layers,
                                  num_hidden_layers, method=method)
            for k in keys
        )
        # follow the member stream's solver (srk by reference default)
        return ISTSSeedEnsembleSDE(members=members,
                                   method=members[0].layer.inner.method)

    @property
    def n_members(self) -> int:
        return len(self.members)

    @staticmethod
    def member_subtree(tree, k):
        return tree.members[k]

    @staticmethod
    def replace_member(tree, k, sub):
        ms = list(tree.members)
        ms[k] = sub
        return tree.replace(members=tuple(ms))

    def __call__(self, seqs, coeffs, *, key, train: bool = False):
        from ..models.ensemble import packed_cde_solve, packed_solve
        from ..models.neuralcde import NeuralCDEStream
        from ..ops.interp import CubicPath

        K = self.n_members
        L = seqs.shape[3]
        times = np.linspace(0.0, 1.0, L, dtype=np.float32)
        paths = [CubicPath(coeffs[k], times) for k in range(K)]
        streams = [m.layer.inner for m in self.members]   # *Stream models
        t0 = jnp.asarray(times)[0]
        y0s = jnp.stack([
            s.initial_network(paths[k].evaluate(t0))
            for k, s in enumerate(streams)
        ])                                                # [K, B, H]
        if isinstance(streams[0], NeuralCDEStream):
            # deterministic CDE members (ncde sweep cells): one packed
            # fused CDE solve with per-member control paths
            zs = packed_cde_solve([s.func for s in streams], paths[0],
                                  times, y0s, method=self.method,
                                  paths=paths)
        else:
            # one key per member; the packed ISTS head has no dropout, so
            # no extra key is drawn (matches _model.py:66-80's head)
            keys = list(jax.random.split(key, K))
            zs = packed_solve([s.func for s in streams], paths[0], times,
                              y0s, keys, method=self.method, paths=paths)
        logits_all, new_members = [], []
        for k, m in enumerate(self.members):
            z = jnp.moveaxis(zs[k], 0, 1)                 # [B, L, H]
            out = streams[k].linear(z)[:, -1, :]          # last step
            h, norm = m.norm(out, train=train)
            h = jax.nn.relu(m.fc1(h))
            logits = jnp.nan_to_num(m.fc2(h))             # _model.py:80
            logits_all.append(logits)
            new_members.append(m.replace(norm=norm))
        return jnp.stack(logits_all), self.replace(
            members=tuple(new_members))


def train_ists_ensemble(key, model: ISTSSeedEnsembleSDE, datas, y,
                        splits_list, lr: float = 1e-3,
                        batch_size: int = 64, max_epochs: int = 30,
                        patience: int = 10, verbose: bool = False,
                        lrs=None):
    """Train K sweep seeds concurrently through the packed solve.

    datas: list of K preprocessed dicts (per-seed missingness);
    splits_list: K (train, val, test) index triples (per-seed splits).
    Policy per member, faithful to train_ists_model: StepLR(10, 0.5)
    (deterministic — shared across members), patience-10 early stop on
    val accuracy with best-model restore, 100x fc2 grad hook, clip 10.
    `lrs` (length-K) gives each member its OWN base learning rate (ASHA
    trials packed per rung differ only in lr); all members share the
    StepLR decay schedule. Returns (model, [per-member test metrics])."""
    K = model.n_members
    lr_base = np.asarray(lrs if lrs is not None else [lr] * K, np.float32)
    assert lr_base.shape == (K,)
    cls = type(model)
    num_classes = int(y.max()) + 1
    yi = y.astype(np.int64)

    seqs = jnp.asarray(np.stack([d["seq"] for d in datas]))
    coeffs = jnp.asarray(np.stack([d["coeffs"] for d in datas]))
    ylab = jnp.asarray(yi)

    n_tr = len(splits_list[0][0])
    for sp in splits_list:
        assert len(sp[0]) == n_tr, "per-seed stratified splits equal-size"
    nb = max(1, -(-n_tr // batch_size))

    def loss_fn(m, bidx, bmask, key, train):
        # bidx [K, B] per-member sample indices into the full arrays
        bseq = jnp.stack([seqs[k][bidx[k]] for k in range(K)])
        bco = jnp.stack([coeffs[k][bidx[k]] for k in range(K)])
        logits, new_m = m(bseq, bco, key=key, train=train)   # [K, B, C]
        by = ylab[bidx]                                      # [K, B]
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(
            logp, by[..., None].astype(jnp.int32), axis=-1)[..., 0]
        mask = bmask.astype(per.dtype)
        mlosses = jnp.sum(per * mask, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1), 1.0)                      # [K]
        return jnp.sum(mlosses), (mlosses, logits, new_m)

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(learning_rate),
        )
    )(learning_rate=lr)
    params0, _ = partition(model)
    opt_states = tuple(tx.init(cls.member_subtree(params0, k))
                       for k in range(K))
    vg = filter_value_and_grad(loss_fn, has_aux=True)
    grad_hook = readout_grad_hook("fc2")

    @jax.jit
    def epoch_step(m, opt_states, perm, masks, keys, lr_vec, active):
        opt_states = list(opt_states)
        for k in range(K):
            opt_states[k].hyperparams["learning_rate"] = lr_vec[k]
        opt_states = tuple(opt_states)

        def body(carry, xs):
            mm, oss = carry
            bidx, bmask, kk = xs
            (_, (mlosses, _, new_m)), grads = vg(mm, bidx, bmask, kk,
                                                 True)
            from ..train.ensemble_loop import freeze_inactive_rest

            p, _ = partition(new_m)
            # terminated members freeze completely: masked param updates
            # below + where-selected BN running stats
            rest = freeze_inactive_rest(cls, K, active, mm, new_m)
            new_oss = []
            for k in range(K):
                pk = cls.member_subtree(p, k)
                gk = grad_hook(cls.member_subtree(grads, k))
                upd, osk = tx.update(gk, oss[k], pk)
                upd = jax.tree_util.tree_map(lambda u: u * active[k], upd)
                p = cls.replace_member(p, k,
                                       optax.apply_updates(pk, upd))
                new_oss.append(osk)
            return (combine(p, rest), tuple(new_oss)), mlosses

        (m, opt_states), mlosses = jax.lax.scan(
            body, (m, opt_states), (perm, masks, keys))
        return m, opt_states, mlosses

    @jax.jit
    def eval_scan(m, perm, masks, keys):
        def body(_, xs):
            bidx, bmask, kk = xs
            _, (mlosses, logits, _) = loss_fn(m, bidx, bmask, kk, False)
            return None, (logits, mlosses)

        _, (logits, mlosses) = jax.lax.scan(body, None,
                                            (perm, masks, keys))
        return logits, mlosses

    def _grid(indices_list, rngs=None):
        """Per-member padded index grids: [K, nb, B] + [nb, B] mask (all
        members share sizes)."""
        from ..train.loop import padded_index_grid

        perms = []
        for k, ind in enumerate(indices_list):
            ix = np.asarray(ind)
            if rngs is not None:
                ix = rngs[k].permutation(ix)
            g, gmask, nb_ = padded_index_grid(ix, batch_size)
            perms.append(g)
        mask = gmask.reshape(-1)
        # [nb, K, B] so scan iterates batches; mask shared
        perm = np.stack(perms, axis=1).astype(np.int32)
        masks = np.broadcast_to(mask.reshape(nb_, 1, batch_size),
                                (nb_, K, batch_size)).copy()
        return perm, masks, nb_

    def evaluate(m, which, key):
        perm, masks, nb_ = _grid([sp[which] for sp in splits_list])
        keys = jnp.stack([jax.random.fold_in(key, i) for i in range(nb_)])
        logits, mlosses = eval_scan(m, jnp.asarray(perm),
                                    jnp.asarray(masks), keys)
        logits = np.asarray(logits)       # [nb, K, B, C]
        mlosses = np.asarray(mlosses)     # [nb, K]
        out = []
        valid = masks[:, 0, :].reshape(-1) > 0
        n_valids = masks[:, 0, :].sum(axis=1)
        for k in range(K):
            idx_flat = perm[:, k, :].reshape(-1)[valid]
            lo = logits[:, k].reshape(-1, num_classes)[valid]
            loss = float((mlosses[:, k] * n_valids).sum() / n_valids.sum())
            out.append(classification_metrics(yi[idx_flat], lo, loss,
                                              num_classes))
        return out

    sched = StepLRSched(lr=1.0, step_size=10, gamma=0.5)
    rngs = [np.random.default_rng(k) for k in range(K)]
    best_val = np.full(K, -np.inf)
    # per-member FULL-state snapshots (weights + BN running stats of the
    # same epoch — see train_ists_model's best-restore note)
    best_members = list(model.members)
    stale = np.zeros(K, int)
    active = np.ones(K, np.float32)
    terminated = np.zeros(K, bool)
    decay = 1.0
    for epoch in range(max_epochs):
        perm, masks, _ = _grid([sp[0] for sp in splits_list], rngs=rngs)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, nb)
        model, opt_states, _ = epoch_step(
            model, opt_states, jnp.asarray(perm), jnp.asarray(masks),
            keys, jnp.asarray(lr_base * decay), jnp.asarray(active))
        decay = sched.step()
        key, k1 = jax.random.split(key)
        val_ms = evaluate(model, 1, k1)
        for k in range(K):
            if terminated[k]:
                continue
            if val_ms[k].accuracy > best_val[k]:
                best_val[k] = val_ms[k].accuracy
                best_members[k] = model.members[k]
                stale[k] = 0
            else:
                stale[k] += 1
                if stale[k] >= patience:
                    terminated[k] = True
                    active[k] = 0.0
        if verbose:
            accs = " ".join(f"{v.accuracy:.3f}" for v in val_ms)
            print(f"  epoch {epoch}: val acc [{accs}]", flush=True)
        if terminated.all():
            break
    model = model.replace(members=tuple(best_members))
    key, k1 = jax.random.split(key)
    return model, evaluate(model, 2, k1)
