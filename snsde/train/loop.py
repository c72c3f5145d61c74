"""Training loops: jitted steps + host-side policy.

TPU-native equivalent of the reference classification harness
(/root/reference/benchmark_classification/common_sde.py:107-298):
  * loss = BCE-with-logits(pos_weight) or cross-entropy, plus the L2-norm
    parameter regularization over the vector field (common_sde.py:16-23)
  * Adam with weight_decay = lr*0.01 (common_sde.py:266)
  * ReduceLROnPlateau keyed on trainloss/valloss/valaccuracy/valauc,
    plateau-terminate after 50 stale epochs, best-model restore
    (common_sde.py:119-216)

The step itself is one jitted function over a (optionally sharded) global
batch; policy (scheduling, early stop, best-model tracking) runs host-side.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dfield
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.core import combine, filter_value_and_grad, partition
from .metrics import ClassificationMetrics, classification_metrics
from .schedule import ReduceLROnPlateau

__all__ = [
    "bce_with_logits",
    "softmax_cross_entropy",
    "weight_regularization",
    "TrainConfig",
    "fit_classifier",
    "iterate_batches",
]


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def bce_with_logits(logits, labels, pos_weight: float = 1.0):
    """Mean binary cross entropy on logits with positive-class weighting
    (torch BCEWithLogitsLoss(pos_weight) semantics)."""
    labels = labels.astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.mean(loss)


def softmax_cross_entropy(logits, labels):
    """Mean cross entropy; labels are int class ids."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    return -jnp.mean(picked)


def weight_regularization(module, scaling: float = 0.01):
    """scaling * sum ||p||_2 over trainable leaves (reference
    _add_weight_regularisation, common_sde.py:16-23 — applied to the
    vector-field subtree only)."""
    params, _ = partition(module)
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        if leaf is not None:
            total = total + jnp.linalg.norm(leaf.reshape(-1))
    return scaling * total


# ---------------------------------------------------------------------------
# Batching (host side)
# ---------------------------------------------------------------------------

def iterate_batches(arrays: Dict[str, np.ndarray], batch_size: int,
                    rng: Optional[np.random.Generator] = None,
                    pad: bool = True):
    """Yield (batch_dict, n_valid). Pads the final batch by wrap-around so
    every step sees identical shapes (one XLA program)."""
    n = next(iter(arrays.values())).shape[0]
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    for start in range(0, n, batch_size):
        sel = idx[start : start + batch_size]
        n_valid = sel.shape[0]
        if pad and n_valid < batch_size:
            extra = idx[: batch_size - n_valid]
            if extra.shape[0] < batch_size - n_valid:  # tiny dataset
                extra = np.resize(idx, batch_size - n_valid)
            sel = np.concatenate([sel, extra])
        yield {k: v[sel] for k, v in arrays.items()}, n_valid


# ---------------------------------------------------------------------------
# Config + fit loop
# ---------------------------------------------------------------------------

@dataclass
class TrainConfig:
    lr: float = 1e-3
    batch_size: int = 1024
    max_epochs: int = 200
    num_classes: int = 2
    pos_weight: float = 1.0
    step_mode: str = "valauc"   # trainloss|valloss|valaccuracy|valauc|none
    plateau_patience: int = 5
    plateau_terminate: int = 50
    reg_scaling: float = 0.01
    weight_decay_ratio: float = 0.01   # wd = lr * ratio (reference)
    grad_clip: Optional[float] = None
    eval_batch_size: Optional[int] = None
    seed: int = 0
    verbose: bool = True
    # epoch-in-jit: scan all batches of an epoch inside one compiled call
    # (eliminates per-step host dispatch; ~2x on the remote TPU runtime).
    scan_epoch: bool = True


@dataclass
class FitResult:
    model: Any
    history: List[Dict]
    train_metrics: ClassificationMetrics
    val_metrics: ClassificationMetrics
    test_metrics: Optional[ClassificationMetrics]
    wall_time: float
    steps_per_sec: float
    memory_usage: Optional[int] = None      # peak device bytes delta
    parameters: Optional[int] = None


def fit_classifier(
    model,
    apply_fn: Callable,
    reg_subtree_fn: Callable,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    test_data: Optional[Dict[str, np.ndarray]],
    config: TrainConfig,
    mesh=None,
) -> FitResult:
    """Generic classification fit.

    apply_fn(model, batch, key, train) -> (logits, new_model); batch is a
    dict of arrays whose leading dim is the batch. `reg_subtree_fn(model)`
    returns the subtree to L2-regularize (the vector field).
    """
    cfg = config
    nc = cfg.num_classes

    if mesh is not None:
        from ..parallel.mesh import replicate as _replicate, shard_batch

        def _to_device(batch):
            return shard_batch(batch, mesh)
    else:
        _replicate = None

        def _to_device(batch):
            return batch

    base_loss = (
        (lambda lo, y: bce_with_logits(lo, y, cfg.pos_weight))
        if nc == 2
        else softmax_cross_entropy
    )

    def loss_fn(m, batch, key, train):
        logits, new_m = apply_fn(m, batch, key, train)
        loss = base_loss(logits, batch["y"])
        loss = loss + weight_regularization(reg_subtree_fn(m), cfg.reg_scaling)
        return loss, (logits, new_m)

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.flatten(
            optax.chain(
                *(
                    [optax.clip_by_global_norm(cfg.grad_clip)]
                    if cfg.grad_clip
                    else []
                ),
                optax.adamw(
                    learning_rate,
                    weight_decay=cfg.weight_decay_ratio,  # wd*lr via adamw
                ),
            )
        )
    )(learning_rate=cfg.lr)

    if mesh is not None:
        model = _replicate(model, mesh)
    params0, _ = partition(model)
    opt_state = tx.init(params0)
    vg = filter_value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def train_step(m, opt_state, batch, key, lr):
        (loss, (_, new_m)), grads = vg(m, batch, key, True)
        params, rest = partition(new_m)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return combine(params, rest), opt_state, loss

    @jax.jit
    def epoch_step(m, opt_state, batches, keys, lr):
        opt_state.hyperparams["learning_rate"] = lr

        def body(carry, xs):
            mm, os_ = carry
            batch, k = xs
            (loss, (_, new_m)), grads = vg(mm, batch, k, True)
            p, rest = partition(new_m)
            updates, os2 = tx.update(grads, os_, p)
            return (combine(optax.apply_updates(p, updates), rest), os2), \
                loss

        (m, opt_state), losses = jax.lax.scan(
            body, (m, opt_state), (batches, keys)
        )
        return m, opt_state, losses

    def run_epoch_scanned(m, opt_state, rng, key, lr):
        stacked_list = list(
            iterate_batches(train_data, cfg.batch_size, rng=rng)
        )
        stacked = {
            k: np.stack([b[0][k] for b in stacked_list])
            for k in train_data
        }
        nb = len(stacked_list)
        keys = jax.random.split(key, nb)
        stacked = _to_device(
            {k: v for k, v in stacked.items()}
        ) if mesh is None else jax.tree_util.tree_map(
            lambda v: jax.device_put(
                jnp.asarray(v),
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(None, "data")
                ),
            ),
            stacked,
        )
        m, opt_state, losses = epoch_step(m, opt_state, stacked, keys,
                                          jnp.asarray(lr))
        return m, opt_state, nb

    @jax.jit
    def eval_step(m, batch, key):
        loss, (logits, _) = loss_fn(m, batch, key, False)
        return logits, loss

    def evaluate(m, data, key) -> ClassificationMetrics:
        ebs = cfg.eval_batch_size or cfg.batch_size
        logits_all, ys, losses, sizes = [], [], [], []
        for i, (batch, n_valid) in enumerate(
            iterate_batches(data, ebs, rng=None)
        ):
            logits, loss = eval_step(m, _to_device(batch),
                                     jax.random.fold_in(key, i))
            logits_all.append(np.asarray(logits)[:n_valid])
            ys.append(np.asarray(batch["y"])[:n_valid])
            losses.append(float(loss) * n_valid)
            sizes.append(n_valid)
        total = sum(sizes)
        return classification_metrics(
            np.concatenate(ys),
            np.concatenate(logits_all),
            sum(losses) / total,
            nc,
        )

    sched = ReduceLROnPlateau(
        lr=cfg.lr,
        mode="min" if cfg.step_mode in ("trainloss", "valloss") else "max",
        patience=cfg.plateau_patience,
    )

    from ..nn.core import tree_count_params
    from ..utils.observability import memory_delta

    n_params = tree_count_params(model)
    mem = memory_delta()
    mem.__enter__()
    key = jax.random.PRNGKey(cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    lr = cfg.lr

    best_val_acc = -np.inf
    best_params = params0
    best_train_loss = np.inf
    best_train_acc = -np.inf
    best_train_loss_epoch = 0
    best_train_acc_epoch = 0
    history: List[Dict] = []
    n_steps = 0
    t_start = time.time()

    for epoch in range(cfg.max_epochs):
        if cfg.scan_epoch:
            key, sub = jax.random.split(key)
            model, opt_state, nb = run_epoch_scanned(model, opt_state, rng,
                                                     sub, lr)
            n_steps += nb
        else:
            for batch, _ in iterate_batches(train_data, cfg.batch_size,
                                            rng=rng):
                key, sub = jax.random.split(key)
                model, opt_state, loss = train_step(
                    model, opt_state, _to_device(batch), sub,
                    jnp.asarray(lr)
                )
                n_steps += 1

        key, k1, k2 = jax.random.split(key, 3)
        train_m = evaluate(model, train_data, k1)
        val_m = evaluate(model, val_data, k2)

        if train_m.loss * 1.0001 < best_train_loss:
            best_train_loss = train_m.loss
            best_train_loss_epoch = epoch
        if train_m.accuracy > best_train_acc * 1.001:
            best_train_acc = train_m.accuracy
            best_train_acc_epoch = epoch
        if val_m.accuracy > best_val_acc:
            best_val_acc = val_m.accuracy
            best_params, _ = partition(model)

        metric = {
            "trainloss": train_m.loss,
            "valloss": val_m.loss,
            "valaccuracy": val_m.accuracy,
            "valauc": val_m.auroc if val_m.auroc is not None else val_m.accuracy,
        }.get(cfg.step_mode)
        if metric is not None:
            lr = sched.step(metric)

        history.append(
            {"epoch": epoch, "lr": lr, "train": train_m.as_dict(),
             "val": val_m.as_dict()}
        )
        if cfg.verbose:
            extra = (
                f" train_auc {train_m.auroc:.3f} val_auc {val_m.auroc:.3f}"
                if train_m.auroc is not None
                else ""
            )
            print(
                f"epoch {epoch}: train_loss {train_m.loss:.3f} "
                f"train_acc {train_m.accuracy:.3f} val_loss {val_m.loss:.3f} "
                f"val_acc {val_m.accuracy:.3f}{extra} lr {lr:.2e}",
                flush=True,
            )

        if (
            epoch > best_train_loss_epoch + cfg.plateau_terminate
            or epoch > best_train_acc_epoch + cfg.plateau_terminate
        ):
            if cfg.verbose:
                print("early stop: training plateau", flush=True)
            break

    wall = time.time() - t_start
    mem.__exit__(None, None, None)
    _, rest = partition(model)
    model = combine(best_params, rest)

    key, k1, k2, k3 = jax.random.split(key, 4)
    train_m = evaluate(model, train_data, k1)
    val_m = evaluate(model, val_data, k2)
    test_m = evaluate(model, test_data, k3) if test_data is not None else None
    return FitResult(
        model=model,
        history=history,
        train_metrics=train_m,
        val_metrics=val_m,
        test_metrics=test_m,
        wall_time=wall,
        steps_per_sec=n_steps / max(wall, 1e-9),
        memory_usage=mem.delta,
        parameters=n_params,
    )
