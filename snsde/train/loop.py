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
    "bce_with_logits_per_sample",
    "softmax_cross_entropy_per_sample",
    "weight_regularization",
    "readout_grad_hook",
    "TrainConfig",
    "fit_classifier",
    "iterate_batches",
]


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def bce_with_logits_per_sample(logits, labels, pos_weight: float = 1.0):
    """Per-sample binary cross entropy on logits with positive-class
    weighting (torch BCEWithLogitsLoss(pos_weight, reduction='none'))."""
    labels = labels.astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)


def softmax_cross_entropy_per_sample(logits, labels):
    """Per-sample cross entropy; labels are int class ids."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                axis=-1)[:, 0]


def bce_with_logits(logits, labels, pos_weight: float = 1.0):
    """Mean binary cross entropy on logits with positive-class weighting
    (torch BCEWithLogitsLoss(pos_weight) semantics)."""
    return jnp.mean(bce_with_logits_per_sample(logits, labels, pos_weight))


def softmax_cross_entropy(logits, labels):
    """Mean cross entropy; labels are int class ids."""
    return jnp.mean(softmax_cross_entropy_per_sample(logits, labels))


def readout_grad_hook(attr_path: str, scale: float = 100.0) -> Callable:
    """Per-leaf gradient scaling for the final readout layer, reproducing
    the reference's 100x register_hook on the last linear's weight+bias
    (sepsis-sde.py:55-56, speech_commands-sde.py:33-34,
    torch-ists/_model.py:27-28).

    `attr_path` names the subtree within the *gradient* pytree (which mirrors
    the model dataclass tree), e.g. "sde.readout.linear2". Returns a function
    grads -> grads with every leaf of that subtree multiplied by `scale`.
    Applied to the raw gradients before the optimizer (clip / weight decay /
    Adam), exactly where torch's backward hook fires.
    """
    parts = attr_path.split(".")

    def hook(grads):
        def rec(node, i):
            if i == len(parts):
                return jax.tree_util.tree_map(lambda x: x * scale, node)
            return node.replace(**{parts[i]: rec(getattr(node, parts[i]),
                                                 i + 1)})

        return rec(grads, 0)

    return hook


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

def padded_index_grid(idx, batch_size: int):
    """Pad a 1-D index vector to a [nb, batch_size] grid by wrap-around
    (np.resize covers pad > n for tiny datasets) — iterate_batches'
    padding policy in precomputed-grid form, shared by the device-resident
    scanned epoch/eval loops (train/ensemble_loop, harness/robustness,
    harness/interpolation, harness/sweep_sharded).

    Returns (perm [nb, B] int32, mask [nb, B] float32 with the padded
    tail zeroed, nb)."""
    idx = np.asarray(idx)
    n = idx.shape[0]
    nb = max(1, -(-n // batch_size))
    pad = nb * batch_size - n
    mask = np.ones(nb * batch_size, np.float32)
    if pad:
        idx = np.concatenate([idx, np.resize(idx, pad)])
        mask[-pad:] = 0.0
    return (idx.reshape(nb, batch_size).astype(np.int32),
            mask.reshape(nb, batch_size), nb)


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


def _subtree_norms(model, depth: int = 2) -> Dict[str, float]:
    """L2 norms of the trainable parameters aggregated by the first `depth`
    path components of the model tree (divergence triage: which component's
    weights are exploding)."""
    params, _ = partition(model)
    acc: Dict[str, float] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf is None:
            continue
        name = jax.tree_util.keystr(path[:depth]).lstrip(".")
        acc[name] = acc.get(name, 0.0) + float(
            jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        )
    return {k: float(np.sqrt(v)) for k, v in acc.items()}


def _buffer_norms(model, depth: int = 2) -> Dict[str, float]:
    """Like _subtree_norms but over the NON-trainable partition (BatchNorm
    running statistics) — eval-mode divergence with flat param norms points
    at stale/corrupted running stats."""
    _, rest = partition(model)
    acc: Dict[str, float] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(rest)[0]:
        if not isinstance(leaf, (jnp.ndarray, np.ndarray)) or \
                not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            continue
        name = jax.tree_util.keystr(path[:depth]).lstrip(".")
        acc[name] = acc.get(name, 0.0) + float(
            jnp.sum(jnp.square(jnp.asarray(leaf, jnp.float32)))
        )
    return {k: float(np.sqrt(v)) for k, v in acc.items()}


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
    # Reference uses torch.optim.Adam(weight_decay=lr*0.01): *coupled* L2
    # (wd*p added to the gradient before Adam's moment normalization,
    # common_sde.py:266). True matches that; False keeps decoupled AdamW.
    coupled_weight_decay: bool = True
    # 100x gradient scaling on the final readout linear (weight+bias), the
    # reference's register_hook (sepsis-sde.py:55-56). Path into the grad
    # tree is supplied by the harness via fit_classifier(grad_hook=...).
    grad_clip: Optional[float] = None
    eval_batch_size: Optional[int] = None
    seed: int = 0
    verbose: bool = True
    # Diagnostic: record per-epoch max gradient norm (scan path) and
    # per-subtree parameter norms into history (for divergence triage).
    track_norms: bool = False
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
    grad_hook: Optional[Callable] = None,
) -> FitResult:
    """Generic classification fit.

    apply_fn(model, batch, key, train) -> (logits, new_model); batch is a
    dict of arrays whose leading dim is the batch. `reg_subtree_fn(model)`
    returns the subtree to L2-regularize (the vector field). `grad_hook`
    (grads -> grads) mirrors torch backward hooks — see readout_grad_hook.

    Final partial batches are padded to the fixed batch shape (one XLA
    program) but masked out of the loss, so every sample carries exactly the
    reference's weight (common_sde.py runs a smaller final batch; only
    BatchNorm batch statistics see the padded duplicates).
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

    per_sample_loss = (
        (lambda lo, y: bce_with_logits_per_sample(lo, y, cfg.pos_weight))
        if nc == 2
        else softmax_cross_entropy_per_sample
    )

    def loss_fn(m, batch, key, train):
        logits, new_m = apply_fn(m, batch, key, train)
        per = per_sample_loss(logits, batch["y"])
        mask = batch.get("_mask")
        if mask is None:
            loss = jnp.mean(per)
        else:
            mask = mask.astype(per.dtype)
            loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        loss = loss + weight_regularization(reg_subtree_fn(m), cfg.reg_scaling)
        return loss, (logits, new_m)

    # Optimizer. coupled_weight_decay=True reproduces
    # torch.optim.Adam(lr, weight_decay=lr*0.01) (common_sde.py:266): the L2
    # term wd*p is added to the gradient *before* Adam's moment
    # normalization, and wd stays fixed at lr0*0.01 even when
    # ReduceLROnPlateau shrinks lr (torch weight_decay is a
    # construction-time param-group constant).
    wd = cfg.lr * cfg.weight_decay_ratio
    clip = (
        [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip else []
    )
    if cfg.coupled_weight_decay:
        def _make_tx(learning_rate):
            return optax.flatten(optax.chain(
                *clip,
                optax.add_decayed_weights(wd),
                optax.adam(learning_rate),
            ))
    else:
        def _make_tx(learning_rate):
            return optax.flatten(optax.chain(
                *clip,
                optax.adamw(learning_rate,
                            weight_decay=cfg.weight_decay_ratio),
            ))
    tx = optax.inject_hyperparams(_make_tx)(learning_rate=cfg.lr)

    if mesh is not None:
        model = _replicate(model, mesh)
    params0, _ = partition(model)
    opt_state = tx.init(params0)
    vg = filter_value_and_grad(loss_fn, has_aux=True)

    def _apply_hook(grads):
        return grad_hook(grads) if grad_hook is not None else grads

    @jax.jit
    def train_step(m, opt_state, batch, key, lr):
        (loss, (_, new_m)), grads = vg(m, batch, key, True)
        grads = _apply_hook(grads)
        params, rest = partition(new_m)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return combine(params, rest), opt_state, loss

    # Device-resident epoch: the training set is uploaded once; each epoch
    # ships only an [nb, B] int32 permutation + loss mask (a few KB) and
    # batches are gathered on device inside the scan — no per-epoch
    # re-stack/re-upload of the full set (a scaling wall at SpeechCommands
    # size, 34,975 samples).
    n_train = next(iter(train_data.values())).shape[0]
    nb_train = max(1, -(-n_train // cfg.batch_size))
    if mesh is not None:
        from ..parallel.mesh import shard_batch as _shard_batch

        device_train = _shard_batch(train_data, mesh)
        _batch_divisible = cfg.batch_size % mesh.shape["data"] == 0
        _data_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")
        )
    else:
        device_train = {k: jnp.asarray(v) for k, v in train_data.items()}

    # device_train is passed as an ARGUMENT (not closed over): jit treats
    # closed-over device arrays as constants embedded in the serialized
    # HLO, which blows past remote-compile payload limits for real-size
    # training sets (seen at n=8192 sepsis: HTTP 413)
    @jax.jit
    def epoch_step(m, opt_state, dtrain, perm, masks, keys, lr):
        opt_state.hyperparams["learning_rate"] = lr

        def body(carry, xs):
            mm, os_ = carry
            idx, mask, k = xs
            batch = {kk: vv[idx] for kk, vv in dtrain.items()}
            if mesh is not None and _batch_divisible:
                batch = jax.lax.with_sharding_constraint(
                    batch, _data_sharding
                )
            batch["_mask"] = mask
            (loss, (_, new_m)), grads = vg(mm, batch, k, True)
            grads = _apply_hook(grads)
            p, rest = partition(new_m)
            updates, os2 = tx.update(grads, os_, p)
            # grad-norm reduction only when the diagnostic is requested —
            # it's a full reduction over every parameter gradient and, as
            # a jit output, XLA cannot DCE it
            gn = (optax.global_norm(grads) if cfg.track_norms
                  else jnp.zeros(()))
            return (combine(optax.apply_updates(p, updates), rest), os2), \
                (loss, gn)

        (m, opt_state), (losses, gnorms) = jax.lax.scan(
            body, (m, opt_state), (perm, masks, keys)
        )
        return m, opt_state, losses, gnorms

    def run_epoch_scanned(m, opt_state, rng, key, lr):
        idx = rng.permutation(n_train)
        pad = nb_train * cfg.batch_size - n_train
        mask = np.ones(nb_train * cfg.batch_size, np.float32)
        if pad:
            idx = np.concatenate([idx, np.resize(idx, pad)])
            mask[-pad:] = 0.0
        perm = idx.reshape(nb_train, cfg.batch_size).astype(np.int32)
        masks = mask.reshape(nb_train, cfg.batch_size)
        keys = jax.random.split(key, nb_train)
        m, opt_state, losses, gnorms = epoch_step(m, opt_state, device_train,
                                                  perm, masks, keys,
                                                  jnp.asarray(lr))
        return m, opt_state, nb_train, (losses, gnorms)

    # Evaluation mirrors the device-resident training epoch: every eval
    # set is uploaded ONCE and per-epoch evaluation ships only an
    # [nb, ebs] index grid + mask (a few KB), with batches gathered on
    # device inside a scanned jit. The previous per-batch host slicing
    # re-uploaded the full dataset every epoch (~400 MB/epoch at sepsis
    # size over the remote runtime link — the dominant wall-time cost of
    # the flagship run).
    _eval_device_cache = {}

    def _eval_resident(data):
        cache_key = id(data)
        if cache_key not in _eval_device_cache:
            if data is train_data:
                _eval_device_cache[cache_key] = device_train
            else:
                _eval_device_cache[cache_key] = {
                    k: jnp.asarray(v) for k, v in data.items()
                }
        return _eval_device_cache[cache_key]

    @jax.jit
    def eval_scan(m, ddata, perm, masks, keys):
        def body(_, xs):
            idx, mask, k = xs
            batch = {kk: vv[idx] for kk, vv in ddata.items()}
            batch["_mask"] = mask
            loss, (logits, _) = loss_fn(m, batch, k, False)
            return None, (logits, loss)

        _, (logits, losses) = jax.lax.scan(body, None, (perm, masks, keys))
        return logits, losses

    def evaluate(m, data, key) -> ClassificationMetrics:
        ebs = cfg.eval_batch_size or cfg.batch_size
        n = next(iter(data.values())).shape[0]
        nb = max(1, -(-n // ebs))
        idx = np.arange(n)
        pad = nb * ebs - n
        mask = np.ones(nb * ebs, np.float32)
        if pad:
            idx = np.concatenate([idx, np.resize(idx, pad)])
            mask[-pad:] = 0.0
        perm = idx.reshape(nb, ebs).astype(np.int32)
        masks = mask.reshape(nb, ebs)
        keys = jnp.stack(
            [jax.random.fold_in(key, i) for i in range(nb)]
        )
        logits, losses = eval_scan(m, _eval_resident(data), perm, masks,
                                   keys)
        logits = np.asarray(logits)
        logits = logits.reshape(nb * ebs, *logits.shape[2:])
        valid = mask > 0
        n_valids = masks.sum(axis=1)
        total = float(n_valids.sum())
        loss = float((np.asarray(losses) * n_valids).sum() / total)
        return classification_metrics(
            np.asarray(data["y"])[idx[valid]],
            logits[valid],
            loss,
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
    # best-model snapshot keeps BOTH partitions: the trainable weights AND
    # the non-trainable buffers (BatchNorm running stats) from the same
    # epoch — the reference deep-copies the full state_dict
    # (benchmark_classification/common_sde.py), and pairing best weights
    # with final-epoch BN stats measurably corrupts multiclass accuracy
    # (speech flagship: restored-model val 0.18 vs in-loop best 0.42
    # before this fix).
    best_state = partition(model)
    best_train_loss = np.inf
    best_train_acc = -np.inf
    best_train_loss_epoch = 0
    best_train_acc_epoch = 0
    history: List[Dict] = []
    n_steps = 0
    t_start = time.time()

    for epoch in range(cfg.max_epochs):
        epoch_gnorms = epoch_losses = None
        if cfg.scan_epoch:
            key, sub = jax.random.split(key)
            model, opt_state, nb, (epoch_losses, epoch_gnorms) = \
                run_epoch_scanned(model, opt_state, rng, sub, lr)
            n_steps += nb
        else:
            for batch, n_valid in iterate_batches(train_data,
                                                  cfg.batch_size, rng=rng):
                bs = next(iter(batch.values())).shape[0]
                mask = np.zeros(bs, np.float32)
                mask[:n_valid] = 1.0
                batch = dict(batch)
                batch["_mask"] = mask
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
            best_state = partition(model)

        metric = {
            "trainloss": train_m.loss,
            "valloss": val_m.loss,
            "valaccuracy": val_m.accuracy,
            "valauc": val_m.auroc if val_m.auroc is not None else val_m.accuracy,
        }.get(cfg.step_mode)
        if metric is not None:
            lr = sched.step(metric)

        rec = {"epoch": epoch, "lr": lr, "train": train_m.as_dict(),
               "val": val_m.as_dict()}
        if cfg.track_norms:
            if epoch_gnorms is not None:
                g = np.asarray(epoch_gnorms)
                rec["grad_norm_max"] = float(g.max())
                rec["grad_norm_mean"] = float(g.mean())
            if epoch_losses is not None:
                rec["train_loss_inmode"] = float(
                    np.asarray(epoch_losses).mean())
            rec["param_norms"] = _subtree_norms(model)
            rec["buffer_norms"] = _buffer_norms(model)
        history.append(rec)
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
    model = combine(*best_state)

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
