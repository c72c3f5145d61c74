"""K-seed-replica classifier training through one lane-packed solve.

The reference's dominant workload is repeats: 5 identical configs per grid
cell trained sequentially in their own processes
(/root/reference/benchmark_classification/sepsis-sde.py:70-83). Members
share the data; they differ only in init + training randomness. This
trainer runs all K replicas in ONE jitted epoch scan whose SDE solve is a
single lane-packed fused kernel (kernels/multi.py), while policy stays
per-member and faithful to the reference loop (common_sde.py:119-216):

  * per-member loss (masked mean over the batch) — summed, so each
    member's gradients are EXACTLY its solo gradients (params disjoint)
  * per-member optimizer state, per-member ReduceLROnPlateau learning
    rate (update scaling is applied per member subtree)
  * per-member best-model snapshot/restore + plateau termination; a
    terminated member's updates are masked to zero (its params freeze,
    its frozen best snapshot is what's restored) while the others train on
  * per-member metrics from one shared scanned eval
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.core import combine, filter_value_and_grad, partition
from .loop import (TrainConfig, FitResult, bce_with_logits_per_sample,
                   padded_index_grid, weight_regularization)
from .metrics import classification_metrics
from .schedule import ReduceLROnPlateau

__all__ = ["fit_classifier_ensemble"]


def freeze_inactive_rest(cls, K, active, old_m, new_m):
    """Per-member where-select of the non-param leaves (BatchNorm running
    stats) between the pre- and post-step model.

    Early-stopped members must freeze ENTIRELY: the solo trainers break
    out of the epoch loop, but a packed ensemble keeps running the shared
    train-mode forward for the still-active members, so an inactive
    member's running stats would keep drifting if taken from `new_m`
    unconditionally (its masked param updates alone don't stop that).
    Returns the `rest` tree to pass to combine()."""
    _, rest_new = partition(new_m)
    _, rest_old = partition(old_m)
    rest = rest_new
    for k in range(K):
        rk = jax.tree_util.tree_map(
            lambda nw, od: jnp.where(active[k] > 0, nw, od),
            cls.member_subtree(rest_new, k),
            cls.member_subtree(rest_old, k),
        )
        rest = cls.replace_member(rest, k, rk)
    return rest


def fit_classifier_ensemble(
    model,
    apply_fn: Callable,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    test_data: Optional[Dict[str, np.ndarray]],
    config: TrainConfig,
    member_grad_hook: Optional[Callable] = None,
) -> List[FitResult]:
    """Train all members of an ensemble model concurrently.

    model: exposes n_members, member_subtree(tree, k), replace_member
    (tree, k, sub), member_reg_subtree(member) (see
    models.ensemble.InitialValueSeedEnsemble).
    apply_fn(model, batch, key, train) -> (logits [K, B(, C)], new_model).
    member_grad_hook(member_grads) -> member_grads (e.g. the 100x readout
    hook) is applied to every member's gradient subtree.

    Returns one FitResult per member; each result's `model` is the full
    ensemble with THAT member restored to its best-val params (so
    `member_subtree(res[k].model, k)` is member k's best model).
    """
    cfg = config
    nc = cfg.num_classes
    K = model.n_members
    cls = type(model)

    def per_member_loss(logits, y, mask):
        # logits [K, B(,C)], y [B], mask [B] -> [K]
        if nc == 2:
            per = bce_with_logits_per_sample(logits, y[None],
                                             cfg.pos_weight)    # [K, B]
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(
                logp,
                jnp.broadcast_to(y[None, :, None],
                                 (K, y.shape[0], 1)).astype(jnp.int32),
                axis=-1,
            )[..., 0]                                           # [K, B]
        m = mask.astype(per.dtype)[None]
        return jnp.sum(per * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1),
                                                      1.0)

    def loss_fn(m, batch, key, train):
        logits, new_m = apply_fn(m, batch, key, train)
        member_losses = per_member_loss(
            logits, batch["y"], batch.get(
                "_mask", jnp.ones(batch["y"].shape[0]))
        )                                                        # [K]
        regs = jnp.stack([
            weight_regularization(
                cls.member_reg_subtree(cls.member_subtree(m, k)),
                cfg.reg_scaling)
            for k in range(K)
        ])
        member_losses = member_losses + regs
        # sum over members: params are disjoint, so each member's grads
        # are exactly what solo training would produce
        return jnp.sum(member_losses), (member_losses, logits, new_m)

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

    params0, _ = partition(model)
    opt_states = tuple(
        tx.init(cls.member_subtree(params0, k)) for k in range(K)
    )
    vg = filter_value_and_grad(loss_fn, has_aux=True)

    def _hook(g):
        return member_grad_hook(g) if member_grad_hook is not None else g

    n_train = next(iter(train_data.values())).shape[0]
    nb_train = max(1, -(-n_train // cfg.batch_size))
    device_train = {k: jnp.asarray(v) for k, v in train_data.items()}

    @jax.jit
    def epoch_step(m, opt_states, dtrain, perm, masks, keys, lrs, active):
        opt_states = list(opt_states)
        for k in range(K):
            opt_states[k].hyperparams["learning_rate"] = lrs[k]
        opt_states = tuple(opt_states)

        def body(carry, xs):
            mm, oss = carry
            idx, mask, kk = xs
            batch = {k2: v2[idx] for k2, v2 in dtrain.items()}
            batch["_mask"] = mask
            (_, (mlosses, _, new_m)), grads = vg(mm, batch, kk, True)
            p, _ = partition(new_m)
            # terminated members freeze completely (best snapshot already
            # taken): masked updates below for params, where-select for
            # the BN running stats
            rest = freeze_inactive_rest(cls, K, active, mm, new_m)
            new_oss = []
            for k in range(K):
                pk = cls.member_subtree(p, k)
                gk = _hook(cls.member_subtree(grads, k))
                upd, osk = tx.update(gk, oss[k], pk)
                upd = jax.tree_util.tree_map(
                    lambda u: u * active[k], upd)
                p = cls.replace_member(p, k, optax.apply_updates(pk, upd))
                new_oss.append(osk)
            return (combine(p, rest), tuple(new_oss)), mlosses

        (m, opt_states), mlosses = jax.lax.scan(
            body, (m, opt_states), (perm, masks, keys)
        )
        return m, opt_states, mlosses

    @jax.jit
    def eval_scan(m, ddata, perm, masks, keys):
        def body(_, xs):
            idx, mask, kk = xs
            batch = {k2: v2[idx] for k2, v2 in ddata.items()}
            batch["_mask"] = mask
            _, (mlosses, logits, _) = loss_fn(m, batch, kk, False)
            return None, (logits, mlosses)

        _, (logits, mlosses) = jax.lax.scan(body, None, (perm, masks, keys))
        return logits, mlosses

    _eval_cache = {}

    def _resident(data):
        ck = id(data)
        if ck not in _eval_cache:
            _eval_cache[ck] = (device_train if data is train_data else
                               {k: jnp.asarray(v) for k, v in data.items()})
        return _eval_cache[ck]

    def evaluate(m, data, key):
        ebs = cfg.eval_batch_size or cfg.batch_size
        n = next(iter(data.values())).shape[0]
        perm, masks, nb = padded_index_grid(np.arange(n), ebs)
        idx, mask = perm.reshape(-1), masks.reshape(-1)
        keys = jnp.stack(
            [jax.random.fold_in(key, i) for i in range(nb)]
        )
        logits, mlosses = eval_scan(m, _resident(data), perm, masks, keys)
        logits = np.asarray(logits)        # [nb, K, ebs, ...]
        mlosses = np.asarray(mlosses)      # [nb, K]
        valid = mask > 0
        n_valids = masks.sum(axis=1)
        total = float(n_valids.sum())
        y_true = np.asarray(data["y"])[idx[valid]]
        out = []
        for k in range(K):
            lo = logits[:, k].reshape(nb * ebs, *logits.shape[3:])[valid]
            loss = float((mlosses[:, k] * n_valids).sum() / total)
            out.append(classification_metrics(y_true, lo, loss, nc))
        return out

    scheds = [
        ReduceLROnPlateau(
            lr=cfg.lr,
            mode="min" if cfg.step_mode in ("trainloss", "valloss")
            else "max",
            patience=cfg.plateau_patience,
        )
        for _ in range(K)
    ]

    from ..nn.core import tree_count_params

    n_params = tree_count_params(model)
    key = jax.random.PRNGKey(cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    lrs = np.full(K, cfg.lr, np.float64)
    active = np.ones(K, np.float32)

    best_val_acc = np.full(K, -np.inf)
    # per-member FULL-state snapshots (weights + BatchNorm running stats
    # of the same epoch — the reference deep-copies the state_dict);
    # member_subtree works on any same-structured tree, so applying it to
    # the whole model captures the buffers too
    best_members = [cls.member_subtree(model, k) for k in range(K)]
    best_train_loss = np.full(K, np.inf)
    best_train_acc = np.full(K, -np.inf)
    best_tl_epoch = np.zeros(K, int)
    best_ta_epoch = np.zeros(K, int)
    terminated = np.zeros(K, bool)
    histories: List[List[Dict]] = [[] for _ in range(K)]
    n_steps = 0
    t_start = time.time()

    for epoch in range(cfg.max_epochs):
        perm, masks, _ = padded_index_grid(rng.permutation(n_train),
                                           cfg.batch_size)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, nb_train)
        model, opt_states, _ = epoch_step(
            model, opt_states, device_train, perm, masks, keys,
            jnp.asarray(lrs, jnp.float32), jnp.asarray(active)
        )
        n_steps += nb_train * int(active.sum())

        key, k1, k2 = jax.random.split(key, 3)
        train_ms = evaluate(model, train_data, k1)
        val_ms = evaluate(model, val_data, k2)

        for k in range(K):
            if terminated[k]:
                histories[k].append(histories[k][-1])
                continue
            tm, vm = train_ms[k], val_ms[k]
            if tm.loss * 1.0001 < best_train_loss[k]:
                best_train_loss[k] = tm.loss
                best_tl_epoch[k] = epoch
            if tm.accuracy > best_train_acc[k] * 1.001:
                best_train_acc[k] = tm.accuracy
                best_ta_epoch[k] = epoch
            if vm.accuracy > best_val_acc[k]:
                best_val_acc[k] = vm.accuracy
                best_members[k] = cls.member_subtree(model, k)
            metric = {
                "trainloss": tm.loss,
                "valloss": vm.loss,
                "valaccuracy": vm.accuracy,
                "valauc": vm.auroc if vm.auroc is not None
                else vm.accuracy,
            }.get(cfg.step_mode)
            if metric is not None:
                lrs[k] = scheds[k].step(metric)
            histories[k].append(
                {"epoch": epoch, "lr": float(lrs[k]),
                 "train": tm.as_dict(), "val": vm.as_dict()}
            )
            if (epoch > best_tl_epoch[k] + cfg.plateau_terminate
                    or epoch > best_ta_epoch[k] + cfg.plateau_terminate):
                terminated[k] = True
                active[k] = 0.0
        if cfg.verbose:
            accs = " ".join(f"{v.accuracy:.3f}" for v in val_ms)
            print(f"epoch {epoch}: val_acc [{accs}] "
                  f"active {int(active.sum())}/{K}", flush=True)
        if terminated.all():
            if cfg.verbose:
                print("early stop: all members plateaued", flush=True)
            break

    wall = time.time() - t_start

    # restore each member's best FULL snapshot into the shared ensemble
    for k in range(K):
        model = cls.replace_member(model, k, best_members[k])

    key, k1, k2, k3 = jax.random.split(key, 4)
    train_ms = evaluate(model, train_data, k1)
    val_ms = evaluate(model, val_data, k2)
    test_ms = (evaluate(model, test_data, k3)
               if test_data is not None else [None] * K)
    return [
        FitResult(
            model=model,
            history=histories[k],
            train_metrics=train_ms[k],
            val_metrics=val_ms[k],
            test_metrics=test_ms[k],
            wall_time=wall,
            steps_per_sec=n_steps / max(wall, 1e-9),
            parameters=n_params // K,
        )
        for k in range(K)
    ]
