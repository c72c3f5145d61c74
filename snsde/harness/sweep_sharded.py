"""Mesh-sharded sweep cells — device-parallel independent training runs.

The reference parallelizes its robustness sweep at the OS level: one
process per seed, pinned to its own GPU (`torch-ists/model_run.py` is
launched once per seed; `run.sh` fans processes across devices). The
TPU-native equivalent is one jitted SPMD program where each device on a
`cells` mesh axis trains its own (missing_rate, seed) cell of the same
registry model config via `jax.shard_map`: cells are independent, so the
program carries ZERO collectives and scales linearly over ICI. This is
orthogonal to lane packing (`kernels/multi.py` packs K seeds into MXU
lanes WITHIN a device) and — unlike lane packing, which needs the fused
SDE kernels — works for EVERY registry family (RNNs, NCDEs, flows,
attention, ...), because the per-device program is exactly the
single-model program.

Faithful to `harness.robustness.train_ists_model` to the draw: identical
per-cell batch shuffling (`np.random.default_rng(0)`, wrap-around final
batch), identical key-split chain (one split per batch, one per epoch
eval), StepLR(10, 0.5), patience early stop on val accuracy with
best-model restore, 100x fc2 grad hook, grad-clip 10. Cells that stop
early are frozen in place by a per-epoch select (and stop consuming
keys), so the sharded sweep reproduces the sequential sweep's results
exactly — see tests/test_sweep_sharded.py.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..data.common import stratified_split
from ..data.synthetic import synthetic_uea
from ..nn.core import combine, filter_value_and_grad, partition
from ..parallel.mesh import make_mesh
from ..train.loop import readout_grad_hook, softmax_cross_entropy
from ..train.metrics import classification_metrics
from ..train.schedule import StepLR as StepLRSched
from .robustness import (ISTSClassifier, coeff_family, predict_ists,
                         preprocess_ists)

__all__ = ["train_ists_cells_sharded", "run_robustness_sweep_sharded",
           "extract_cell"]


def _stack_trees(trees):
    """Stack array leaves of same-treedef module pytrees along axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def extract_cell(stacked, c: int):
    """Pull cell c's pytree out of a cells-stacked pytree."""
    return jax.tree_util.tree_map(lambda a: a[c], stacked)


def _squeeze0(tree):
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _expand0(tree):
    return jax.tree_util.tree_map(lambda a: a[None], tree)


def _eval_grid(split_idx: np.ndarray, batch_size: int):
    """Natural-order batch grid with iterate_batches' wrap-around padding:
    [nb, B] rows of FULL-array indices plus the final batch's valid
    count."""
    from ..train.loop import padded_index_grid

    idx = np.asarray(split_idx)
    n = idx.shape[0]
    pos, _, nb = padded_index_grid(np.arange(n), batch_size)
    nv_last = n - (nb - 1) * batch_size
    return idx[pos.reshape(-1)].reshape(nb, batch_size).astype(np.int32), \
        nv_last


def train_ists_cells_sharded(
    model_name: str,
    X: np.ndarray,
    y: np.ndarray,
    cells: Sequence[Tuple[float, int]],
    *,
    mesh=None,
    hidden_dim: int = 16,
    lr: float = 1e-3,
    batch_size: int = 64,
    max_epochs: int = 30,
    patience: int = 10,
    kl_weight: float = 1e-4,
    method: Optional[str] = None,
    interpolation: Optional[str] = None,
    verbose: bool = False,
    datas: Optional[List[Dict]] = None,
):
    """Train one registry model config on D (missing_rate, seed) cells,
    one cell per device of `mesh`'s first axis, in one SPMD program.

    cells: list of (missing_rate, seed); padded by repetition to the mesh
    size (padded results are dropped). The seed drives the split AND the
    missingness draw and the model init, exactly as in the sequential
    sweep. `datas` optionally supplies pre-computed `preprocess_ists`
    dicts (one per cell, same order).

    Returns (stacked_model, [per-cell test ClassificationMetrics],
    info dict). Per-cell models come out via `extract_cell`.
    """
    mesh = mesh if mesh is not None else make_mesh(("cells",))
    axis = mesh.axis_names[0]
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    real = len(cells)
    if real == 0:
        return None, [], {"devices": D, "cells": []}
    assert real <= D, f"{real} cells > {D} devices; chunk the cells first"
    cells_p = list(cells) + [cells[-1]] * (D - real)

    yi = np.asarray(y).ravel().astype(np.int64)
    num_classes = int(yi.max()) + 1
    N, L, C = X.shape

    if datas is None:
        cache: Dict = {}
        datas = []
        for r, s in cells_p:
            if (r, s) not in cache:
                cache[(r, s)] = preprocess_ists(
                    X, missing_rate=r, seed=s,
                    interpolation=interpolation
                    or coeff_family(model_name))
            datas.append(cache[(r, s)])
    else:
        datas = list(datas) + [datas[-1]] * (D - real)
    splits = [stratified_split(yi, seed=s) for _, s in cells_p]

    n_tr = len(splits[0][0])
    for sp in splits:
        assert len(sp[0]) == n_tr, "stratified splits are equal-size"
    nb = max(1, -(-n_tr // batch_size))

    models = [
        ISTSClassifier.create(jax.random.PRNGKey(s), model_name, C, L,
                              hidden_dim, num_classes, method=method)
        for _, s in cells_p
    ]
    m_stk = _stack_trees(models)
    seqs = jnp.asarray(np.stack([d["seq"] for d in datas]))
    coeffs = jnp.asarray(np.stack([d["coeffs"] for d in datas]))
    ylab = jnp.asarray(yi)

    def loss_fn(m, batch, key, train):
        logits, new_m, aux = m(batch["seq"], batch["coeffs"], key=key,
                               train=train)
        loss = softmax_cross_entropy(logits, batch["y"])
        if aux is not None:  # latentsde KL
            loss = loss + kl_weight * aux
        return loss, (logits, new_m)

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(learning_rate),
        )
    )(learning_rate=lr)
    opt_stk = _stack_trees(
        [tx.init(partition(m)[0]) for m in models])
    vg = filter_value_and_grad(loss_fn, has_aux=True)
    grad_hook = readout_grad_hook("fc2")

    Pc, Pr = P(axis), P()

    def _epoch_body(m_s, o_s, seq_s, co_s, yl, perm_s, bkeys_s, lr_val,
                    act_s):
        m, opt = _squeeze0(m_s), _squeeze0(o_s)
        seq, co = seq_s[0], co_s[0]
        perm, bkeys, act = perm_s[0], bkeys_s[0], act_s[0]
        opt.hyperparams["learning_rate"] = lr_val

        def bstep(carry, xs):
            mm, oss = carry
            bidx, kk = xs
            batch = {"seq": seq[bidx], "coeffs": co[bidx], "y": yl[bidx]}
            (loss, (_, new_m)), grads = vg(mm, batch, kk, True)
            grads = grad_hook(grads)
            p, rest = partition(new_m)
            upd, oss = tx.update(grads, oss, p)
            return (combine(optax.apply_updates(p, upd), rest), oss), loss

        (m_new, opt_new), losses = jax.lax.scan(bstep, (m, opt),
                                                (perm, bkeys))
        # freeze early-stopped cells in place (matches the sequential
        # trainer, which simply exits their loop); act is a SCALAR here
        # (per-device shard (1,) indexed above), so where() preserves
        # every leaf's shape — no () -> (1,) broadcast of scalar
        # opt-state leaves between epochs
        sel = lambda nw, od: jnp.where(act > 0, nw, od)
        m_fin = jax.tree_util.tree_map(sel, m_new, m)
        o_fin = jax.tree_util.tree_map(sel, opt_new, opt)
        return _expand0(m_fin), _expand0(o_fin), losses[None]

    def _eval_body(m_s, seq_s, co_s, yl, perm_s, keys_s):
        m = _squeeze0(m_s)
        seq, co, perm, keys = seq_s[0], co_s[0], perm_s[0], keys_s[0]

        def bstep(_, xs):
            bidx, kk = xs
            batch = {"seq": seq[bidx], "coeffs": co[bidx], "y": yl[bidx]}
            loss, (logits, _) = loss_fn(m, batch, kk, False)
            return None, (logits, loss)

        _, (logits, losses) = jax.lax.scan(bstep, None, (perm, keys))
        return logits[None], losses[None]

    # check_vma off: the cell programs are collective-free by design, and
    # the strict varying-axis check rejects ordinary library code (zeros
    # scan carries) that never leaves the device.
    epoch_sharded = jax.jit(jax.shard_map(
        _epoch_body, mesh=mesh,
        in_specs=(Pc, Pc, Pc, Pc, Pr, Pc, Pc, Pr, Pc),
        out_specs=(Pc, Pc, Pc), check_vma=False))
    eval_sharded = jax.jit(jax.shard_map(
        _eval_body, mesh=mesh,
        in_specs=(Pc, Pc, Pc, Pr, Pc, Pc),
        out_specs=(Pc, Pc), check_vma=False))

    # one split per batch, exactly train_ists_model's chain
    @jax.jit
    def _chain(keys):
        def step(k, _):
            k, sub = jax.random.split(k)
            return k, sub
        return jax.vmap(lambda k: jax.lax.scan(step, k, None, length=nb))(
            keys)

    split1 = jax.jit(jax.vmap(lambda k: tuple(jax.random.split(k))))
    foldn = jax.jit(jax.vmap(
        lambda k, n_: jax.vmap(lambda i: jax.random.fold_in(k, i))(
            jnp.arange(n_)), in_axes=(0, None)), static_argnums=1)

    def _metrics(logits, losses, grid, nv_last, n_items):
        """Host-side trim + per-cell metrics, matching
        train_ists_model.evaluate's nv weighting."""
        out = []
        nbE, B = grid[0].shape
        weights = np.full(nbE, float(batch_size))
        weights[-1] = float(nv_last)
        for c in range(n_items):
            lo = np.asarray(logits[c])            # [nb, B, C]
            rows = [lo[i][: (B if i < nbE - 1 else nv_last)]
                    for i in range(nbE)]
            idx = [grid[c][i][: (B if i < nbE - 1 else nv_last)]
                   for i in range(nbE)]
            loss = float((np.asarray(losses[c]) * weights).sum()
                         / weights.sum())
            out.append(classification_metrics(
                yi[np.concatenate(idx)], np.concatenate(rows), loss,
                num_classes))
        return out

    # per-cell host state, mirroring the sequential loop
    rngs = [np.random.default_rng(0) for _ in range(D)]
    hkeys = np.stack([np.asarray(jax.random.PRNGKey(s))
                      for _, s in cells_p])
    sched = StepLRSched(lr=lr, step_size=10, gamma=0.5)
    lr_val = lr
    best_val = np.full(D, -np.inf)
    # per-cell FULL-state snapshots (weights + BatchNorm running stats of
    # the same epoch), matching the sequential trainer's best-restore
    best_cells = [extract_cell(m_stk, c) for c in range(D)]
    stale = np.zeros(D, int)
    active = np.ones(D, np.float32)
    terminated = np.zeros(D, bool)
    term_keys = np.zeros_like(hkeys)

    va_grid = [_eval_grid(sp[1], batch_size) for sp in splits]
    nv_va = va_grid[0][1]
    va_perm = jnp.asarray(np.stack([g for g, _ in va_grid]))
    nb_va = va_perm.shape[1]

    for epoch in range(max_epochs):
        perm = np.empty((D, nb, batch_size), np.int32)
        for c in range(D):
            from ..train.loop import padded_index_grid

            pos, _, _ = padded_index_grid(rngs[c].permutation(n_tr),
                                          batch_size)
            perm[c] = splits[c][0][pos.reshape(-1)].reshape(nb, batch_size)
        nk, bkeys = _chain(jnp.asarray(hkeys))
        m_stk, opt_stk, _ = epoch_sharded(
            m_stk, opt_stk, seqs, coeffs, ylab, jnp.asarray(perm), bkeys,
            jnp.asarray(lr_val), jnp.asarray(active))
        lr_val = sched.step()
        nk2, ek = split1(nk)
        vkeys = foldn(ek, nb_va)
        logits, losses = eval_sharded(m_stk, seqs, coeffs, ylab, va_perm,
                                      vkeys)
        val_ms = _metrics(logits, losses, [g for g, _ in va_grid], nv_va,
                          D)
        nk2 = np.asarray(nk2)
        for c in range(D):
            if terminated[c]:
                continue
            hkeys[c] = nk2[c]  # advance the chain only while active
            if val_ms[c].accuracy > best_val[c]:
                best_val[c] = val_ms[c].accuracy
                best_cells[c] = extract_cell(m_stk, c)
                stale[c] = 0
            else:
                stale[c] += 1
                if stale[c] >= patience:
                    terminated[c] = True
                    active[c] = 0.0
                    term_keys[c] = hkeys[c]
        if verbose:
            accs = " ".join(f"{v.accuracy:.3f}" for v in val_ms)
            print(f"  epoch {epoch}: val acc [{accs}]", flush=True)
        if terminated.all():
            break
    for c in range(D):
        if not terminated[c]:
            term_keys[c] = hkeys[c]

    # best-model restore: full per-cell state (the sequential trainer
    # restores weights AND BatchNorm buffers from the best epoch)
    m_stk = _stack_trees(best_cells)

    te_grid = [_eval_grid(sp[2], batch_size) for sp in splits]
    nv_te = te_grid[0][1]
    te_perm = jnp.asarray(np.stack([g for g, _ in te_grid]))
    _, tk = split1(jnp.asarray(term_keys))
    tkeys = foldn(tk, te_perm.shape[1])
    logits, losses = eval_sharded(m_stk, seqs, coeffs, ylab, te_perm,
                                  tkeys)
    test_ms = _metrics(logits, losses, [g for g, _ in te_grid], nv_te, D)
    return m_stk, test_ms[:real], {
        "devices": D, "cells": cells_p, "datas": datas, "splits": splits,
    }


def run_robustness_sweep_sharded(
    cfg=None, n: int = 256, data_fn=synthetic_uea,
    dataset_name: str = "synthetic_uea", mesh=None, verbose: bool = True,
) -> List[Dict]:
    """`run_robustness_sweep` with the (rate × seed) cells of each model
    distributed over the device mesh: same JSON records, same
    skip-if-exists resume, `"cells_sharded": D` recorded per run. Cells
    are chunked to the mesh size; each chunk is one SPMD training run."""
    from .robustness import SweepConfig

    cfg = cfg if cfg is not None else SweepConfig()
    mesh = mesh if mesh is not None else make_mesh(("cells",))
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    X, y, _ = data_fn(n=n)
    results: List[Dict] = []

    def _write(rec, out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(rec, f)
        results.append(rec)
        if verbose:
            print(rec, flush=True)

    for model_name in cfg.models:
        pending = []
        for rate in cfg.missing_rates:
            for seed in cfg.seeds:
                out_path = os.path.join(
                    cfg.out_dir, dataset_name, str(int(rate * 100)),
                    f"{model_name}_{seed}.json")
                if os.path.exists(out_path):            # resume
                    with open(out_path) as f:
                        results.append(json.load(f))
                    continue
                pending.append((rate, seed, out_path))
        for i in range(0, len(pending), D):
            chunk = pending[i:i + D]
            cells = [(r, s) for r, s, _ in chunk]
            t0 = time.time()
            try:
                m_stk, test_ms, info = train_ists_cells_sharded(
                    model_name, X, y, cells, mesh=mesh,
                    hidden_dim=cfg.hidden_dim, lr=cfg.lr,
                    batch_size=cfg.batch_size, max_epochs=cfg.max_epochs,
                    patience=cfg.patience, kl_weight=cfg.kl_weight,
                    method=cfg.method)
                wall = (time.time() - t0) / len(chunk)
                for c, ((rate, seed, out_path), tm) in enumerate(
                        zip(chunk, test_ms)):
                    if cfg.save_preds:
                        yt, yp, lo = predict_ists(
                            extract_cell(m_stk, c), info["datas"][c], y,
                            info["splits"][c][2], cfg.batch_size)
                        os.makedirs(os.path.dirname(out_path),
                                    exist_ok=True)
                        np.savez(out_path[:-5] + ".npz", y_true=yt,
                                 y_pred=yp, logits=lo)
                    _write({
                        "dataset": dataset_name, "missing_rate": rate,
                        "model": model_name, "seed": seed,
                        "accuracy": float(tm.accuracy),
                        "f1_weighted": float(tm.f1_weighted),
                        "wall_time": wall,
                        "cells_sharded": len(chunk),
                    }, out_path)
            except Exception as e:  # blanket skip, as model_run.py
                for rate, seed, out_path in chunk:
                    _write({
                        "dataset": dataset_name, "missing_rate": rate,
                        "model": model_name, "seed": seed,
                        "error": repr(e),
                    }, out_path)
    return results
