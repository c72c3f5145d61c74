"""PersonActivity per-time-point classification harness.

Rebuilds /root/reference/benchmark_interpolation/crectime_attention_activity.py:
the mTAN recognition encoder runs over the observed (values ‖ mask, times),
emits a per-reference-point posterior (mu, logvar), k-IWAE-style latent
samples feed a 300-300 MLP classifier per time point, and the loss is
per-time-point cross entropy over the activity labels (classify_pertp,
crectime_attention_activity.py:80-135). Splits follow utils.get_activity_data
(80/20 test, then 80/20 val; 64/16/20 overall). Model selection tracks best
val loss; the matching test metrics are reported
(crectime_attention_activity.py:141-152).

The data pipeline is snsde.data.person_activity (UCI file parse when the
raw file is present, synthetic fallback otherwise — the no-egress
environment blocks the download).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.person_activity import NUM_CLASSES, synthetic_person_activity
from ..models.mtan import MTANEncoder
from ..nn.core import Module, combine, filter_value_and_grad, module, partition
from ..nn.layers import Linear
from ..train.loop import padded_index_grid

__all__ = ["ActivityConfig", "ActivityResult", "run_activity"]


@dataclass
class ActivityConfig:
    latent_dim: int = 32          # --latent-dim
    rec_hidden: int = 32          # --rec-hidden
    embed_time: int = 128         # --embed-time
    num_heads: int = 1
    k_iwae: int = 5
    lr: float = 1e-3
    # Linear LR warmup over the first N epochs (0 = reference-faithful
    # constant-lr Adam, crectime_attention_activity.py:89). The VAE
    # reparameterization noise makes the first ~100 optimizer steps a
    # high-variance regime where some inits lock into a
    # majority-segment-label optimum (seed 2 of the r5 K=5 run: stuck at
    # 0.31 for all 200 epochs while 4/5 seeds reach ~0.60); easing in the
    # step size is the standard fix and leaves the steady-state protocol
    # unchanged.
    warmup_epochs: int = 0
    batch_size: int = 128
    max_epochs: int = 30
    learn_emb: bool = True
    seed: int = 0
    data_seed: int = 0
    verbose: bool = True


@dataclass
class ActivityResult:
    test_accuracy: float
    test_loss: float
    val_accuracy: float
    val_loss: float
    history: list
    wall_time: float
    parameters: int


@module
class _ActivityModel(Module):
    """mTAN recognition encoder + per-time-point MLP classifier
    (crectime_attention_activity.py:64-86; the classifier is
    latent -> 300 -> 300 -> num_classes)."""

    rec: MTANEncoder
    fc1: Linear
    fc2: Linear
    fc3: Linear

    @staticmethod
    def create(key, input_dim, query, latent_dim, rec_hidden, embed_time,
               num_heads, num_classes, learn_emb):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        rec = MTANEncoder.create(k1, input_dim, query, latent_dim,
                                 rec_hidden, embed_time, num_heads,
                                 learn_emb=learn_emb)
        return _ActivityModel(
            rec=rec,
            fc1=Linear.create(k2, latent_dim, 300),
            fc2=Linear.create(k3, 300, 300),
            fc3=Linear.create(k4, 300, num_classes),
        )

    def __call__(self, x, tp, *, key, k_iwae: int):
        """x [B, L, 2D], tp [B, L] -> per-tp logits [k, B, Lq, C]."""
        out = self.rec(x, tp)                       # [B, Lq, 2*latent]
        latent = out.shape[-1] // 2
        mu, logvar = out[..., :latent], out[..., latent:]
        eps = jax.random.normal(key, (k_iwae,) + mu.shape, mu.dtype)
        z = eps * jnp.exp(0.5 * logvar) + mu        # [k, B, Lq, latent]
        h = jax.nn.relu(self.fc1(z))
        h = jax.nn.relu(self.fc2(h))
        return self.fc3(h)


def run_activity(cfg: ActivityConfig = ActivityConfig(), n: int = 512,
                 data: Optional[Dict] = None) -> ActivityResult:
    """Train the activity classifier; returns metrics at the best-val-loss
    epoch (the reference tracks best_val_loss and reports the paired test
    metrics, crectime_attention_activity.py:141-152)."""
    if data is None:
        vals, mask, tp, labels = synthetic_person_activity(
            n=n, seed=cfg.data_seed)
    else:
        vals, mask, tp, labels = (data["vals"], data["mask"], data["tp"],
                                  data["labels"])
    N, L, D = vals.shape
    num_classes = int(labels.max()) + 1 if data is not None else NUM_CLASSES

    # utils.get_activity_data splits: 80/20 test, then 80/20 val of train
    rng = np.random.default_rng(cfg.data_seed)
    perm = rng.permutation(N)
    n_test = N - int(0.8 * N)
    n_val = int(0.8 * N) - int(0.8 * 0.8 * N)
    te_idx = perm[:n_test]
    va_idx = perm[n_test:n_test + n_val]
    tr_idx = perm[n_test + n_val:]

    x_all = np.concatenate([vals, mask], axis=-1).astype(np.float32)
    sets = {
        name: {"x": x_all[ix], "tp": tp[ix].astype(np.float32),
               "y": labels[ix].astype(np.int32)}
        for name, ix in (("train", tr_idx), ("val", va_idx),
                         ("test", te_idx))
    }

    query = np.linspace(0.0, 1.0, L, dtype=np.float32)
    key = jax.random.PRNGKey(cfg.seed)
    key, km = jax.random.split(key)
    model = _ActivityModel.create(
        km, D, query, cfg.latent_dim, cfg.rec_hidden, cfg.embed_time,
        cfg.num_heads, num_classes, cfg.learn_emb)

    n_train = len(tr_idx)
    if cfg.warmup_epochs > 0:
        steps_per_epoch = -(-n_train // cfg.batch_size)
        sched = optax.linear_schedule(
            0.0, cfg.lr, cfg.warmup_epochs * steps_per_epoch)
        tx = optax.adam(sched)
    else:
        tx = optax.adam(cfg.lr)
    opt_state = tx.init(partition(model)[0])

    def loss_fn(m, batch, k):
        logits = m(batch["x"], batch["tp"], key=k, k_iwae=cfg.k_iwae)
        logp = jax.nn.log_softmax(logits, axis=-1)
        y = batch["y"]                                  # [B, L]
        ce = -jnp.take_along_axis(
            logp, jnp.broadcast_to(y[None, ..., None],
                                   logp.shape[:-1] + (1,)).astype(jnp.int32),
            axis=-1)[..., 0]                            # [k, B, L]
        bmask = batch["_mask"]                          # [B]
        per = ce.mean(axis=0).mean(axis=-1)             # [B]
        loss = jnp.sum(per * bmask) / jnp.maximum(bmask.sum(), 1.0)
        acc = jnp.sum(
            (logits.mean(axis=0).argmax(-1) == y).mean(axis=-1) * bmask
        ) / jnp.maximum(bmask.sum(), 1.0)
        return loss, acc

    vg = filter_value_and_grad(loss_fn, has_aux=True)

    dev = {name: {k: jnp.asarray(v) for k, v in s.items()}
           for name, s in sets.items()}

    @jax.jit
    def epoch_step(m, opt_state, dset, perm, masks, keys):
        def body(carry, xs):
            mm, os_ = carry
            idx, bm, k = xs
            batch = {kk: vv[idx] for kk, vv in dset.items()}
            batch["_mask"] = bm
            (loss, _), grads = vg(mm, batch, k)
            p, rest = partition(mm)
            updates, os2 = tx.update(grads, os_, p)
            return (combine(optax.apply_updates(p, updates), rest), os2), \
                loss
        (m, opt_state), losses = jax.lax.scan(body, (m, opt_state),
                                              (perm, masks, keys))
        return m, opt_state, losses

    @jax.jit
    def eval_scan(m, dset, perm, masks, keys):
        def body(_, xs):
            idx, bm, k = xs
            batch = {kk: vv[idx] for kk, vv in dset.items()}
            batch["_mask"] = bm
            loss, acc = loss_fn(m, batch, k)
            return None, (loss, acc, bm.sum())
        _, out = jax.lax.scan(body, None, (perm, masks, keys))
        return out

    def evaluate(m, name, k):
        n_s = sets[name]["y"].shape[0]
        perm, masks, nb = padded_index_grid(np.arange(n_s), cfg.batch_size)
        keys = jax.random.split(k, nb)
        losses, accs, ns = (np.asarray(a) for a in
                            eval_scan(m, dev[name], perm, masks, keys))
        tot = ns.sum()
        return float((losses * ns).sum() / tot), float((accs * ns).sum()
                                                       / tot)

    host_rng = np.random.default_rng(cfg.seed)
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(partition(model)[0])
                   if l is not None)

    best = {"val_loss": np.inf}
    history = []
    t0 = time.time()
    for epoch in range(cfg.max_epochs):
        perm, masks, nb = padded_index_grid(host_rng.permutation(n_train),
                                            cfg.batch_size)
        key, ke = jax.random.split(key)
        model, opt_state, losses = epoch_step(model, opt_state,
                                              dev["train"], perm, masks,
                                              jax.random.split(ke, nb))
        key, k1, k2 = jax.random.split(key, 3)
        val_loss, val_acc = evaluate(model, "val", k1)
        # "train_loss" feeds the trajectory pins' non-finite/spike/climb
        # checks (train/pins.py check_history) — without it only the
        # accuracy floor is live
        rec = {"epoch": epoch,
               "train_loss": float(np.asarray(losses).mean()),
               "val_loss": val_loss, "val_acc": val_acc}
        if val_loss < best["val_loss"]:
            test_loss, test_acc = evaluate(model, "test", k2)
            best = {"val_loss": val_loss, "val_acc": val_acc,
                    "test_loss": test_loss, "test_acc": test_acc}
            rec.update(test_loss=test_loss, test_acc=test_acc)
        history.append(rec)
        if cfg.verbose:
            print(f"epoch {epoch}: val_loss {val_loss:.3f} "
                  f"val_acc {val_acc:.3f}", flush=True)

    return ActivityResult(
        test_accuracy=best.get("test_acc", 0.0),
        test_loss=best.get("test_loss", np.inf),
        val_accuracy=best.get("val_acc", 0.0),
        val_loss=best["val_loss"],
        history=history,
        wall_time=time.time() - t0,
        parameters=n_params,
    )
