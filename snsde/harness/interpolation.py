"""Interpolation harness: mTAN-style VAE with an SDE encoder (IWAE).

Rebuilds /root/reference/benchmark_interpolation/sde_interpolation.py:98-238
+ utils.py:34-114:
  * scatter subsampled observations onto a `num_ref_points` reference grid
    (idx = round(tp * num_ref) - 1, sde_interpolation.py:173-179)
  * hermite coeffs over [t ‖ X] -> stream SDE encoder -> linear ->
    (mu, logvar) per reference point
  * reparameterize k_iwae draws, decode at observation times
    (dec_mtan_rnn / dec_rnn3)
  * IWAE objective: -(logsumexp(logpx - kl_coef*KL) - log k), Gaussian
    likelihood with fixed noise std, analytic KL to N(0,1), KL annealing
    kl_coef = 1 - 0.99^(itr-10)
  * masked-MSE evaluation over decoder-mean predictions
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..fields import DiffusionField
from ..models.mtan import DecRNN3, MTANDecoder
from ..models.neuralsde import NeuralSDEStream
from ..nn.core import Module, combine, filter_value_and_grad, module, partition
from ..nn.layers import Linear
from ..ops.interp import hermite_cubic_coeffs
from ..train.schedule import CosineAnnealingLR
from .classification import parse_model_name

__all__ = ["InterpolationConfig", "run_interpolation",
           "synthetic_physionet"]


def synthetic_physionet(n: int = 1024, length: int = 64, dim: int = 12,
                        observe_rate: float = 0.35, seed: int = 0):
    """PhysioNet-2012-shaped: values on a union grid with sparse observation
    masks (reference physionet.py quantizes to a union grid the same way)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, length, dtype=np.float32)
    freqs = rng.uniform(0.5, 3.0, (n, dim)).astype(np.float32)
    phases = rng.uniform(0, 2 * np.pi, (n, dim)).astype(np.float32)
    vals = 0.5 + 0.4 * np.sin(
        2 * np.pi * freqs[:, None, :] * t[None, :, None] + phases[:, None, :]
    )
    vals += 0.02 * rng.normal(size=vals.shape)
    mask = (rng.random((n, length, dim)) < observe_rate).astype(np.float32)
    # ensure at least one observation per sample
    mask[:, 0, 0] = 1.0
    data = (vals * mask).astype(np.float32)
    tp = np.broadcast_to(t, (n, length)).copy()
    return data, mask, tp


@dataclass
class InterpolationConfig:
    enc: str = "neuralsde_0_18"
    dec: str = "mtan_rnn"            # mtan_rnn | rnn3
    latent_dim: int = 16
    rec_hidden: int = 32
    rec_num_hidden: int = 1          # reference --rec-num-hidden (1..4)
    gen_hidden: int = 50
    num_ref_points: int = 64
    k_iwae: int = 5
    std: float = 0.01
    niters: int = 100
    lr: float = 1e-3
    batch_size: int = 64
    sample_tp: float = 0.5
    use_kl: bool = True
    seed: int = 0
    verbose: bool = True
    save_dir: Optional[str] = None       # checkpoint every 20 iters
    resume: bool = False


@module
class _Recognition(Module):
    """SDE stream encoder + linear head -> (mu, logvar) per ref point."""

    sde: NeuralSDEStream
    head: Linear

    @staticmethod
    def create(key, enc_name, input_dim, hidden, latent_dim, num_ref,
               num_hidden: int = 1):
        io, no = parse_model_name(enc_name)
        k1, k2, k3 = jax.random.split(key, 3)
        field = DiffusionField.create(
            k1, input_dim + 1, hidden, hidden, num_hidden,
            input_option=io, noise_option=no,
        )
        sde = NeuralSDEStream.create(k2, field, input_dim + 1, hidden,
                                     hidden, method="euler")
        return _Recognition(
            sde=sde, head=Linear.create(k3, hidden, 2 * latent_dim)
        )

    def __call__(self, times_ref, coeffs, *, key):
        out, stream = self.sde(times_ref, coeffs, key=key)
        return self.head(stream)                     # [B, Lref, 2*latent]


def _gaussian_logpdf(x, mean, std):
    c = -0.5 * math.log(2 * math.pi)
    return c - math.log(std) - 0.5 * ((x - mean) / std) ** 2


def run_interpolation(cfg: InterpolationConfig = InterpolationConfig(),
                      n: int = 1024,
                      data_fn: Callable = synthetic_physionet) -> Dict:
    data, mask, tp = data_fn(n=n, seed=cfg.seed)
    B_total, L, D = data.shape
    n_tr = int(0.8 * B_total)
    train = {"x": data[:n_tr], "m": mask[:n_tr], "tp": tp[:n_tr]}
    test = {"x": data[n_tr:], "m": mask[n_tr:], "tp": tp[n_tr:]}

    Lref = cfg.num_ref_points
    times_ref = np.linspace(0.0, 1.0, Lref, dtype=np.float32)

    key = jax.random.PRNGKey(cfg.seed)
    k1, k2 = jax.random.split(key)
    rec = _Recognition.create(k1, cfg.enc, D, cfg.rec_hidden,
                              cfg.latent_dim, Lref,
                              num_hidden=cfg.rec_num_hidden)
    query = jnp.linspace(0.0, 1.0, Lref)
    if cfg.dec == "mtan_rnn":
        dec = MTANDecoder.create(k2, D, query, cfg.latent_dim,
                                 cfg.gen_hidden, embed_time=128,
                                 learn_emb=True)
    else:
        dec = DecRNN3.create(k2, D, query, cfg.latent_dim, cfg.gen_hidden)

    @module
    class VAE(Module):
        rec: _Recognition
        dec: Module

    model = VAE(rec=rec, dec=dec)

    def scatter_to_ref(x, m, tp, key, sample_tp):
        """Subsample observed points then scatter onto the ref grid
        (sde_interpolation.py:173-179)."""
        if sample_tp and sample_tp < 1.0:
            keep = jax.random.bernoulli(key, sample_tp, m.shape)
            m_sub = m * keep
        else:
            m_sub = m
        x_sub = x * m_sub
        # round(tp * num_ref) - 1, the reference's bucket indexing
        # (sde_interpolation.py:173-179) — rounding, not truncation.
        idx = jnp.clip(
            jnp.round(tp * Lref).astype(jnp.int32) - 1, 0, Lref - 1
        )                                             # [B, L]
        Bc = x.shape[0]
        formatted_x = jnp.zeros((Bc, Lref, D), x.dtype)
        formatted_m = jnp.zeros((Bc, Lref, D), x.dtype)
        bidx = jnp.arange(Bc)[:, None]
        formatted_x = formatted_x.at[bidx, idx].set(x_sub)
        formatted_m = formatted_m.at[bidx, idx].set(m_sub)
        return formatted_x, formatted_m

    def elbo_loss(model, batch, key, kl_coef, smask=None):
        """`smask` [B] masks padded wrap-around samples (device-resident
        epochs pad the final batch to a fixed shape; padded duplicates must
        not contribute to the loss — same policy as train/loop.py)."""
        x, m, tp = batch["x"], batch["m"], batch["tp"]
        Bc = x.shape[0]
        if smask is None:
            smask = jnp.ones((Bc,), x.dtype)
        ks, kc, ke = jax.random.split(key, 3)
        fx, fm = scatter_to_ref(x, m, tp, ks, cfg.sample_tp)
        # hermite coeffs over [t ‖ X] on the ref grid
        tcol = jnp.broadcast_to(
            jnp.asarray(times_ref)[None, :, None], (Bc, Lref, 1)
        )
        vals = jnp.concatenate([tcol, fx], axis=-1)
        coeffs = hermite_cubic_coeffs(jnp.asarray(times_ref), vals)
        out = model.rec(times_ref, coeffs, key=kc)     # [B, Lref, 2*latent]
        qz_mean = out[..., : cfg.latent_dim]
        qz_logvar = out[..., cfg.latent_dim :]
        eps = jax.random.normal(
            ke, (cfg.k_iwae,) + qz_mean.shape, qz_mean.dtype
        )
        z0 = qz_mean[None] + eps * jnp.exp(0.5 * qz_logvar[None])
        z0_flat = z0.reshape((-1,) + z0.shape[2:])     # [k*B, Lref, latent]
        tp_rep = jnp.tile(tp, (cfg.k_iwae, 1))
        pred = model.dec(z0_flat, tp_rep)              # [k*B, L, D]
        pred = pred.reshape((cfg.k_iwae, Bc) + pred.shape[1:])
        # observed-entry Gaussian log-likelihood, summed per sample
        logpx = jnp.sum(
            _gaussian_logpdf(x[None], pred, cfg.std) * m[None],
            axis=(-1, -2),
        )                                              # [k, B]
        # analytic KL(q || N(0,1)) summed per sample
        kl = 0.5 * jnp.sum(
            jnp.exp(qz_logvar) + qz_mean**2 - 1.0 - qz_logvar, axis=(-1, -2)
        )                                              # [B]
        iwae = jax.nn.logsumexp(logpx - kl_coef * kl[None], axis=0) - \
            math.log(cfg.k_iwae)
        nvalid = jnp.maximum(jnp.sum(smask), 1.0)
        loss = -jnp.sum(iwae * smask) / nvalid
        # masked-MSE pieces as (numerator, denominator) sums so the host can
        # aggregate exactly across padded batches
        obs_w = m * smask[:, None, None]
        mse_num = jnp.sum((jnp.mean(pred, axis=0) - x) ** 2 * obs_w)
        mse_den = jnp.sum(obs_w)
        return loss, (jnp.sum(jnp.mean(logpx, axis=0) * smask) / nvalid,
                      jnp.sum(kl * smask) / nvalid, mse_num, mse_den)

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    params, _ = partition(model)
    opt_state = tx.init(params)
    vg = filter_value_and_grad(elbo_loss, has_aux=True)

    # Device-resident epochs (CLAUDE.md / sepsis-loop lesson): the dataset
    # is uploaded ONCE and passed as a jit ARG; each iteration ships only an
    # [nb, B] index grid + sample mask + per-batch keys, and all batch
    # steps run inside one lax.scan — one host dispatch per iteration
    # instead of one per batch (the remote runtime costs ~1-2 ms/dispatch).
    @jax.jit
    def epoch_scan(model, opt_state, dtrain, perm, smasks, keys, kl_coef,
                   lr):
        opt_state.hyperparams["learning_rate"] = lr

        def body(carry, xs):
            m_, os_ = carry
            idx, smask, k = xs
            batch = {kk: vv[idx] for kk, vv in dtrain.items()}
            (loss, aux), grads = vg(m_, batch, k, kl_coef, smask)
            p, rest = partition(m_)
            updates, os2 = tx.update(grads, os_, p)
            return (combine(optax.apply_updates(p, updates), rest), os2), \
                (loss, aux[0], aux[1])

        (model, opt_state), (losses, logpxs, kls) = jax.lax.scan(
            body, (model, opt_state), (perm, smasks, keys)
        )
        return model, opt_state, losses, logpxs, kls

    @jax.jit
    def eval_scan(model, ddata, perm, smasks, keys):
        def body(_, xs):
            idx, smask, k = xs
            batch = {kk: vv[idx] for kk, vv in ddata.items()}
            _, (_, _, num, den) = elbo_loss(model, batch, k, 1.0, smask)
            return None, (num, den)

        _, (nums, dens) = jax.lax.scan(body, None, (perm, smasks, keys))
        return jnp.sum(nums), jnp.sum(dens)

    def _index_grid(n, bs, rng=None):
        """Shuffled (or sequential) padded index grid + sample masks."""
        from ..train.loop import padded_index_grid

        idx = rng.permutation(n) if rng is not None else np.arange(n)
        return padded_index_grid(idx, bs)

    device_train = {k: jnp.asarray(v) for k, v in train.items()}
    device_test = {k: jnp.asarray(v) for k, v in test.items()}

    sched = CosineAnnealingLR(lr=cfg.lr, t_max=10, eta_min=1e-5)
    lr = cfg.lr
    history = []
    start_itr = 1
    if cfg.save_dir and cfg.resume:
        from ..train.checkpoint import latest_step, load_checkpoint

        if latest_step(cfg.save_dir) is not None:
            loaded, step0 = load_checkpoint(
                cfg.save_dir, {"model": model, "opt_state": opt_state}
            )
            model, opt_state = loaded["model"], loaded["opt_state"]
            start_itr = step0 + 1
            # Deterministic schedule resume: re-advance the cosine schedule
            # to where the uninterrupted run would be (its state is a pure
            # function of the iteration count).
            for _ in range(start_itr - 1):
                lr = sched.step()
    base_key = key
    import time as _time
    t_start = _time.time()
    for itr in range(start_itr, cfg.niters + 1):
        # Per-iteration randomness is a pure function of (seed, itr) — batch
        # shuffling and JAX keys replay identically across resume, so a
        # resumed run reproduces the uninterrupted one exactly.
        rng = np.random.default_rng([cfg.seed, itr])
        key = jax.random.fold_in(base_key, itr)
        if cfg.use_kl:
            kl_coef = 0.0 if itr < 10 else 1 - 0.99 ** (itr - 10)
        else:
            kl_coef = 1.0
        perm, smasks, nb = _index_grid(n_tr, cfg.batch_size, rng)
        keys = jax.random.split(key, nb)
        model, opt_state, losses, logpxs, kls = epoch_scan(
            model, opt_state, device_train, perm, smasks, keys,
            jnp.asarray(kl_coef, jnp.float32), jnp.asarray(lr)
        )
        nvs = smasks.sum(axis=1)
        tot = float((np.asarray(losses) * nvs).sum())
        totn = float(nvs.sum())
        lr = sched.step()
        history.append({"iter": itr, "elbo": -tot / totn,
                        "logpx": float((np.asarray(logpxs) * nvs).sum()
                                       / totn),
                        "kl": float((np.asarray(kls) * nvs).sum() / totn),
                        "kl_coef": kl_coef})
        if cfg.save_dir and itr % 20 == 0:
            from ..train.checkpoint import save_checkpoint

            save_checkpoint(cfg.save_dir, itr, model=model,
                            opt_state=opt_state)
        if cfg.verbose and itr % 10 == 0:
            print(f"iter {itr}: avg loss {tot/totn:.4f} "
                  f"kl_coef {kl_coef:.3f} "
                  f"[{_time.time()-t_start:.0f}s]", flush=True)

    # final masked-MSE on test (device-resident scanned eval)
    n_te = next(iter(test.values())).shape[0]
    perm, smasks, nb = _index_grid(n_te, cfg.batch_size)
    keys = jax.random.split(jax.random.fold_in(base_key, cfg.niters + 1),
                            nb)
    num, den = eval_scan(model, device_test, perm, smasks, keys)
    wall = _time.time() - t_start
    return {"model": model, "history": history,
            "test_mse": float(num) / max(float(den), 1.0),
            "wall_time": wall}
