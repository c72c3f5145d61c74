"""TPU triage for the round-4 bench_cde gruode_rk4 scan-arm NaN.

The CPU repro (exact f32) converges smoothly (loss 0.675 -> 0.673,
gnorm ~0.15 over 30 iters), so the non-finite losses the scan arm hit
on v5e (/tmp/r4/bench_cde_r2.log) are hardware-specific. This probe
separates the candidate causes on the TPU itself:

  a) forward-only loss at init        -> broken scan compile
  b) loss/gnorm trace over 30 iters   -> training-dynamics divergence
  c) same under default_matmul_precision('highest')
                                      -> platform bf16-operand rounding

Usage: PYTHONPATH=/root/repo python tools/probe_gruode_nan.py
"""
import os

os.environ["SNSDE_NO_FUSED"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import optax

from snsde.models.neuralcde import GRUODEField, NeuralCDE
from snsde.nn.core import combine, filter_value_and_grad, partition
from snsde.ops.interp import hermite_cubic_coeffs
from snsde.train.loop import bce_with_logits

B, L, C, H = 1024, 72, 6, 32
iters = 30

key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
times = np.arange(L, dtype=np.float32)
X = rng.normal(size=(B, L, C - 1)).astype(np.float32)
tchan = np.broadcast_to(times[None, :, None], (B, L, 1))
Xa = np.concatenate([tchan, X], axis=-1)
coeffs = jnp.asarray(np.asarray(
    hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(Xa))))
y = jnp.asarray((rng.random(B) < 0.3).astype(np.float32))
final_index = jnp.full((B,), L - 1, jnp.int32)

func = GRUODEField.create(jax.random.fold_in(key, 1), C, H)
model = NeuralCDE.create(jax.random.fold_in(key, 2), func, C, H, 1,
                         method="rk4")


def loss_fn(m, coeffs, y, k):
    logits, new_m = m(times, coeffs, final_index, key=k, train=True)
    return bce_with_logits(logits[..., 0], y), new_m


def run(tag):
    tx = optax.flatten(optax.adamw(1e-3, weight_decay=0.01))
    params, _ = partition(model)
    opt_state = tx.init(params)
    vg = filter_value_and_grad(loss_fn, has_aux=True)

    fwd = jax.jit(lambda m, k: loss_fn(m, coeffs, y, k)[0])
    l0 = float(fwd(model, jax.random.fold_in(key, 999)))
    print(f"[{tag}] forward-only loss at init: {l0:.6g}", flush=True)

    @jax.jit
    def train_loop(model, opt_state, coeffs, y, keys):
        def body(carry, k):
            m, os_ = carry
            (loss, new_m), grads = vg(m, coeffs, y, k)
            p, rest = partition(new_m)
            updates, os2 = tx.update(grads, os_, p)
            return (combine(optax.apply_updates(p, updates), rest),
                    os2), (loss, optax.global_norm(grads))

        (model, opt_state), out = jax.lax.scan(
            body, (model, opt_state), keys)
        return model, opt_state, out

    kws = jnp.stack([jax.random.fold_in(key, i) for i in range(iters)])
    _, _, (losses, gnorms) = train_loop(model, opt_state, coeffs, y, kws)
    losses = np.asarray(losses)
    gnorms = np.asarray(gnorms)
    bad = np.nonzero(~np.isfinite(losses))[0]
    print(f"[{tag}] losses[0:5]={losses[:5]}", flush=True)
    print(f"[{tag}] gnorms[0:5]={gnorms[:5]}", flush=True)
    if bad.size:
        k = int(bad[0])
        print(f"[{tag}] FIRST NON-FINITE at iter {k}; "
              f"prev loss {losses[max(k - 1, 0)]:.6g} "
              f"prev gnorm {gnorms[max(k - 1, 0)]:.6g}", flush=True)
    else:
        print(f"[{tag}] all finite; final loss {losses[-1]:.6g}",
              flush=True)


run("default-precision")
with jax.default_matmul_precision("highest"):
    run("highest-precision")
