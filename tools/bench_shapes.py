"""Multi-shape / multi-solver bench matrix (VERDICT r2 item 5).

Measures the fused-kernel training step (fwd+bwd+Adam, same loop as
bench.py) at:
  * the headline sepsis shape (B=1024, L=72, C=35, H=49) — euler + srk
  * the speech shape (B=1024, L=161, C=21, H=49) — euler, with an
    in-kernel-RNG A/B (the claimed crossover at bandwidth-bound shapes:
    L=161 more than doubles the dW/trajectory HBM streams per step batch)
  * a padding-free shape (H=128) where lane utilization is 100%

Each config compiles separately (~minutes on the remote runtime); all run
in one process. Writes BENCH_SHAPES.json (one record per config).

Usage: python tools/bench_shapes.py [--iters 50] [--only headline_euler ...]
"""

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault("SNSDE_FUSED_STREAM", "bf16")


def bench_one(model_name, method, B, L, C, H, layers=2, iters=50,
              rng_mode=False):
    import jax
    import jax.numpy as jnp
    import optax

    from snsde.harness.classification import make_sde_model
    from snsde.nn.core import combine, filter_value_and_grad, partition
    from snsde.ops.interp import hermite_cubic_coeffs
    from snsde.train.loop import bce_with_logits, weight_regularization

    os.environ["SNSDE_FUSED_RNG"] = "1" if rng_mode else "0"

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C - 1)).astype(np.float32)
    tchan = np.broadcast_to(times[None, :, None], (B, L, 1))
    Xa = np.concatenate([tchan, X], axis=-1)
    coeffs = jnp.asarray(np.asarray(
        hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(Xa))))
    y = jnp.asarray((rng.random(B) < 0.1).astype(np.float32))
    final_index = jnp.full((B,), L - 1, jnp.int32)

    model, _ = make_sde_model(
        key, model_name, input_channels=C, hidden_channels=H,
        hidden_hidden_channels=H, num_hidden_layers=layers,
        output_channels=1, method=method,
    )
    tx = optax.flatten(optax.adamw(1e-3, weight_decay=0.01))
    params, _ = partition(model)
    opt_state = tx.init(params)

    def loss_fn(m, coeffs, y, key):
        logits, new_m = m(times, coeffs, final_index, key=key, train=True)
        loss = bce_with_logits(logits[..., 0], y, pos_weight=10.0)
        return loss + weight_regularization(m.func), new_m

    vg = filter_value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def train_loop(model, opt_state, coeffs, y, keys):
        def body(carry, k):
            m, os_ = carry
            (loss, new_m), grads = vg(m, coeffs, y, k)
            p, rest = partition(new_m)
            updates, os2 = tx.update(grads, os_, p)
            return (combine(optax.apply_updates(p, updates), rest), os2), \
                loss

        (model, opt_state), losses = jax.lax.scan(
            body, (model, opt_state), keys)
        return model, opt_state, losses

    kws = jnp.stack([jax.random.fold_in(key, i) for i in range(iters)])
    _, _, losses = train_loop(model, opt_state, coeffs, y, kws)
    losses.block_until_ready()
    # median over repeats: single runs drift 3-12% on the remote runtime
    # (VERDICT r3 weak #5)
    repeats = int(os.environ.get("SNSDE_BENCH_REPEATS", "5"))
    dts = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        model, opt_state, losses = train_loop(model, opt_state, coeffs, y,
                                              kws)
        losses.block_until_ready()
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    assert bool(jnp.isfinite(losses).all())

    # serving path: forward-only batch scoring (no backward/optimizer),
    # the deployment-side twin of the train-step number
    @jax.jit
    def infer_loop(model, coeffs, keys):
        def body(_, k):
            logits, _ = model(times, coeffs, final_index, key=k,
                              train=False)
            return None, logits[:, 0]

        _, out = jax.lax.scan(body, None, keys)
        return out

    out = infer_loop(model, coeffs, kws)
    out.block_until_ready()
    dts_inf = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        out = infer_loop(model, coeffs, kws)
        out.block_until_ready()
        dts_inf.append(time.perf_counter() - t0)
    dt_inf = float(np.median(dts_inf))
    assert bool(jnp.isfinite(out).all())

    step_ms = dt / iters * 1e3
    sample_steps = iters * (L - 1) * B / dt
    spread = lambda ds: [
        round(iters * (L - 1) * B / float(np.percentile(ds, 75)), 1),
        round(iters * (L - 1) * B / float(np.percentile(ds, 25)), 1)]
    return {"model": model_name, "method": method, "B": B, "L": L,
            "C": C, "H": H, "in_kernel_rng": rng_mode,
            "train_step_ms": round(step_ms, 3),
            "sample_steps_per_sec": round(sample_steps, 1),
            "sample_steps_iqr": spread(dts),
            "repeats": repeats,
            "infer_step_ms": round(dt_inf / iters * 1e3, 3),
            "infer_samples_per_sec": round(iters * B / dt_inf, 1)}


CONFIGS = {
    "headline_euler": dict(model_name="neurallnsde", method="euler",
                           B=1024, L=72, C=35, H=49),
    "headline_srk": dict(model_name="neurallnsde", method="srk",
                         B=1024, L=72, C=35, H=49),
    "speech_euler": dict(model_name="neurallnsde", method="euler",
                         B=1024, L=161, C=21, H=49),
    "speech_euler_rng": dict(model_name="neurallnsde", method="euler",
                             B=1024, L=161, C=21, H=49, rng_mode=True),
    "h128_euler": dict(model_name="neurallnsde", method="euler",
                       B=1024, L=72, C=35, H=128),
    "speech_srk": dict(model_name="neurallnsde", method="srk",
                       B=1024, L=161, C=21, H=49),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--only", nargs="*", default=list(CONFIGS))
    ap.add_argument("--out", default="BENCH_SHAPES.json")
    args = ap.parse_args()

    records = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            records = json.load(f)
    for name in args.only:
        print(f"=== {name} ===", flush=True)
        t0 = time.time()
        rec = bench_one(iters=args.iters, **CONFIGS[name])
        rec["total_s_incl_compile"] = round(time.time() - t0, 1)
        records[name] = rec
        print(json.dumps(rec), flush=True)
        with open(args.out, "w") as f:
            json.dump(records, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
