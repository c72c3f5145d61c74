"""A/B: lane-packed fused CDE kernel vs vmapped XLA scan for K-member
ensembles, at small AND sepsis-scale input widths.

The single-model fused CDE dispatch gates at C <= 12 (BENCH_GATE.json —
the one-hot contraction's ~3x FLOPs overhead scales with C), but the
PACKED path (seed ensembles, ASHA rungs, robustness sweeps) is ungated
on the argument that packing amortizes the loop and weight traffic.
That argument was only ever measured at C <= 5; this tool closes the
gap by timing `fused_cde_solve_packed` against `jax.vmap`-over-members
of the scan `cdeint` (what an unpacked seed ensemble compiles to) at
C = 5 and C = 35 (sepsis width). Both arms run one grad step
(fwd + bwd) per iteration. Writes BENCH_PACKED_CDE.json.

Usage: python tools/bench_packed_cde.py [--iters 30] [--repeats 5]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def bench_one(C, H, K, B, L, method, iters, repeats):
    import jax
    import jax.numpy as jnp

    from snsde.models.neuralcde import FinalTanh
    from snsde.ops.interp import CubicPath, natural_cubic_coeffs
    from snsde.ops.solve import cdeint
    from snsde.kernels.multi import fused_cde_solve_packed

    rng = np.random.default_rng(0)
    times = np.linspace(0.0, 1.0, L).astype(np.float32)
    X = np.cumsum(rng.normal(size=(B, L, C)).astype(np.float32), axis=1)
    coeffs = natural_cubic_coeffs(times, jnp.asarray(X))
    path = CubicPath(coeffs, times)
    fields = [FinalTanh.create(jax.random.PRNGKey(i), C, H, H, 1)
              for i in range(K)]
    z0s = jnp.asarray(rng.normal(size=(K, B, H)).astype(np.float32))
    dt = float(times[1] - times[0])

    def loss_packed(funcs):
        zs = fused_cde_solve_packed(list(funcs), path, times, z0s, dt=dt,
                                    method=method)      # [K, T, B, H]
        return jnp.mean(zs[:, -1] ** 2)

    def loss_scan(stacked):
        def one(f, z0):
            return cdeint(path, f, z0, times, dt=dt, method=method)
        zs = jax.vmap(one)(stacked, z0s)                # [K, T, B, H]
        return jnp.mean(zs[:, -1] ** 2)

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fields)
    g_scan = jax.jit(jax.grad(loss_scan))

    def timed(fn, arg):
        out = fn(arg)                                   # compile + warm
        jax.block_until_ready(out)
        dts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(arg)
            jax.block_until_ready(out)
            dts.append(time.perf_counter() - t0)
        med = float(np.median(dts))
        rate = iters * (L - 1) * B * K / med
        q1, q3 = np.percentile(
            [iters * (L - 1) * B * K / d for d in dts], [25, 75])
        return {"step_ms": round(med / iters * 1e3, 3),
                "sample_steps_per_sec": round(rate, 1),
                "iqr": [round(float(q1), 1), round(float(q3), 1)]}

    # round-5 fidelity-explicit arms: packed kernel at exact-f32
    # (library default) AND bf16x3 (production), both vs the vmapped
    # scan at the library-default HIGHEST precision. Fresh jit wrappers
    # per arm: the matmul regime is baked in at trace time, so reusing
    # one jitted fn across env changes would silently reuse the first
    # arm's kernel. The caller's regime is restored afterwards.
    import os as _os

    prev_mm = _os.environ.get("SNSDE_FUSED_MATMUL")
    try:
        _os.environ["SNSDE_FUSED_MATMUL"] = "f32"
        packed = timed(jax.jit(jax.grad(loss_packed)), tuple(fields))
        _os.environ["SNSDE_FUSED_MATMUL"] = "bf16x3"
        packed_x3 = timed(jax.jit(jax.grad(
            lambda funcs: loss_packed(funcs))), tuple(fields))
        _os.environ["SNSDE_FUSED_MATMUL"] = "f32"
        scan = timed(g_scan, stacked)
    finally:
        if prev_mm is None:
            _os.environ.pop("SNSDE_FUSED_MATMUL", None)
        else:
            _os.environ["SNSDE_FUSED_MATMUL"] = prev_mm
    return {"C": C, "H": H, "K": K, "B": B, "L": L, "method": method,
            "scan_precision": "highest (library default, r5 pin)",
            "packed": packed, "packed_x3": packed_x3, "scan_vmap": scan,
            "speedup": round(packed["sample_steps_per_sec"]
                             / scan["sample_steps_per_sec"], 2),
            "speedup_x3": round(packed_x3["sample_steps_per_sec"]
                                / scan["sample_steps_per_sec"], 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="BENCH_PACKED_CDE.json")
    args = ap.parse_args()

    results = {}
    if (REPO / args.out).exists():
        with open(REPO / args.out) as f:
            results = json.load(f)
    for name, C in (("uea_c5", 5), ("c12", 12), ("c16", 16), ("c20", 20),
                    ("c28", 28), ("sepsis_c35", 35)):
        # one config failing (e.g. packed-f32 VMEM OOM at C=28 — a
        # gated-to-scan region anyway) must not lose the others
        try:
            r = bench_one(C, 32, 3, 256, 72, "rk4", args.iters,
                          args.repeats)
            print(name, "packed/scan =", r["speedup"], "x3 =",
                  r.get("speedup_x3"), flush=True)
        except Exception as e:  # noqa: BLE001 — recorded, not hidden
            r = {"C": C, "error": f"{type(e).__name__}: {e}"[:500]}
            print(name, "FAILED:", r["error"][:120], flush=True)
        results[name] = r
        with open(REPO / args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
