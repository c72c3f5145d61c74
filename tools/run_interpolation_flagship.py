"""PhysioNet-2012 interpolation flagship runs (VERDICT round-2 item 1).

Runs the mTAN-style SDE-encoder VAE at the reference sweep's benchmark
settings (/root/reference/benchmark_interpolation/run.sh:7-18:
niters 300, lr 1e-3, batch 64, dec rnn3, gen-hidden 64, latent-dim 32,
k-iwae 5, std 0.01, norm, learn-emb, kl, num-ref-points 64, n 8000,
sample-tp 0.5) and records masked test MSE + final ELBO + wall time per
encoder into RESULTS_interpolation.json.

Data: real PhysioNet-2012 archives when present in the cache dir,
otherwise benchmark-SHAPED synthetic data (n=8000, L=62 — the q=0.016
union grid length — D=36 time-series channels, ~35% observed), clearly
tagged in the output record. No egress in this environment.

Usage: python tools/run_interpolation_flagship.py [--niters 300]
       [--enc neuralsde_2_16 neuralsde_4_17 neuralsde_6_17]
       [--rec-hidden 32] [--sample-tp 0.5] [--out RESULTS_interpolation.json]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--niters", type=int, default=300)
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--enc", nargs="*",
                    default=["neuralsde_2_16", "neuralsde_4_17",
                             "neuralsde_6_17"])
    ap.add_argument("--dec", default="rnn3")
    ap.add_argument("--rec-hidden", type=int, default=32)
    ap.add_argument("--rec-num-hidden", type=int, default=1)
    ap.add_argument("--gen-hidden", type=int, default=64)
    ap.add_argument("--latent-dim", type=int, default=32)
    ap.add_argument("--k-iwae", type=int, default=5)
    ap.add_argument("--sample-tp", type=float, default=0.5)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-dir", default=None,
                    help="checkpoint dir root (per-encoder subdirs)")
    ap.add_argument("--out", default="RESULTS_interpolation.json")
    args = ap.parse_args()

    from snsde.data.physionet2012 import get_data
    from snsde.harness.interpolation import (
        InterpolationConfig,
        run_interpolation,
        synthetic_physionet,
    )

    try:
        real = get_data(synthetic_fallback=False)  # raises unless cached
        data_source = "physionet2012-real"

        def data_fn(n, seed):
            vals, mask, tp = real
            return vals[:n], mask[:n], tp[:n]
    except FileNotFoundError:
        data_source = "synthetic-benchmark-shaped (L=62 q=0.016 grid, D=36)"

        def data_fn(n, seed):
            return synthetic_physionet(n=n, length=62, dim=36,
                                       observe_rate=0.35, seed=seed)

    print(f"data: {data_source}", flush=True)

    records = []
    for enc in args.enc:
        cfg = InterpolationConfig(
            enc=enc,
            dec=args.dec,
            latent_dim=args.latent_dim,
            rec_hidden=args.rec_hidden,
            rec_num_hidden=args.rec_num_hidden,
            gen_hidden=args.gen_hidden,
            num_ref_points=64,
            k_iwae=args.k_iwae,
            std=0.01,
            niters=args.niters,
            lr=1e-3,
            batch_size=args.batch_size,
            sample_tp=args.sample_tp,
            use_kl=True,
            seed=args.seed,
            verbose=True,
            save_dir=(f"{args.save_dir}/{enc}" if args.save_dir else None),
        )
        print(f"=== {enc} ===", flush=True)
        t0 = time.time()
        res = run_interpolation(cfg, n=args.n, data_fn=data_fn)
        rec = {
            "enc": enc,
            "dec": args.dec,
            "data": data_source,
            "n": args.n,
            "niters": args.niters,
            "rec_hidden": args.rec_hidden,
            "rec_num_hidden": args.rec_num_hidden,
            "gen_hidden": args.gen_hidden,
            "latent_dim": args.latent_dim,
            "k_iwae": args.k_iwae,
            "sample_tp": args.sample_tp,
            "test_mse": res["test_mse"],
            "final_elbo": res["history"][-1]["elbo"],
            "final_logpx": res["history"][-1].get("logpx"),
            "final_kl": res["history"][-1].get("kl"),
            "wall_time_s": time.time() - t0,
        }
        from snsde.train.pins import FLAGSHIP_PINS, check_history
        pin = check_history(res["history"], FLAGSHIP_PINS["interpolation"])
        rec["pins"] = pin
        if not pin["ok"]:
            print("QUALITY PINS FAILED:", *pin["violations"], sep="\n  ",
                  flush=True)
        print(json.dumps(rec), flush=True)
        records.append(rec)
        with open(args.out, "w") as f:
            json.dump(records, f, indent=2)

    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
