"""A/B: lane-packed vs sequential seed training at the sweep level
(VERDICT r2 item 3 — "measured >=1.5x sweep-level speedup").

Times run_robustness_sweep on one dataset cell-grid (SDE models only,
3 seeds — the reference trains each cell's seeds as separate processes,
model_run.py:294-305) twice: pack_seeds=True (one lane-packed solve per
cell with per-member control paths) vs pack_seeds=False (solo loop per
seed). Same models, same data, same seeds, fresh out-dirs. Writes
AB_PACKED_SWEEP.json.

Usage: python tools/ab_packed_sweep.py [--epochs 30] [--n 320]
"""

import argparse
import json
import shutil
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=320)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--out", default="AB_PACKED_SWEEP.json")
    args = ap.parse_args()

    from snsde.data.synthetic import synthetic_uea
    from snsde.harness.robustness import SweepConfig, run_robustness_sweep

    models = ("neuralsde_2_16", "neuralsde_4_17", "neuralsde_6_17")
    rates = (0.0, 0.5)

    def one(pack: bool):
        out_dir = f"/tmp/ab_sweep_{'pack' if pack else 'solo'}"
        shutil.rmtree(out_dir, ignore_errors=True)
        cfg = SweepConfig(models=models, missing_rates=rates,
                          seeds=(0, 1, 2), hidden_dim=args.hidden,
                          batch_size=64, max_epochs=args.epochs,
                          patience=10, out_dir=out_dir)
        t0 = time.time()
        recs = run_robustness_sweep(
            cfg, n=args.n, data_fn=synthetic_uea,
            dataset_name="ab", verbose=False, pack_seeds=pack)
        wall = time.time() - t0
        ok = [r for r in recs if "accuracy" in r]
        return {"wall_s": round(wall, 1), "n_runs": len(ok),
                "n_errors": len(recs) - len(ok),
                "mean_acc": sum(r["accuracy"] for r in ok) / len(ok)}

    # packed first so both passes pay their own compiles; report both
    # cold and a second warm packed pass (shapes identical -> XLA cache)
    packed = one(True)
    solo = one(False)
    packed_warm = one(True)
    rec = {
        "grid": {"models": models, "rates": rates, "seeds": 3,
                 "epochs": args.epochs, "n": args.n,
                 "hidden": args.hidden},
        "packed_cold": packed,
        "solo": solo,
        "packed_warm": packed_warm,
        "speedup_cold": round(solo["wall_s"] / packed["wall_s"], 2),
        "speedup_warm": round(solo["wall_s"] / packed_warm["wall_s"], 2),
    }
    print(json.dumps(rec, indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
