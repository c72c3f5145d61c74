"""Real-data MuJoCo forecasting runs (VERDICT round-1 item 4).

Trains LSDE / LNSDE / GSDE on the bundled reference trajectory bank
(benchmark_forecasting/datasets/mujoco.npy) with the official sweep's
settings (mujoco.sh: lr 1e-3, euler, intensity false, step_mode valloss,
missing_rate 0.0) and records test MSE per model into
RESULTS_mujoco_real.json.

Usage: python tools/run_real_mujoco.py [--epochs 200] [--hidden 32]
       [--layers 2] [--missing 0.0] [--seed 0]
"""

import argparse
import json
import time

from snsde.data.mujoco import default_npy_path
from snsde.harness.forecasting import ForecastConfig, run_mujoco


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--missing", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--models", nargs="*",
                    default=["neurallsde", "neurallnsde", "neuralgsde"])
    ap.add_argument("--method", default="euler",
                    help="euler | srk (the reference whitelist)")
    ap.add_argument("--out", default="RESULTS_mujoco_real.json")
    args = ap.parse_args()

    path = default_npy_path()
    if path is None:
        raise SystemExit("bundled mujoco.npy not found")
    print(f"real data: {path}", flush=True)

    records = []
    for name in args.models:
        cfg = ForecastConfig(
            model_name=name,
            hidden_channels=args.hidden,
            hidden_hidden_channels=args.hidden,
            num_hidden_layers=args.layers,
            lr=1e-3,                      # mujoco.sh --lr 0.001
            max_epochs=args.epochs,
            missing_rate=args.missing,
            time_augment=False,           # mujoco.sh --intensity false
            step_mode="valloss",
            loss="mse", reg="l2", reg_scale=0.01,
            method=args.method,
            seed=args.seed,
            verbose=True,
        )
        t0 = time.time()
        res = run_mujoco(cfg)
        rec = {
            "model": name,
            "method": args.method,
            "hidden": args.hidden,
            "layers": args.layers,
            "missing_rate": args.missing,
            "seed": args.seed,
            "epochs_ran": len(res["history"]),
            "test_mse": float(res["test_mse"]),
            "best_val_mse": float(res["best_val_mse"]),
            "wall_time_s": time.time() - t0,
        }
        from snsde.train.pins import FLAGSHIP_PINS, check_history
        pin = check_history(res["history"], FLAGSHIP_PINS["mujoco"])
        rec["pins"] = pin
        if not pin["ok"]:
            print("QUALITY PINS FAILED:", *pin["violations"], sep="\n  ",
                  flush=True)
        print(json.dumps(rec), flush=True)
        records.append(rec)
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
