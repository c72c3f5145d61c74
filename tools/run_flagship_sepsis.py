"""Flagship sepsis run (full reference training policy) — round-4
refresh on the exact-f32 kernels (VERDICT r3 item #9).

Mirrors the round-2 flagship configuration: neurallnsde, H=49, 2 hidden
layers, batch 1024, n=8192 synthetic sepsis-shaped records, 40 epochs,
AUROC model selection. Writes RESULTS_sepsis_r4.json.

Usage: python tools/run_flagship_sepsis.py [--n 8192] [--epochs 40]
"""

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=49)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default="RESULTS_sepsis_r4.json")
    args = ap.parse_args()

    from snsde.harness.classification import HarnessConfig, run_sepsis

    cfg = HarnessConfig(
        model_name="neurallnsde",
        hidden_channels=args.hidden,
        hidden_hidden_channels=args.hidden,
        num_hidden_layers=2,
        batch_size=args.batch,
        max_epochs=args.epochs,
        use_intensity=True,
        seed=0,
    )
    t0 = time.time()
    res = run_sepsis(cfg, n=args.n)
    wall = time.time() - t0
    m = res.test_metrics
    rec = {
        "model": "neurallnsde", "H": args.hidden, "layers": 2,
        "batch": args.batch, "n": args.n, "epochs": args.epochs,
        "test_auroc": round(float(m.auroc), 4),
        "test_ap": round(float(m.average_precision), 4),
        "test_accuracy": round(float(m.accuracy), 4),
        "val_auroc": round(float(res.val_metrics.auroc), 4),
        "wall_time_min": round(wall / 60.0, 2),
        "steps_per_sec": round(float(res.steps_per_sec), 2),
        "parameters": res.parameters,
    }
    from snsde.train.pins import FLAGSHIP_PINS, check_history
    pin = check_history(res.history, FLAGSHIP_PINS["sepsis"])
    rec["pins"] = pin
    if not pin["ok"]:
        print("QUALITY PINS FAILED:", *pin["violations"], sep="\n  ",
              flush=True)
    print(json.dumps(rec, indent=1))
    with open(REPO / args.out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
