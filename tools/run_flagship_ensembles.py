"""Multi-seed flagship statistics via lane-packed SeedEnsembles
(VERDICT r4 item 4: the reference protocol is 5 repeats per cell —
sepsis-sde.py:70-83 / speech_commands-sde.py:53-54; the repo's lane
packing trains all K repeats through ONE fused solve).

Runs sepsis (LNSDE H=49, AUROC-selected) and speech (LNSDE H=49,
accuracy-selected) as K=5 packed ensembles at the flagship configuration
and writes RESULTS_{sepsis,speech}_r5.json with per-repeat metrics,
mean±std, and per-repeat quality-pin verdicts.

Usage: python tools/run_flagship_ensembles.py [--task sepsis|speech|both]
       [--repeats 5] [--epochs 40] [--n 8192]
"""

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def summarize(results, metric_fn, pin_name):
    import numpy as np

    from snsde.train.pins import FLAGSHIP_PINS, check_history

    vals = [metric_fn(r) for r in results]
    pins = [check_history(r.history, FLAGSHIP_PINS[pin_name])
            for r in results]
    return {
        "per_repeat": [round(v, 4) for v in vals],
        "mean": round(float(np.mean(vals)), 4),
        "std": round(float(np.std(vals)), 4),
        "pins_ok": [p["ok"] for p in pins],
        "pin_violations": sum((p["violations"] for p in pins), []),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="both",
                    choices=["sepsis", "speech", "both"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=49)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--suffix", default="r5")
    args = ap.parse_args()

    from snsde.harness.classification import (HarnessConfig,
                                              run_sepsis_ensemble,
                                              run_speech_ensemble)

    cfg = HarnessConfig(
        model_name="neurallnsde", hidden_channels=args.hidden,
        hidden_hidden_channels=args.hidden, num_hidden_layers=2,
        batch_size=args.batch, max_epochs=args.epochs, seed=0, data_seed=0,
    )

    if args.task in ("sepsis", "both"):
        t0 = time.time()
        res = run_sepsis_ensemble(cfg, repeats=args.repeats, n=args.n // 2,
                                  max_epochs=args.epochs)
        rec = {
            "model": "neurallnsde", "H": args.hidden, "layers": 2,
            "batch": args.batch, "n": args.n // 2, "epochs": args.epochs,
            "repeats": args.repeats, "packed": True,
            "auroc": summarize(res, lambda r: float(r.test_metrics.auroc),
                               "sepsis"),
            "accuracy": summarize(
                res, lambda r: float(r.test_metrics.accuracy), "sepsis"),
            "wall_time_min": round((time.time() - t0) / 60.0, 2),
        }
        out = REPO / f"RESULTS_sepsis_{args.suffix}.json"
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps(rec, indent=1), flush=True)

    if args.task in ("speech", "both"):
        t0 = time.time()
        res = run_speech_ensemble(cfg, repeats=args.repeats, n=args.n,
                                  max_epochs=args.epochs)
        rec = {
            "model": "neurallnsde", "H": args.hidden, "layers": 2,
            "batch": args.batch, "n": args.n, "epochs": args.epochs,
            "repeats": args.repeats, "packed": True,
            "accuracy": summarize(
                res, lambda r: float(r.test_metrics.accuracy), "speech"),
            "f1_weighted": summarize(
                res, lambda r: float(r.test_metrics.f1_weighted), "speech"),
            "wall_time_min": round((time.time() - t0) / 60.0, 2),
        }
        out = REPO / f"RESULTS_speech_{args.suffix}.json"
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps(rec, indent=1), flush=True)


if __name__ == "__main__":
    main()
