"""PersonActivity per-time-point classification driver (VERDICT r4 item 10).

Mirrors /root/reference/benchmark_interpolation/crectime_attention_activity.py
defaults (mtan_rnn encoder, latent 32, rec-hidden 32, embed-time 128,
classify-pertp); data is the UCI parse when the raw file exists, else the
synthetic fallback. Writes RESULTS_activity.json.

Usage: python tools/run_activity.py [--n 512] [--epochs 30]
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
    # ~1200 optimizer steps: the VAE-reparameterization noise plateau
    # lasts ~60-200 steps before the CE breaks out of ln(7); 30 epochs
    # at n=512 (90 steps) never escaped it
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k-iwae", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup-epochs", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="RESULTS_activity.json")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from snsde.harness.activity import ActivityConfig, run_activity

    cfg = ActivityConfig(max_epochs=args.epochs, batch_size=args.batch,
                         k_iwae=args.k_iwae, lr=args.lr,
                         warmup_epochs=args.warmup_epochs,
                         seed=args.seed)
    t0 = time.time()
    res = run_activity(cfg, n=args.n)
    rec = {
        "dataset": "person_activity(synthetic fallback)",
        "enc": "mtan_rnn", "latent_dim": cfg.latent_dim,
        "rec_hidden": cfg.rec_hidden, "k_iwae": cfg.k_iwae,
        "n": args.n, "epochs": args.epochs, "seed": args.seed,
        "lr": args.lr, "warmup_epochs": args.warmup_epochs,
        "test_accuracy_pertp": round(res.test_accuracy, 4),
        "test_loss": round(res.test_loss, 4),
        "val_accuracy_pertp": round(res.val_accuracy, 4),
        "wall_time_min": round((time.time() - t0) / 60.0, 2),
        "parameters": res.parameters,
    }
    from snsde.train.pins import FLAGSHIP_PINS, check_history
    pin = check_history(res.history, FLAGSHIP_PINS["activity"])
    rec["pins"] = pin
    if not pin["ok"]:
        print("QUALITY PINS FAILED:", *pin["violations"], sep="\n  ",
              flush=True)
    print(json.dumps(rec, indent=1))
    with open(REPO / args.out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
