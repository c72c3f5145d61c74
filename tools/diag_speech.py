"""Speech-flagship divergence triage (VERDICT r4 item 1).

Re-runs the speech flagship cell (neurallnsde H=49, L=161, 10-class,
reference speech_commands-sde.py policy) with per-epoch grad/param norm
tracking and A/B knobs:

  --hook-scale S    readout grad hook scale (reference: 100; 1 = off)
  --grad-clip C     optax global-norm clip before the optimizer (ref: none)
  --data-seed D     synthetic data draw (isolates data- vs init-sensitivity)
  --seed S          model init + training noise
  --lr LR           learning rate (reference: 1e-3)

Writes <out>.json with the final metrics + the full per-epoch history
(including grad_norm_max and per-subtree param norms).

Usage: python tools/diag_speech.py --seed 0 --epochs 40 --out /tmp/r5/diag_s0
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
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-seed", type=int, default=0)
    ap.add_argument("--hook-scale", type=float, default=100.0)
    ap.add_argument("--grad-clip", type=float, default=None)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--model", default="neurallnsde")
    ap.add_argument("--out", default="/tmp/r5/diag_speech")
    args = ap.parse_args()

    import numpy as np
    import jax

    from snsde.data.synthetic import synthetic_speech
    from snsde.data.common import preprocess_classification
    from snsde.harness.classification import make_sde_model
    from snsde.train.loop import (TrainConfig, fit_classifier,
                                  readout_grad_hook)

    X, y, lengths, t = synthetic_speech(n=args.n, seed=args.data_seed)
    data = preprocess_classification(
        X, y, lengths, use_intensity=False, seed=args.data_seed,
        times=np.arange(X.shape[1], dtype=np.float32),
    )
    tr, va, te = data["train"], data["val"], data["test"]

    key = jax.random.PRNGKey(args.seed)
    model, reg_fn = make_sde_model(
        key, args.model, data["input_channels"], args.hidden,
        args.hidden, 2, output_channels=10, initial=True, method="euler",
    )
    times = data["times"]

    def apply_fn(m, batch, key, train):
        return m(times, batch["coeffs"], batch["final_index"], key=key,
                 train=train)

    tc = TrainConfig(
        lr=args.lr, batch_size=args.batch, max_epochs=args.epochs,
        num_classes=10, step_mode="valaccuracy", seed=args.seed,
        grad_clip=args.grad_clip, track_norms=True,
    )
    hook = (readout_grad_hook("readout.linear2", scale=args.hook_scale)
            if args.hook_scale != 1.0 else None)
    t0 = time.time()
    res = fit_classifier(model, apply_fn, reg_fn, tr, va, te, tc,
                         grad_hook=hook)
    wall = time.time() - t0
    rec = {
        "config": {k: getattr(args, k) for k in
                   ("n", "epochs", "hidden", "batch", "seed", "data_seed",
                    "hook_scale", "grad_clip", "lr", "model")},
        "test_accuracy": round(float(res.test_metrics.accuracy), 4),
        "val_accuracy": round(float(res.val_metrics.accuracy), 4),
        "wall_time_min": round(wall / 60.0, 2),
        "history": res.history,
    }
    out = pathlib.Path(args.out).with_suffix(".json")
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("test_accuracy", "val_accuracy", "wall_time_min")}))


if __name__ == "__main__":
    main()
