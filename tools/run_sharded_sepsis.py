"""Full-policy sharded sepsis training on the 8-device virtual mesh
(VERDICT r2 item 7).

Runs the sepsis flagship configuration (LNSDE, H=49, 2 hidden layers,
complete reference policy: 100x readout grad hook, coupled-L2 Adam,
masked final-batch padding, val-AUROC plateau scheduling, best-model
restore, device-resident scanned epochs + eval) twice with the same seed:
once on a single device and once data-parallel over an 8-device
`jax.sharding.Mesh`, then asserts the final metrics agree. The mesh here
is 8 virtual XLA host devices on one CPU core, so this validates the
multi-chip training path's CORRECTNESS (sharding, collectives inserted by
XLA, metric equality), not wall-clock scaling — the one real TPU chip
cannot be subdivided. Match: SURVEY §2.9 / §4 item 5.

Usage: python tools/run_sharded_sepsis.py [--n 2048] [--epochs 6]
Writes SHARDED_r03.json.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--hidden", type=int, default=49)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--out", default="SHARDED_r03.json")
    args = ap.parse_args()

    assert len(jax.devices()) == 8, jax.devices()

    from snsde.harness.classification import HarnessConfig, run_sepsis
    from snsde.parallel import make_mesh

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

    print("=== single device ===", flush=True)
    t0 = time.time()
    res1 = run_sepsis(cfg, n=args.n)
    wall1 = time.time() - t0

    print("=== 8-device data-parallel mesh ===", flush=True)
    mesh = make_mesh(("data",))

    # run_sepsis has no mesh knob; reproduce its call with mesh= plumbed
    # through fit_classifier (same data, same seed, same policy)
    from snsde.data.common import preprocess_classification
    from snsde.data.synthetic import synthetic_sepsis
    from snsde.harness.classification import (InitialValueModel,
                                              _split_indices,
                                              make_sde_model)
    from snsde.train.loop import (TrainConfig, fit_classifier,
                                  readout_grad_hook)

    X, static, y, lengths, t = synthetic_sepsis(n=args.n, seed=cfg.seed)
    data = preprocess_classification(
        X, y, lengths, use_intensity=cfg.use_intensity, seed=cfg.seed,
        times=np.arange(X.shape[1], dtype=np.float32),
    )
    tr, va, te = data["train"], data["val"], data["test"]
    sidx = _split_indices(y, cfg.seed)
    tr["static"], va["static"], te["static"] = (
        static[sidx[0]], static[sidx[1]], static[sidx[2]]
    )
    key = jax.random.PRNGKey(cfg.seed)
    km, kinit = jax.random.split(key)
    sde, _ = make_sde_model(
        km, cfg.model_name, data["input_channels"], cfg.hidden_channels,
        cfg.hidden_hidden_channels, cfg.num_hidden_layers,
        output_channels=1, initial=False, method=cfg.method,
    )
    model = InitialValueModel.create(kinit, static.shape[-1],
                                     cfg.hidden_channels, sde)
    times = data["times"]

    def apply_fn(m, batch, key, train):
        logits, new_m = m(times, batch["coeffs"], batch["static"],
                          batch["final_index"], key=key, train=train)
        return logits[..., 0], new_m

    tc = TrainConfig(
        lr=cfg.lr, batch_size=cfg.batch_size, max_epochs=cfg.max_epochs,
        num_classes=2, pos_weight=10.0, step_mode="valauc", seed=cfg.seed,
    )
    t0 = time.time()
    res8 = fit_classifier(
        model, apply_fn, lambda m: m.sde.func, tr, va, te, tc, mesh=mesh,
        grad_hook=readout_grad_hook("sde.readout.linear2"))
    wall8 = time.time() - t0

    m1, m8 = res1.test_metrics, res8.test_metrics
    rec = {
        "config": {"model": cfg.model_name, "hidden": args.hidden,
                   "n": args.n, "batch": args.batch,
                   "epochs": args.epochs, "policy": "full reference"},
        "single_device": {"auroc": m1.auroc, "accuracy": m1.accuracy,
                          "loss": m1.loss, "wall_s": wall1},
        "mesh_8dev": {"auroc": m8.auroc, "accuracy": m8.accuracy,
                      "loss": m8.loss, "wall_s": wall8,
                      "steps_per_sec": res8.steps_per_sec},
        "auroc_abs_diff": abs(m1.auroc - m8.auroc),
        "acc_abs_diff": abs(m1.accuracy - m8.accuracy),
    }
    print(json.dumps(rec, indent=2), flush=True)
    # Brownian draws are order-independent and the global batch is
    # identical, so the two runs differ only by reduction order; require
    # agreement to a tight tolerance.
    assert rec["auroc_abs_diff"] < 0.02, rec
    assert rec["acc_abs_diff"] < 0.02, rec
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
