"""Aggregate per-seed flagship artifacts into mean±std summaries
(VERDICT r4 item 4, forecasting/interpolation half).

Reads RESULTS_mujoco_r4.json (seed 0) + RESULTS_mujoco_seed{1..4}.json
and RESULTS_interpolation_r4.json (seed 0) + RESULTS_interp_seed{1..4}
.json, writes RESULTS_mujoco_r5.json / RESULTS_interpolation_r5.json.

Usage: python tools/aggregate_seeds.py
"""

import glob
import json
import pathlib

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(path):
    with open(path) as f:
        return json.load(f)


def agg(vals):
    return {"per_seed": [round(float(v), 5) for v in vals],
            "mean": round(float(np.mean(vals)), 5),
            "std": round(float(np.std(vals)), 5),
            "n_seeds": len(vals)}


def main():
    # --- MuJoCo (neurallnsde euler flagship) ---
    mses, pins = [], []
    for path in ([REPO / "RESULTS_mujoco_r4.json"]
                 + sorted(REPO.glob("RESULTS_mujoco_seed*.json"))):
        if not path.exists():
            continue
        recs = _load(path)
        recs = recs if isinstance(recs, list) else [recs]
        for r in recs:
            if r.get("model") == "neurallnsde":
                mses.append(r["test_mse"])
                if "pins" in r:
                    pins.append(r["pins"]["ok"])
    if mses:
        out = {"model": "neurallnsde", "method": "euler",
               "dataset": "real bundled MuJoCo bank",
               "test_mse": agg(mses), "pins_ok": pins}
        with open(REPO / "RESULTS_mujoco_r5.json", "w") as f:
            json.dump(out, f, indent=1)
        print("mujoco:", out["test_mse"])

    # --- Interpolation (neuralsde_2_16, sample-tp 0.5) ---
    mses, pins = [], []
    for path in ([REPO / "RESULTS_interpolation_r4.json"]
                 + sorted(REPO.glob("RESULTS_interp_seed*.json"))):
        if not path.exists():
            continue
        recs = _load(path)
        recs = recs if isinstance(recs, list) else [recs]
        for r in recs:
            if (r.get("enc") == "neuralsde_2_16"
                    and r.get("sample_tp", 0.5) == 0.5):
                mses.append(r["test_mse"])
                if "pins" in r:
                    pins.append(r["pins"]["ok"])
    if mses:
        out = {"enc": "neuralsde_2_16", "dec": "rnn3", "sample_tp": 0.5,
               "test_mse": agg(mses), "pins_ok": pins}
        with open(REPO / "RESULTS_interpolation_r5.json", "w") as f:
            json.dump(out, f, indent=1)
        print("interpolation:", out["test_mse"])


if __name__ == "__main__":
    main()
