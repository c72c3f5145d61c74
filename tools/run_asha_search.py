"""End-to-end ASHA hyperparameter-search artifact (SURVEY §2.7).

Runs `asha_search` — the rebuild of the reference's ray.tune ASHA loop
(torch-ists/param_search.py:96-300) — on a benchmark-shaped synthetic
UEA dataset for one SDE-grid model (lane-packed rungs) and one discrete
baseline, and records the rung-by-rung trace + best configs into
ASHA_SEARCH.json. Closes the "component has tests but no committed
end-to-end artifact" gap for the search subsystem.

Usage: python tools/run_asha_search.py [--samples 8] [--n 320]
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
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--n", type=int, default=320)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--models", nargs="*",
                    default=["neuralsde_4_17", "gru"])
    ap.add_argument("--out", default="ASHA_SEARCH.json")
    args = ap.parse_args()

    from snsde.data.synthetic import synthetic_uea
    from snsde.harness.param_search import asha_search

    X, y, _ = synthetic_uea(n=args.n, length=40, channels=3,
                            num_classes=4, seed=10)
    records = {}
    for name in args.models:
        t0 = time.time()
        best = asha_search(name, X, y, num_samples=args.samples,
                           seed=args.seed, pack=name.startswith("neuralsde"))
        best["wall_time_s"] = round(time.time() - t0, 1)
        records[name] = best
        print(name, json.dumps(best), flush=True)
    with open(REPO / args.out, "w") as f:
        json.dump(records, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
