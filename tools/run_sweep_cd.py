"""Robustness sweep -> CD-diagram artifact, end-to-end (VERDICT r2 item 2).

Closes the experiment-framework loop the reference runs in
torch-ists/model_run.py:92-306 + function.py:280-384: a reduced-but-honest
grid — 5 UEA-shaped datasets (two shape groups, graded noise) × 4 missing
rates {0, .3, .5, .7} × 6 models (LSDE/LNSDE/GSDE + ncde/gru/grud
baselines) × 3 seeds — through `run_robustness_sweep` (per-seed splits AND
per-seed missingness, skip-if-exists resume, SDE cells trained as
lane-packed seed ensembles), then Friedman + Wilcoxon-Holm + CD-diagram
via snsde.analysis.

Artifacts: sweep_out/ per-run JSON records, SWEEP_CD.json (score table +
ranks + cliques), cd_diagram.png.

Usage: python tools/run_sweep_cd.py [--out-dir sweep_out] [--epochs 30]
"""

import argparse
import json
import os

import numpy as np


def make_datasets():
    """Five benchmark-shaped synthetic datasets, graded difficulty.
    Same-shape groups share XLA compilations across the sweep."""
    from snsde.data.synthetic import synthetic_uea

    def variant(base_seed, noise, length, channels, classes):
        def fn(n=320, **kw):
            X, y, t = synthetic_uea(n=n, length=length, channels=channels,
                                    num_classes=classes, seed=base_seed)
            rng = np.random.default_rng(base_seed + 1)
            X = X + noise * rng.normal(size=X.shape).astype(np.float32)
            return X, y, t
        return fn

    return {
        # shape group A: L=40, D=3, 4 classes
        "uea_a_clean": variant(10, 0.0, 40, 3, 4),
        "uea_a_noisy": variant(20, 0.5, 40, 3, 4),
        "uea_a_hard": variant(30, 1.0, 40, 3, 4),
        # shape group B: L=60, D=5, 2 classes
        "uea_b_clean": variant(40, 0.2, 60, 5, 2),
        "uea_b_noisy": variant(50, 0.8, 60, 5, 2),
    }


MODELS = ("neuralsde_2_16", "neuralsde_4_17", "neuralsde_6_17",
          "neuralcde", "gru", "grud")
RATES = (0.0, 0.3, 0.5, 0.7)
SEEDS = (0, 1, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="sweep_out")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=320)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--no-pack", action="store_true")
    ap.add_argument("--out", default="SWEEP_CD.json")
    ap.add_argument("--plot", default="cd_diagram.png")
    args = ap.parse_args()

    from snsde.analysis import cd_analysis, plot_cd_diagram
    from snsde.harness.robustness import SweepConfig, run_robustness_sweep

    all_records = []
    for ds_name, data_fn in make_datasets().items():
        cfg = SweepConfig(
            models=MODELS, missing_rates=RATES, seeds=SEEDS,
            hidden_dim=args.hidden, batch_size=64,
            max_epochs=args.epochs, patience=10, out_dir=args.out_dir,
        )
        print(f"##### dataset {ds_name} #####", flush=True)
        recs = run_robustness_sweep(cfg, n=args.n, data_fn=data_fn,
                                    dataset_name=ds_name, verbose=True,
                                    pack_seeds=not args.no_pack)
        all_records.extend(recs)

    # score table: one row per (dataset, rate) "problem", one column per
    # model, value = mean test accuracy over seeds (reference
    # function.py:280-384 ranks accuracy per problem the same way)
    ok = [r for r in all_records if "accuracy" in r]
    problems = sorted({(r["dataset"], r["missing_rate"]) for r in ok})
    models = list(MODELS)
    acc = np.full((len(problems), len(models)), np.nan)
    f1 = np.full_like(acc, np.nan)
    for i, (ds, rate) in enumerate(problems):
        for j, m in enumerate(models):
            cell = [r for r in ok
                    if r["dataset"] == ds and r["missing_rate"] == rate
                    and r["model"] == m]
            if cell:
                acc[i, j] = float(np.mean([r["accuracy"] for r in cell]))
                f1[i, j] = float(np.mean([r["f1_weighted"] for r in cell]))

    keep = ~np.isnan(acc).any(axis=1)
    acc_k, f1_k = acc[keep], f1[keep]
    result = cd_analysis(acc_k, models)
    payload = {
        "problems": [f"{d}@{r}" for (d, r), k in zip(problems, keep) if k],
        "models": models,
        "accuracy": acc_k.tolist(),
        "f1_weighted": f1_k.tolist(),
        "avg_ranks": result.avg_ranks.tolist(),
        "friedman_stat": result.friedman_stat,
        "friedman_p": result.friedman_p,
        "pairwise": result.pairwise,
        "cliques": result.cliques,
        "n_runs": len(ok),
        "n_errors": len(all_records) - len(ok),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    try:
        plot_cd_diagram(result, path=args.plot)
        print(f"wrote {args.plot}", flush=True)
    except Exception as e:  # matplotlib optional
        print(f"plot skipped: {e!r}", flush=True)

    print(json.dumps({
        "avg_ranks": dict(zip(models,
                              [round(r, 2) for r in result.avg_ranks])),
        "friedman_p": result.friedman_p,
        "cliques": result.cliques,
    }, indent=2), flush=True)
    print(f"wrote {args.out} ({len(ok)} runs)", flush=True)


if __name__ == "__main__":
    main()
