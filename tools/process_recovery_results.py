"""Summarize the TPU-recovery A/B logs into a RESULTS-ready table.

Reads /tmp/tpu_recovery/ (stage-1 bench logs: hoist/merge/coalesce/
unroll A/Bs + the SNSDE_TEST_TPU suite result; stage-2 BENCH_CDE.json;
stage-3 interpolation A/B logs) and prints a digest with the winning
defaults to flip. Run after the recovery stages complete:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/process_recovery_results.py
"""

import json
import os
import re
import sys

D = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_recovery"


def bench_line(path):
    """Last JSON line of a bench.py log -> dict or None."""
    try:
        with open(path) as f:
            for line in reversed(f.readlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
    except (OSError, json.JSONDecodeError):
        pass
    return None


def main():
    print(f"== recovery digest from {D} ==")
    tests = os.path.join(D, "tpu_tests.log")
    if os.path.exists(tests):
        with open(tests) as f:
            tail = f.readlines()[-1].strip() if f else ""
        print(f"TPU kernel tests: {tail}")

    names = [
        ("bench_hoist.log", "euler hoist (new default)"),
        ("bench_merge.log", "euler + MERGE"),
        ("bench_srk_hoist.log", "srk hoist"),
        ("bench_srk_merge.log", "srk + MERGE"),
        ("bench_merge_u8.log", "euler MERGE U=8"),
        ("bench_merge_u16.log", "euler MERGE U=16"),
        ("bench_coalesce.log", "euler + COALESCE"),
        ("bench_mc.log", "euler MERGE+COALESCE"),
        ("bench_srk_coalesce.log", "srk + COALESCE"),
    ]
    rows = []
    for fn, label in names:
        rec = bench_line(os.path.join(D, fn))
        if rec:
            rows.append((label, rec.get("value"), rec.get("unit")))
    if rows:
        print("\nstage-1 bench A/Bs:")
        for label, v, u in rows:
            print(f"  {label:<28} {v} {u}")
        base = dict((l, v) for l, v, _ in rows)
        eu = base.get("euler hoist (new default)")
        if eu:
            for l, v, _ in rows:
                if v and l != "euler hoist (new default)" and "euler" in l:
                    print(f"    {l}: {v / eu:+.1%} vs hoist baseline")

    cde = os.path.join(D, "BENCH_CDE.json")
    if not os.path.exists(cde):
        cde = "/root/repo/BENCH_CDE.json"
    if os.path.exists(cde):
        with open(cde) as f:
            recs = json.load(f)
        print("\nstage-2 fused-vs-scan speedups:")
        for name, rec in recs.items():
            if "speedup" in rec:
                print(f"  {name:<12} {rec['speedup']}x "
                      f"({rec['fused']['train_step_ms']}ms fused vs "
                      f"{rec['scan']['train_step_ms']}ms scan)")

    for tag in ("interp_fused", "interp_scan"):
        log = os.path.join(D, f"{tag}.log")
        if os.path.exists(log):
            with open(log) as f:
                txt = f.read()
            m = re.findall(r"iter \d+.*\[(\d+)s\]", txt)
            if m:
                print(f"stage-3 {tag}: {m[-1]}s total (last progress line)")

    print("\nDefault-flip checklist: enable SNSDE_FUSED_MERGE / "
          "SNSDE_FUSED_COALESCE defaults only where the A/B above wins; "
          "re-record RESULTS.md tables and rerun bench.py.")


if __name__ == "__main__":
    main()
