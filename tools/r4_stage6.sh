#!/bin/bash
# Round-4 stage 6: decision measurements for the default flips.
#  * gruode scan-arm NaN triage (CPU repro is clean -> TPU-specific)
#  * exact-f32 merge+unroll2 (the x3 winner, unmeasured under f32)
#  * full CDE/latent/RNN family A/B under bf16x3 (the production
#    candidate; the r2 run compared exact-f32 fused vs bf16-default scan
#    which is apples-to-oranges)
# Bounded wait (ADVICE r3).
set -u
cd /root/repo
LOG=/tmp/r4/stage5_driver.log
echo "$(date) waiting for stage 5 ..."
waited=0
until grep -q "STAGE5 DONE\|STAGE5 SKIPPED" "$LOG" 2>/dev/null; do
    if [ "$waited" -ge 28800 ]; then
        echo "$(date) STAGE6 SKIPPED (stage 5 never finished after 8h)"
        exit 0
    fi
    sleep 60; waited=$((waited + 60))
done

P() { env PYTHONPATH=/root/repo:${PYTHONPATH:-} "$@"; }

run() {
    local name="$1"; shift
    echo "$(date +%H:%M:%S) running $name ..."
    if "$@" > "/tmp/r4/$name.log" 2>&1; then
        echo "$(date +%H:%M:%S) $name: $(tail -1 /tmp/r4/$name.log)"
    else
        echo "$(date +%H:%M:%S) $name FAILED: $(tail -3 /tmp/r4/$name.log | head -1)"
    fi
}

run gruode_nan_probe  P python tools/probe_gruode_nan.py
run f32_merge_u2      P env SNSDE_FUSED_MERGE=1 SNSDE_FUSED_UNROLL=2 python bench.py
run bench_cde_x3      P env SNSDE_FUSED_MATMUL=bf16x3 python tools/bench_cde.py --iters 30 --out BENCH_CDE_X3.json

echo "$(date) STAGE6 DONE"
