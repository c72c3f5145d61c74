#!/bin/bash
# Round-4 stage 3: bf16x3 lever + flagship refreshes, after stage 2.
set -u
cd /root/repo
LOG=/tmp/r4/stage2_driver.log
echo "$(date) waiting for stage 2 ..."
waited=0
until grep -q "STAGE2 DONE" "$LOG" 2>/dev/null; do
    if [ "$waited" -ge 21600 ]; then
        echo "$(date) STAGE3 SKIPPED (stage 2 never finished after 6h)"
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

run bench_bf16x3      P env SNSDE_FUSED_MATMUL=bf16x3 python bench.py
run bench_bf16x3_srk  P env SNSDE_FUSED_MATMUL=bf16x3 SNSDE_BENCH_METHOD=srk python bench.py
run triage_bf16x3     P env SNSDE_FUSED_MATMUL=bf16x3 python tools/triage_parity.py all
run flagship_sepsis   P python tools/run_flagship_sepsis.py
run interp_cell       P python tools/run_interpolation_flagship.py --out RESULTS_interpolation_r4.json
echo "$(date) STAGE3 DONE"
