#!/bin/bash
# Round-4 session-3 stage A (serialized; the axon TPU is single-tenant).
# Prereq: the verify drive (pid $1) finished.
#   1. flagship sepsis re-run (earlier run OOM'd pre-cap-fix; VERDICT r4 #9)
#   2. dispatch-gating sweep: locate fused-vs-scan crossovers in C and H
#   3. bench_shapes full fused matrix (EM/SRK backward caps now in place)
set -u
cd /root/repo
PREV_PID=${1:-}

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

if [ -n "$PREV_PID" ]; then
    waited=0
    while kill -0 "$PREV_PID" 2>/dev/null; do
        if [ "$waited" -ge 1800 ]; then
            echo "$(date) STAGE-A ABORTED (verify still running after 30m)"
            exit 1
        fi
        sleep 15; waited=$((waited + 15))
    done
fi

run flagship_sepsis_r4c  P python tools/run_flagship_sepsis.py
# gruode_rk4 re-runs here to validate the round-4 exact-dot pin on
# hardware (both arms previously NaN'd: BENCH_CDE_X3.json)
run gate_sweep P env SNSDE_FUSED_MATMUL=bf16x3 python tools/bench_cde.py \
    --iters 30 --only cde_c12 cde_c20 cde_c6_h64 gru_h128 lstm_h128 \
    latent_h64 gruode_rk4 --out BENCH_GATE.json
# library-default config (exact f32, merge now ON) — the dirty
# BENCH_SHAPES.json headline rows predate the merge flip, so re-run all
run bench_shapes_r4c P python tools/bench_shapes.py
echo "$(date) R4C STAGE A DONE"
