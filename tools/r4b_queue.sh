#!/bin/bash
# Round-4 session-2 TPU queue (serialized; the axon TPU is single-tenant).
# Waits for the in-flight hardware suite (pid $1), then:
#   1. gruode scan-arm NaN probe (bench_cde gruode_rk4 diverged on v5e)
#   2. flagship sepsis re-run under the merged defaults (VERDICT r3 #9)
#   3. bench.py under bf16x3+U2 (production candidate) and f32+U2
#      (the stage-6 measurement lost to the container restart)
#   4. dispatch-gating sweep (fused-vs-scan crossover in C and H)
# Bounded waits throughout (ADVICE r3).
set -u
cd /root/repo
SUITE_PID=${1:?usage: r4b_queue.sh <suite_pid>}

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

waited=0
while kill -0 "$SUITE_PID" 2>/dev/null; do
    if [ "$waited" -ge 7200 ]; then
        echo "$(date) QUEUE ABORTED (suite still running after 2h)"
        exit 1
    fi
    sleep 30; waited=$((waited + 30))
done
echo "$(date) suite done: $(tail -1 /tmp/r4/tpu_suite_final.log)"

run gruode_probe     P python tools/probe_gruode_nan.py
run flagship_sepsis  P python tools/run_flagship_sepsis.py
run bench_x3_u2      P env SNSDE_FUSED_MATMUL=bf16x3 SNSDE_FUSED_UNROLL=2 python bench.py
run bench_f32_u2     P env SNSDE_FUSED_UNROLL=2 python bench.py
run gate_sweep       P env SNSDE_FUSED_MATMUL=bf16x3 python tools/bench_cde.py \
    --iters 30 --only cde_c12 cde_c20 cde_c6_h64 gru_h128 lstm_h128 latent_h64 \
    --out BENCH_GATE.json
echo "$(date) R4B QUEUE DONE"
