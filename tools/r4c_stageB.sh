#!/bin/bash
# Round-4 session-4 stage B (serialized; the axon TPU is single-tenant).
#   1. gate round 2: refine the dispatch-gate crossovers measured in
#      BENCH_GATE.json — H=64 for the fused GRU/LSTM gate
#      (SNSDE_FUSED_RNN_MIN_H default), C=16 for the fused CDE gate
#      (SNSDE_FUSED_CDE_MAX_C default), plus the time-aware LSTM family
#      evidence (PLSTM sel-stream kernel) at H=32 and H=128
#   2. bench.py headline at HEAD (production config) for RESULTS.md
set -u
cd /root/repo

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

run gate_sweep2 P env SNSDE_FUSED_MATMUL=bf16x3 python tools/bench_cde.py \
    --iters 30 --only gru_h64 lstm_h64 cde_c16 plstm plstm_h128 \
    --out BENCH_GATE2.json
run bench_head P python bench.py
# named-baseline corrected-regime re-measurement (the 50.1M/51.0M
# round-3 figures were bf16-regime)
run bench_3_18 P env SNSDE_BENCH_MODEL=neuralsde_3_18 python bench.py
run bench_naive P env SNSDE_BENCH_MODEL=naivesde python bench.py
echo "$(date) R4C STAGE B DONE"
