#!/bin/bash
# Round-4 kernel-lever A/B matrix at the headline shape, re-measured on
# the exact-f32 (precision=HIGHEST) kernels — the round-3 recovery A/Bs
# were taken with Mosaic's default bf16-rounded dots and are void.
# Runs bench.py (median over SNSDE_BENCH_REPEATS=7) per config, one at a
# time; never timeout-kills (Pallas-compile rule). Logs to /tmp/r4/ab/.
set -u
cd /root/repo
OUT=${1:-/tmp/r4/ab}
mkdir -p "$OUT"

run() {
    local name="$1"; shift
    echo "$(date +%H:%M:%S) running $name ..."
    if "$@" > "$OUT/$name.log" 2>&1; then
        echo "$(date +%H:%M:%S) $name: $(tail -1 "$OUT/$name.log")"
    else
        echo "$(date +%H:%M:%S) $name FAILED: $(tail -3 "$OUT/$name.log" | head -1)"
    fi
}

P() { env PYTHONPATH=/root/repo:${PYTHONPATH:-} "$@"; }

run baseline        P python bench.py
run mm_bf16         P env SNSDE_FUSED_MATMUL=bf16 python bench.py
run hoist_off       P env SNSDE_FUSED_HOIST=0 python bench.py
run merge           P env SNSDE_FUSED_MERGE=1 python bench.py
run coalesce        P env SNSDE_FUSED_COALESCE=1 python bench.py
run unroll2         P env SNSDE_FUSED_UNROLL=2 python bench.py
run unroll8         P env SNSDE_FUSED_UNROLL=8 python bench.py
run block512        P env SNSDE_FUSED_BLOCK=512 python bench.py
run rng             P env SNSDE_FUSED_RNG=1 python bench.py
run srk_baseline    P env SNSDE_BENCH_METHOD=srk python bench.py
run srk_mm_bf16     P env SNSDE_BENCH_METHOD=srk SNSDE_FUSED_MATMUL=bf16 python bench.py
echo "$(date +%H:%M:%S) AB MATRIX DONE"
