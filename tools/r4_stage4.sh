#!/bin/bash
# Round-4 stage 4: after stage 3 (bf16x3 benches + flagship refreshes),
# rerun the family benches on the VMEM-fixed backwards and close the
# lever matrix under bf16x3. Bounded wait (ADVICE r3).
set -u
cd /root/repo
LOG=/tmp/r4/stage3_driver.log
echo "$(date) waiting for stage 3 ..."
waited=0
until grep -q "STAGE3 DONE\|STAGE3 SKIPPED" "$LOG" 2>/dev/null; do
    if [ "$waited" -ge 28800 ]; then
        echo "$(date) STAGE4 SKIPPED (stage 3 never finished after 8h)"
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

# family-level fused-vs-scan (CDE/gruode/latent/gru/lstm) on the
# VMEM-fixed CDE backward
run bench_cde_r2      P python tools/bench_cde.py --iters 30

# full fused shape matrix on the VMEM-fixed SRK backward
run bench_shapes_r2   P python tools/bench_shapes.py

# lever matrix under bf16x3 (merge won under exact f32 but lost under
# bf16 in round 3 — re-decide under the candidate default)
run x3_merge          P env SNSDE_FUSED_MATMUL=bf16x3 SNSDE_FUSED_MERGE=1 python bench.py
run x3_unroll2        P env SNSDE_FUSED_MATMUL=bf16x3 SNSDE_FUSED_UNROLL=2 python bench.py
run x3_merge_unroll2  P env SNSDE_FUSED_MATMUL=bf16x3 SNSDE_FUSED_MERGE=1 SNSDE_FUSED_UNROLL=2 python bench.py
run x3_block512       P env SNSDE_FUSED_MATMUL=bf16x3 SNSDE_FUSED_BLOCK=512 python bench.py

# SRK exact-f32 baseline (never measured: OOM'd pre-fix) + srk merge A/B
run srk_f32           P env SNSDE_BENCH_METHOD=srk python bench.py
run x3_srk_merge      P env SNSDE_FUSED_MATMUL=bf16x3 SNSDE_FUSED_MERGE=1 SNSDE_BENCH_METHOD=srk python bench.py

echo "$(date) STAGE4 DONE"
