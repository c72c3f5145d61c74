#!/bin/bash
# Round-4 stage 2: after the lever A/B matrix, refresh the family-level
# benches on the exact-f32 kernels. Bounded wait on stage 1's marker
# (ADVICE r3: a dead predecessor must not wedge the pipeline).
set -u
cd /root/repo
ABLOG=/tmp/r4/ab_driver.log
echo "$(date) waiting for the A/B matrix ..."
waited=0
until grep -q "AB MATRIX DONE" "$ABLOG" 2>/dev/null; do
    if [ "$waited" -ge 14400 ]; then
        echo "$(date) STAGE2 SKIPPED (A/B matrix never finished after 4h)"
        exit 0
    fi
    sleep 60; waited=$((waited + 60))
done

P() { env PYTHONPATH=/root/repo:${PYTHONPATH:-} "$@"; }

echo "$(date) bench_cde (fused-vs-scan per family: CDE/gruode/latent/gru/lstm)"
if P python tools/bench_cde.py --iters 30 > /tmp/r4/bench_cde.log 2>&1; then
    echo "$(date) bench_cde done"
else
    echo "$(date) bench_cde FAILED: $(tail -3 /tmp/r4/bench_cde.log | head -1)"
fi

echo "$(date) bench_shapes (fused matrix)"
if P python tools/bench_shapes.py > /tmp/r4/bench_shapes.log 2>&1; then
    echo "$(date) bench_shapes done"
else
    echo "$(date) bench_shapes FAILED: $(tail -3 /tmp/r4/bench_shapes.log | head -1)"
fi

echo "$(date) bench_shapes scan-mode headline (train + serving anchors)"
if P env SNSDE_NO_FUSED=1 python tools/bench_shapes.py \
        --only headline_euler --out BENCH_SHAPES_SCAN.json \
        > /tmp/r4/bench_shapes_scan.log 2>&1; then
    echo "$(date) scan-mode headline done"
else
    echo "$(date) scan-mode FAILED: $(tail -3 /tmp/r4/bench_shapes_scan.log | head -1)"
fi
echo "$(date) STAGE2 DONE"
