#!/bin/bash
# Stage-4 TPU recovery: after stage 3, refresh the multi-shape bench
# matrix (train + forward-only serving throughput) with whatever kernel
# defaults are active by then. No `timeout` (Pallas-compile rule).
set -u
cd /root/repo
LOG=/tmp/tpu_recovery/stage3.log
echo "$(date) waiting for stage-3 to finish..."
# bounded wait: a dead stage 3 (crash/kill without a DONE/SKIPPED marker)
# must not wedge the pipeline silently (ADVICE r3) — give up after ~6h
waited=0
until grep -q "STAGE3 DONE\|STAGE3 SKIPPED" "$LOG" 2>/dev/null; do
    if [ "$waited" -ge 21600 ]; then
        echo "$(date) STAGE4 SKIPPED (stage-3 never finished after 6h)"
        exit 0
    fi
    sleep 120; waited=$((waited + 120))
done
echo "$(date) stage-3 done — multi-shape bench matrix (train + serving)"
if PYTHONPATH=/root/repo:${PYTHONPATH:-} python tools/bench_shapes.py \
        > /tmp/tpu_recovery/bench_shapes.log 2>&1; then
    echo "$(date) shapes bench: $(tail -2 /tmp/tpu_recovery/bench_shapes.log | head -1)"
    echo "$(date) STAGE4 DONE"
else
    echo "$(date) shapes bench FAILED: $(tail -5 /tmp/tpu_recovery/bench_shapes.log)"
    echo "$(date) STAGE4 FAILED"
fi
