#!/bin/bash
# Stage-2 TPU recovery: waits for tools/tpu_recovery_run.sh to finish
# (ALL DONE marker in its driver log), then runs the fused-CDE kernel
# throughput A/B. No `timeout` around the bench (Pallas-compile rule).
set -u
cd /root/repo
LOG=/tmp/tpu_recovery/driver.log
echo "$(date) waiting for stage-1 recovery to finish..."
until grep -q "ALL DONE" "$LOG" 2>/dev/null; do sleep 120; done
echo "$(date) stage-1 done — running CDE bench A/B"
# append (never set) PYTHONPATH: the axon TPU plugin rides
# /root/.axon_site and tools/ scripts need the repo root importable
if PYTHONPATH=/root/repo:${PYTHONPATH:-} python tools/bench_cde.py \
        > /tmp/tpu_recovery/bench_cde.log 2>&1; then
    echo "$(date) CDE bench: $(tail -3 /tmp/tpu_recovery/bench_cde.log)"
    echo "$(date) STAGE2 DONE"
else
    echo "$(date) CDE bench FAILED: $(tail -5 /tmp/tpu_recovery/bench_cde.log)"
    echo "$(date) STAGE2 FAILED"
fi
