#!/bin/bash
# Stage-3 TPU recovery: after stage 2, A/B the interpolation flagship's
# epoch time with the fused BiGRU decoder vs the scan path (30 iters,
# LNSDE encoder only). No `timeout` (Pallas-compile rule).
set -u
cd /root/repo
LOG=/tmp/tpu_recovery/stage2.log
echo "$(date) waiting for stage-2 to finish..."
until grep -q "STAGE2 DONE\|STAGE2 FAILED" "$LOG" 2>/dev/null; do sleep 120; done
if grep -q "STAGE2 FAILED" "$LOG"; then
    echo "$(date) stage-2 FAILED — skipping the interpolation A/B"
    echo "$(date) STAGE3 SKIPPED"
    exit 0
fi
echo "$(date) stage-2 done — interpolation decoder A/B (30 iters)"
run() {
    PYTHONPATH=/root/repo:${PYTHONPATH:-} python \
        tools/run_interpolation_flagship.py --niters 30 \
        --enc neuralsde_4_17 --out "/tmp/tpu_recovery/$1.json" \
        > "/tmp/tpu_recovery/$1.log" 2>&1
    echo "$(date) $1: $(tail -2 /tmp/tpu_recovery/$1.log | head -1)"
}
run interp_fused
SNSDE_NO_FUSED=1 run interp_scan
echo "$(date) STAGE3 DONE"
