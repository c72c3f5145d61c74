#!/bin/bash
# Round-4 stage 5: after stage 4's lever matrix, run the full TPU
# hardware kernel suite (13 tests incl. the new bf16x3 parity test) and
# the reproducible precision probe. Bounded wait (ADVICE r3).
set -u
cd /root/repo
LOG=/tmp/r4/stage4_driver.log
echo "$(date) waiting for stage 4 ..."
waited=0
until grep -q "STAGE4 DONE\|STAGE4 SKIPPED" "$LOG" 2>/dev/null; do
    if [ "$waited" -ge 28800 ]; then
        echo "$(date) STAGE5 SKIPPED (stage 4 never finished after 8h)"
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

run prec_probe_tool  P python tools/probe_precision.py
# flagship rerun: the first attempt OOM'd the EM backward at block 1024
# under exact-f32 matmuls + f32 streams (fixed: bwd-aware block cap)
run flagship_sepsis_r2  P python tools/run_flagship_sepsis.py
run tpu_suite_final  P env SNSDE_TEST_TPU=1 python -m pytest \
    tests/test_fused_kernel.py -q -p no:cacheprovider
echo "$(date) STAGE5 DONE"
