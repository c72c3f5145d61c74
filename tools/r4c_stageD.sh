#!/bin/bash
# Round-4 stage D (serialized; axon TPU is single-tenant): freshness
# re-measurements for the two flagship quality numbers that still date
# from the bf16-regime rounds (MuJoCo forecasting MSE, Speech accuracy),
# a production-config (bf16x3) serving anchor, and a final hardware test
# suite run at HEAD.
set -u
cd /root/repo

run() {
    local name="$1"; shift
    echo "$(date +%H:%M:%S) running $name ..."
    if env PYTHONPATH=/root/repo:${PYTHONPATH:-} "$@" \
            > "/tmp/r4/$name.log" 2>&1; then
        echo "$(date +%H:%M:%S) $name: $(tail -1 /tmp/r4/$name.log)"
    else
        echo "$(date +%H:%M:%S) $name FAILED: $(tail -3 /tmp/r4/$name.log | head -1)"
    fi
}

run d_mujoco python tools/run_real_mujoco.py \
    --models neurallnsde --out RESULTS_mujoco_r4.json
run d_speech python tools/run_flagship_speech.py
run d_serving_x3 env SNSDE_FUSED_MATMUL=bf16x3 python tools/bench_shapes.py \
    --only headline_euler --out BENCH_SHAPES_X3.json
run d_tpu_suite env SNSDE_TEST_TPU=1 python -m pytest \
    tests/test_fused_kernel.py -q
echo "$(date) R4C STAGE D DONE"
