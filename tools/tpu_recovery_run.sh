#!/bin/bash
# Waits for the axon TPU backend to recover, then runs the round-3 kernel
# validation + bench A/Bs in sequence, logging to /tmp/tpu_recovery/.
# Launch:
#   mkdir -p /tmp/tpu_recovery
#   nohup bash tools/tpu_recovery_run.sh > /tmp/tpu_recovery/driver.log 2>&1 &
#
# NOTE: the pytest/bench runs are deliberately NOT wrapped in `timeout` —
# killing a process mid-Pallas-compile wedges the remote axon TPU
# (CLAUDE.md). If a run hangs, inspect and kill it manually by PID.
set -u
mkdir -p /tmp/tpu_recovery
cd /root/repo

probe() {
    # the probe allocates no Pallas kernels; a plain reduce either
    # succeeds quickly or fails at backend init, so timeout here cannot
    # land mid-compile
    timeout 900 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float(jnp.sum(jnp.ones((8,8)))))
" > /tmp/tpu_recovery/probe.log 2>&1
}

echo "$(date) waiting for TPU..."
until probe; do
    echo "$(date) TPU still unavailable"
    sleep 120
done
echo "$(date) TPU BACK — running validation + benches"

run() {  # run <name> <log> <cmd...>
    local name=$1 log=$2; shift 2
    "$@" > "$log" 2>&1
    echo "$(date) $name: $(tail -1 "$log")"
}

# 1. TPU-gated fused-kernel tests (hoist now default in both kernels)
run "tpu tests" /tmp/tpu_recovery/tpu_tests.log \
    env SNSDE_TEST_TPU=1 python -m pytest tests/test_fused_kernel.py -q

# 2. headline bench with the hoist (new default)
run "bench hoist" /tmp/tpu_recovery/bench_hoist.log python bench.py

# 3. merged drift-input matmul A/B
run "bench merge" /tmp/tpu_recovery/bench_merge.log \
    env SNSDE_FUSED_MERGE=1 python bench.py

# 4. SRK headline with the hoist
run "bench srk hoist" /tmp/tpu_recovery/bench_srk_hoist.log \
    env SNSDE_BENCH_METHOD=srk python bench.py

# 5. SRK merged
run "bench srk merge" /tmp/tpu_recovery/bench_srk_merge.log \
    env SNSDE_BENCH_METHOD=srk SNSDE_FUSED_MERGE=1 python bench.py

# 6. unroll re-A/B: the old U=4 optimum predates the hoist/merge (less
# per-step work may shift the sweet spot)
for U in 8 16; do
    run "bench merge U=$U" /tmp/tpu_recovery/bench_merge_u$U.log \
        env SNSDE_FUSED_UNROLL=$U SNSDE_FUSED_MERGE=1 python bench.py
done

# 7. coalesced per-step row streams (one srow DMA per iteration)
run "bench coalesce" /tmp/tpu_recovery/bench_coalesce.log \
    env SNSDE_FUSED_COALESCE=1 python bench.py
run "bench merge+coalesce" /tmp/tpu_recovery/bench_mc.log \
    env SNSDE_FUSED_MERGE=1 SNSDE_FUSED_COALESCE=1 python bench.py
run "bench srk coalesce" /tmp/tpu_recovery/bench_srk_coalesce.log \
    env SNSDE_BENCH_METHOD=srk SNSDE_FUSED_COALESCE=1 python bench.py

echo "$(date) ALL DONE"
