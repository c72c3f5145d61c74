#!/bin/bash
# Waits for the axon TPU backend to recover, then runs the round-3 kernel
# validation + bench A/Bs in sequence, logging to /tmp/tpu_recovery/.
# Launch: nohup bash tools/tpu_recovery_run.sh > /tmp/tpu_recovery/driver.log 2>&1 &
set -u
mkdir -p /tmp/tpu_recovery
cd /root/repo

probe() {
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

# 1. TPU-gated fused-kernel tests (hoist now default in both kernels)
SNSDE_TEST_TPU=1 timeout 3600 python -m pytest tests/test_fused_kernel.py -q \
    > /tmp/tpu_recovery/tpu_tests.log 2>&1
echo "$(date) tpu tests: $(tail -1 /tmp/tpu_recovery/tpu_tests.log)"

# 2. headline bench with the hoist (new default)
timeout 2400 python bench.py > /tmp/tpu_recovery/bench_hoist.log 2>&1
echo "$(date) bench hoist: $(tail -1 /tmp/tpu_recovery/bench_hoist.log)"

# 3. merged drift-input matmul A/B
SNSDE_FUSED_MERGE=1 timeout 2400 python bench.py \
    > /tmp/tpu_recovery/bench_merge.log 2>&1
echo "$(date) bench merge: $(tail -1 /tmp/tpu_recovery/bench_merge.log)"

# 4. SRK headline with the hoist
SNSDE_BENCH_METHOD=srk timeout 2400 python bench.py \
    > /tmp/tpu_recovery/bench_srk_hoist.log 2>&1
echo "$(date) bench srk hoist: $(tail -1 /tmp/tpu_recovery/bench_srk_hoist.log)"

# 5. SRK merged
SNSDE_BENCH_METHOD=srk SNSDE_FUSED_MERGE=1 timeout 2400 python bench.py \
    > /tmp/tpu_recovery/bench_srk_merge.log 2>&1
echo "$(date) bench srk merge: $(tail -1 /tmp/tpu_recovery/bench_srk_merge.log)"

# 6. unroll re-A/B: the old U=4 optimum predates the hoist/merge (less
# per-step work may shift the sweet spot)
for U in 8 16; do
    SNSDE_FUSED_UNROLL=$U SNSDE_FUSED_MERGE=1 timeout 2400 python bench.py \
        > /tmp/tpu_recovery/bench_merge_u$U.log 2>&1
    echo "$(date) bench merge U=$U: $(tail -1 /tmp/tpu_recovery/bench_merge_u$U.log)"
done

echo "$(date) ALL DONE"
