#!/bin/bash
# Round-4 stage C (serialized; axon TPU is single-tenant): the
# whole-loop-in-one-grid-step experiment for the latency-bound EM
# headline. Roofline says each solver step carries ~3-4 us of
# per-grid-iteration overhead beyond DMA + MXU compute; U=M with a
# small batch block runs the ENTIRE time loop inside one grid step per
# batch block (no sequential grid dim at all). The earlier U=8/16
# losses kept the large default block (VMEM-bound); this corner —
# tiny block x full unroll — was never measured.
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

# baseline re-pin at HEAD defaults (U=2, auto block) for same-session drift
run c_base python bench.py
# full unroll, shrinking blocks (backward VMEM is the binding constraint)
run c_u71_b256 env SNSDE_FUSED_UNROLL=71 SNSDE_FUSED_BLOCK=256 python bench.py
run c_u71_b128 env SNSDE_FUSED_UNROLL=71 SNSDE_FUSED_BLOCK=128 python bench.py
run c_u71_b64  env SNSDE_FUSED_UNROLL=71 SNSDE_FUSED_BLOCK=64  python bench.py
# half unroll middle point
run c_u36_b256 env SNSDE_FUSED_UNROLL=36 SNSDE_FUSED_BLOCK=256 python bench.py
# interaction: does a smaller block help at the default U=2 too?
run c_u2_b256  env SNSDE_FUSED_BLOCK=256 python bench.py
echo "$(date) R4C STAGE C DONE"
