"""Roofline / MFU accounting for the fused EM train step (RESULTS.md).

Computes, from first principles, the padded and useful FLOP counts and the
HBM byte traffic of one fused-kernel training step (forward + backward),
then reports achieved FLOP/s, useful-FLOP MFU, and the bandwidth bound for
a measured step time. Run:

    python tools/roofline.py --ms 1.63            # measured train-step ms

v5e peaks (public spec): 197 TFLOP/s bf16 (MXU), 819 GB/s HBM. f32
matmuls with preferred_element_type=f32 run at ~1/4 the bf16 MXU rate.
"""

import argparse

PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 4
HBM_BW = 819e9


def analyze(B=1024, L=72, H=49, Hp=128, n_inner=1, stream_bytes=2,
            ms=1.63, emb=True, merged=False):
    """In-kernel matmul accounting. The xh@we2 product is HOISTED out of
    the kernel (round 3) — it runs as one large outside matmul whose cost
    is counted separately below; `merged=True` additionally folds wy@we1
    (SNSDE_FUSED_MERGE)."""
    M = L - 1
    mm = 2 * B * Hp * Hp                    # FLOPs per padded [B,Hp]x[Hp,Hp]
    # forward drift in-kernel: emb = wy + we1 (we2 hoisted), merged = one
    # effective wy@we1; plus n_inner inner layers and wout
    n_mm_fwd = ((1 if merged else 2) if emb else 1) + n_inner + 1
    fwd = n_mm_fwd * mm
    # backward: recompute fwd + for each matmul a dW-grad and an
    # input-grad matmul (~3x forward)
    bwd = 3 * fwd
    total_flops = (fwd + bwd) * M
    # hoisted outside matmuls (full-batch [M*B,Hp]x[Hp,Hp], near-peak MXU):
    # xh@we2 fwd + its two VJP matmuls; merged adds none (a@we1 is [M,Hp])
    hoisted_flops = (3 * M * mm) if emb else 0.0
    total_flops += hoisted_flops

    useful_frac = (H / Hp) ** 2
    useful_flops = total_flops * useful_frac

    sB = stream_bytes
    big = M * B * Hp * sB                   # one [M,B,Hp] stream
    # fwd: read Xh, dW; write ys. bwd: read traj(+y0), gys, Xh, dW;
    # write dxh. (a/gk streams are [M,1,Hp] — negligible.)
    hbm = (3 + 5) * big

    t = ms / 1e3
    achieved = total_flops / t
    out = {
        "steps": M,
        "hoisted_GFLOP_per_trainstep": hoisted_flops / 1e9,
        "padded_GFLOP_per_trainstep": total_flops / 1e9,
        "useful_GFLOP_per_trainstep": useful_flops / 1e9,
        "useful_fraction": useful_frac,
        "HBM_MB_per_trainstep": hbm / 1e6,
        "achieved_TFLOPs": achieved / 1e12,
        "padded_MXU_utilization_vs_f32peak": achieved / PEAK_F32,
        "useful_MFU_vs_bf16peak": (useful_flops / t) / PEAK_BF16,
        "bandwidth_bound_us": hbm / HBM_BW * 1e6,
        "compute_bound_f32_us": total_flops / PEAK_F32 * 1e6,
        "measured_us": ms * 1e3,
    }
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", type=float, default=1.63)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--length", type=int, default=72)
    ap.add_argument("--hidden", type=int, default=49)
    ap.add_argument("--inner", type=int, default=1)
    ap.add_argument("--merged", action="store_true",
                    help="SNSDE_FUSED_MERGE drift-input fold")
    a = ap.parse_args()
    r = analyze(B=a.batch, L=a.length, H=a.hidden, n_inner=a.inner,
                ms=a.ms, merged=a.merged)
    for k, v in r.items():
        print(f"{k}: {v:.4g}")
