"""Fused Euler–Maruyama solver kernel (Pallas/TPU).

The reference's hot loop (SURVEY.md §3.1) is thousands of tiny MLP evals:
per EM step, drift = MLP(emb([linear_in([t-feat, y]), init(X(t))])) and
diffusion = relu(2NN(t-feat)) (·y), each a handful of [B,H]x[H,H] matmuls.
Under `lax.scan` each step pays XLA loop overhead + HBM weight re-reads
(~63us/step measured); the FLOPs are ~0.15us. This kernel runs the ENTIRE
time loop on-chip: weights live in VMEM across all steps, step-dependent
tensors (control features, Brownian increments) are pipelined in via
BlockSpecs, and the state never leaves VMEM.

Covers the proposed-model family — input_option ∈ {2 (LSDE), 4 (LNSDE),
6 (GSDE)} × noise_option ∈ {16, 17} — via precomputation:
  * Xh[k]   = initial_network(X(grid_k))     (one big MXU matmul outside)
  * a[k]    = tf_k @ W_t + b_in              (time part of linear_in)
  * gk[k]   = relu(2NN(tf_k))                (diffusion is t-only!)
so the in-kernel step is purely state-dependent:
  yy = y @ Wy + a_k ;  z = relu(yy @ We1 + Xh_k @ We2 + be) -> MLP -> z3
  f  = tanh(z3 * tanh(y)) if geometric else tanh(z3)
  g  = tanh(s_theta * gk_k [* y])
  y' = y + f dt_k + g dW_k

Training uses a custom VJP whose backward is a second Pallas kernel:
reverse time loop, activations recomputed from the saved trajectory,
weight-gradient accumulators resident in VMEM.

All feature dims are zero-padded to 128 lanes — padding is exact
(tanh(0)=0 keeps padded state identically zero), and the MXU tiles cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_em_solve", "supports_fused"]

LANE = 128


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(n_inner: int, geometric: bool, mult_y: bool,
                # refs:
                y0_ref, xh_ref, a_ref, gk_ref, dw_ref, dt_ref, theta_ref,
                wy_ref, we1_ref, we2_ref, be_ref, *rest):
    inner_w = rest[: n_inner]
    inner_b = rest[n_inner : 2 * n_inner]
    wout_ref, bo_ref, ys_ref, y_scr = rest[2 * n_inner :]

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        y_scr[:] = y0_ref[:]

    y = y_scr[:]
    xh_blk = xh_ref[0].astype(jnp.float32)
    yy = jnp.dot(y, wy_ref[:], preferred_element_type=jnp.float32) + a_ref[0]
    z = (
        jnp.dot(yy, we1_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(xh_blk, we2_ref[:], preferred_element_type=jnp.float32)
        + be_ref[:]
    )
    h = jnp.maximum(z, 0.0)
    for wr, br in zip(inner_w, inner_b):
        h = jnp.maximum(
            jnp.dot(h, wr[:], preferred_element_type=jnp.float32) + br[:],
            0.0,
        )
    z3 = jnp.dot(h, wout_ref[:], preferred_element_type=jnp.float32) + \
        bo_ref[:]
    if geometric:
        z3 = z3 * jnp.tanh(y)
    f = jnp.tanh(z3)

    s_theta = jax.nn.sigmoid(theta_ref[0, 0])
    graw = s_theta * gk_ref[0]
    if mult_y:
        graw = graw * y
    g = jnp.tanh(graw)

    y_new = y + f * dt_ref[k, 0] + g * dw_ref[0].astype(jnp.float32)
    y_scr[:] = y_new
    ys_ref[0] = y_new.astype(ys_ref.dtype)


def _fused_em_forward(params, xh, a, gk, dw, dts, y0, *, n_inner,
                      geometric, mult_y, block_b):
    """xh/dw: [M, B, H]; a/gk: [M, 1, H]; dts: [M]; y0: [B, H] (padded)."""
    M, B, H = xh.shape
    nb = B // block_b

    grid = (nb, M)
    step_spec3 = pl.BlockSpec(
        (1, block_b, H), lambda b, k: (k, b, 0), memory_space=pltpu.VMEM
    )
    step_spec2 = pl.BlockSpec(
        (1, 1, H), lambda b, k: (k, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (H, H), lambda b, k: (0, 0), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec((1, H), lambda b, k: (0, 0),
                          memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((block_b, H), lambda b, k: (b, 0),
                     memory_space=pltpu.VMEM),          # y0
        step_spec3,                                      # xh
        step_spec2,                                      # a
        step_spec2,                                      # gk
        step_spec3,                                      # dw
        pl.BlockSpec(memory_space=pltpu.SMEM),           # dts (full [M,1])
        pl.BlockSpec((1, 1), lambda b, k: (0, 0),
                     memory_space=pltpu.SMEM),           # theta
        w_spec, w_spec, w_spec, b_spec,                  # wy, we1, we2, be
    ]
    args = [y0, xh, a, gk, dw, dts, params["theta"], params["wy"],
            params["we1"], params["we2"], params["be"]]
    for i in range(n_inner):
        in_specs.append(w_spec)
        args.append(params["w_inner"][i])
    for i in range(n_inner):
        in_specs.append(b_spec)
        args.append(params["b_inner"][i])
    in_specs += [w_spec, b_spec]
    args += [params["wout"], params["bo"]]

    out_spec = pl.BlockSpec(
        (1, block_b, H), lambda b, k: (k, b, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_fwd_kernel, n_inner, geometric, mult_y)
    ys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, B, H), xh.dtype),
        scratch_shapes=[pltpu.VMEM((block_b, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*args)
    return ys


# ---------------------------------------------------------------------------
# Backward kernel (reverse loop; recomputes activations from saved ys)
# ---------------------------------------------------------------------------

def _bwd_kernel(n_inner: int, geometric: bool, mult_y: bool,
                yprev_ref, gys_ref, xh_ref, a_ref, gk_ref, dw_ref, dt_ref,
                theta_ref, wy_ref, we1_ref, we2_ref, be_ref, *rest):
    inner_w = rest[: n_inner]
    inner_b = rest[n_inner : 2 * n_inner]
    (wout_ref, bo_ref,
     dxh_ref, da_ref, dgk_ref, dy0_ref, dtheta_ref,
     dwy_ref, dwe1_ref, dwe2_ref, dbe_ref) = rest[2 * n_inner : 2 * n_inner + 11]
    dinner_w = rest[2 * n_inner + 11 : 3 * n_inner + 11]
    dinner_b = rest[3 * n_inner + 11 : 4 * n_inner + 11]
    dwout_ref, dbo_ref, gbar_scr, dth_scr = rest[4 * n_inner + 11 :]

    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        gbar_scr[:] = jnp.zeros_like(gbar_scr)
        dth_scr[0, 0] = 0.0
        dwy_ref[0] = jnp.zeros_like(dwy_ref[0])
        dwe1_ref[0] = jnp.zeros_like(dwe1_ref[0])
        dwe2_ref[0] = jnp.zeros_like(dwe2_ref[0])
        dbe_ref[0] = jnp.zeros_like(dbe_ref[0])
        for dwr, dbr in zip(dinner_w, dinner_b):
            dwr[0] = jnp.zeros_like(dwr[0])
            dbr[0] = jnp.zeros_like(dbr[0])
        dwout_ref[0] = jnp.zeros_like(dwout_ref[0])
        dbo_ref[0] = jnp.zeros_like(dbo_ref[0])

    # cotangent flowing into y_{step+1}: carried + direct output cotangent
    gbar = gbar_scr[:] + gys_ref[0].astype(jnp.float32)
    y = yprev_ref[0].astype(jnp.float32)   # state BEFORE this step

    # ---- recompute forward ----
    xh_blk = xh_ref[0].astype(jnp.float32)
    yy = jnp.dot(y, wy_ref[:], preferred_element_type=jnp.float32) + a_ref[0]
    z1 = (
        jnp.dot(yy, we1_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(xh_blk, we2_ref[:], preferred_element_type=jnp.float32)
        + be_ref[:]
    )
    h_list = []
    z_list = []
    h = jnp.maximum(z1, 0.0)
    h_list.append(h)
    for wr, br in zip(inner_w, inner_b):
        zz = jnp.dot(h, wr[:], preferred_element_type=jnp.float32) + br[:]
        z_list.append(zz)
        h = jnp.maximum(zz, 0.0)
        h_list.append(h)
    z3_lin = jnp.dot(h, wout_ref[:], preferred_element_type=jnp.float32) + \
        bo_ref[:]
    ty = jnp.tanh(y)
    z3 = z3_lin * ty if geometric else z3_lin
    f = jnp.tanh(z3)
    s_theta = jax.nn.sigmoid(theta_ref[0, 0])
    gk = gk_ref[0]
    graw = s_theta * gk * y if mult_y else s_theta * gk
    g = jnp.tanh(graw)

    dt = dt_ref[nk - 1 - k, 0]
    dw = dw_ref[0].astype(jnp.float32)

    # ---- backward through the step ----
    df = gbar * dt
    dg = gbar * dw
    dz3 = df * (1.0 - f * f)
    dgraw = dg * (1.0 - g * g)

    if geometric:
        dz3_lin = dz3 * ty
        dy_geo = dz3 * z3_lin * (1.0 - ty * ty)
    else:
        dz3_lin = dz3
        dy_geo = jnp.zeros_like(y)

    dwout_ref[0] += jnp.dot(h.T, dz3_lin,
                            preferred_element_type=jnp.float32)
    dbo_ref[0] += jnp.sum(dz3_lin, axis=0, keepdims=True)
    dh = jnp.dot(dz3_lin, wout_ref[:].T,
                 preferred_element_type=jnp.float32)
    for idx in range(n_inner - 1, -1, -1):
        dz = dh * (z_list[idx] > 0.0)
        dinner_w[idx][0] += jnp.dot(
            h_list[idx].T, dz, preferred_element_type=jnp.float32
        )
        dinner_b[idx][0] += jnp.sum(dz, axis=0, keepdims=True)
        dh = jnp.dot(dz, inner_w[idx][:].T,
                     preferred_element_type=jnp.float32)
    dz1 = dh * (z1 > 0.0)
    dbe_ref[0] += jnp.sum(dz1, axis=0, keepdims=True)
    dyy = jnp.dot(dz1, we1_ref[:].T, preferred_element_type=jnp.float32)
    dxh = jnp.dot(dz1, we2_ref[:].T, preferred_element_type=jnp.float32)
    dwe1_ref[0] += jnp.dot(yy.T, dz1, preferred_element_type=jnp.float32)
    dwe2_ref[0] += jnp.dot(xh_blk.T, dz1,
                           preferred_element_type=jnp.float32)
    dwy_ref[0] += jnp.dot(y.T, dyy, preferred_element_type=jnp.float32)
    dy_drift = jnp.dot(dyy, wy_ref[:].T,
                       preferred_element_type=jnp.float32)

    if mult_y:
        dy_diff = dgraw * s_theta * gk
        dgk = jnp.sum(dgraw * s_theta * y, axis=0, keepdims=True)
        dth_contrib = jnp.sum(dgraw * gk * y)
    else:
        dy_diff = jnp.zeros_like(y)
        dgk = jnp.sum(dgraw * s_theta, axis=0, keepdims=True)
        dth_contrib = jnp.sum(dgraw * gk)
    dth_scr[0, 0] += dth_contrib * s_theta * (1.0 - s_theta)

    dxh_ref[0] = dxh.astype(dxh_ref.dtype)
    da_ref[0, 0] = jnp.sum(dyy, axis=0, keepdims=True)
    dgk_ref[0, 0] = dgk

    gbar_new = gbar + dy_drift + dy_diff + dy_geo
    gbar_scr[:] = gbar_new

    @pl.when(k == nk - 1)
    def _():
        dy0_ref[0] = gbar_scr[:]
        dtheta_ref[0, 0, 0] = dth_scr[0, 0]


def _fused_em_backward(params, xh, a, gk, dw, dts, y0, ys, gys, *,
                       n_inner, geometric, mult_y, block_b):
    M, B, H = xh.shape
    nb = B // block_b
    grid = (nb, M)
    # reverse-time index map for step-dependent tensors
    rev3 = pl.BlockSpec((1, block_b, H), lambda b, k: (M - 1 - k, b, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((1, 1, H), lambda b, k: (M - 1 - k, 0, 0),
                        memory_space=pltpu.VMEM)
    rev1 = pl.BlockSpec(memory_space=pltpu.SMEM)   # full dts [M,1]
    w_spec = pl.BlockSpec((H, H), lambda b, k: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, H), lambda b, k: (0, 0),
                          memory_space=pltpu.VMEM)

    # trajectory WITH y0 prepended: y before step k is traj[k]
    traj = jnp.concatenate([y0[None].astype(ys.dtype), ys], axis=0)

    in_specs = [
        rev3,                                            # y_prev (traj[k])
        rev3,                                            # gys[k+1]
        rev3, rev2, rev2, rev3, rev1,                    # xh, a, gk, dw, dts
        pl.BlockSpec((1, 1), lambda b, k: (0, 0),
                     memory_space=pltpu.SMEM),           # theta
        w_spec, w_spec, w_spec, b_spec,
    ]
    args = [traj[:-1], gys[1:], xh, a, gk, dw, dts, params["theta"],
            params["wy"], params["we1"], params["we2"], params["be"]]
    for i in range(n_inner):
        in_specs.append(w_spec)
        args.append(params["w_inner"][i])
    for i in range(n_inner):
        in_specs.append(b_spec)
        args.append(params["b_inner"][i])
    in_specs += [w_spec, b_spec]
    args += [params["wout"], params["bo"]]

    out_shapes = [
        jax.ShapeDtypeStruct((M, B, H), xh.dtype),           # dxh
        jax.ShapeDtypeStruct((nb, M, 1, H), jnp.float32),    # da (per blk)
        jax.ShapeDtypeStruct((nb, M, 1, H), jnp.float32),    # dgk
        jax.ShapeDtypeStruct((nb, block_b, H), jnp.float32),  # dy0
        jax.ShapeDtypeStruct((nb, 1, 1), jnp.float32),       # dtheta
        jax.ShapeDtypeStruct((nb, H, H), jnp.float32),       # dwy
        jax.ShapeDtypeStruct((nb, H, H), jnp.float32),       # dwe1
        jax.ShapeDtypeStruct((nb, H, H), jnp.float32),       # dwe2
        jax.ShapeDtypeStruct((nb, 1, H), jnp.float32),       # dbe
    ]
    out_specs = [
        pl.BlockSpec((1, block_b, H), lambda b, k: (M - 1 - k, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, H), lambda b, k: (b, M - 1 - k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, H), lambda b, k: (b, M - 1 - k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, H), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, H, H), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, H), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, H), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, H), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for i in range(n_inner):
        out_shapes.append(jax.ShapeDtypeStruct((nb, H, H), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, H, H), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    for i in range(n_inner):
        out_shapes.append(jax.ShapeDtypeStruct((nb, 1, H), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, H), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    out_shapes += [
        jax.ShapeDtypeStruct((nb, H, H), jnp.float32),       # dwout
        jax.ShapeDtypeStruct((nb, 1, H), jnp.float32),       # dbo
    ]
    out_specs += [
        pl.BlockSpec((1, H, H), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, H), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(_bwd_kernel, n_inner, geometric, mult_y)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),           # gbar
            pltpu.SMEM((1, 1), jnp.float32),                 # dtheta acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*args)

    (dxh, da, dgk, dy0, dtheta, dwy, dwe1, dwe2, dbe) = outs[:9]
    dinner_w = outs[9 : 9 + n_inner]
    dinner_b = outs[9 + n_inner : 9 + 2 * n_inner]
    dwout, dbo = outs[9 + 2 * n_inner :]

    # reduce per-batch-block accumulators
    dparams = {
        "theta": jnp.sum(dtheta, axis=0),
        "wy": jnp.sum(dwy, axis=0),
        "we1": jnp.sum(dwe1, axis=0),
        "we2": jnp.sum(dwe2, axis=0),
        "be": jnp.sum(dbe, axis=0),
        "w_inner": tuple(jnp.sum(w, axis=0) for w in dinner_w),
        "b_inner": tuple(jnp.sum(b, axis=0) for b in dinner_b),
        "wout": jnp.sum(dwout, axis=0),
        "bo": jnp.sum(dbo, axis=0),
    }
    da = jnp.sum(da, axis=0)                             # [M, 1, H]
    dgk = jnp.sum(dgk, axis=0)
    dy0 = dy0.reshape(-1, dy0.shape[-1])                 # [B, H]
    return dparams, dxh, da, dgk, dy0


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_em(params, xh, a, gk, dw, y0, dts_tuple, n_inner, geometric,
              mult_y):
    dts = jnp.asarray(np.asarray(dts_tuple, np.float32))[:, None]
    return _fused_em_forward(params, xh, a, gk, dw, dts, y0,
                             n_inner=n_inner, geometric=geometric,
                             mult_y=mult_y, block_b=_pick_block(xh.shape[1]))


def _pick_block(B):
    # 512 rows/block is the net sweet spot: 256 is faster for the forward
    # alone but the backward pays per-block weight-grad accumulators and
    # reductions, which dominate at smaller blocks (measured on v5e).
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if B % cand == 0:
            return cand
    return B


def _fused_em_fwd(params, xh, a, gk, dw, y0, dts_tuple, n_inner, geometric,
                  mult_y):
    ys = _fused_em(params, xh, a, gk, dw, y0, dts_tuple, n_inner, geometric,
                   mult_y)
    return ys, (params, xh, a, gk, dw, y0, ys)


def _fused_em_bwd(dts_tuple, n_inner, geometric, mult_y, res, gys_full):
    params, xh, a, gk, dw, y0, ys = res
    dts = jnp.asarray(np.asarray(dts_tuple, np.float32))[:, None]
    # gys_full is the cotangent of ys [M, B, H] (y0 not part of output)
    dparams, dxh, da, dgk, dy0 = _fused_em_backward(
        params, xh, a, gk, dw, dts, y0, ys,
        jnp.concatenate([jnp.zeros_like(gys_full[:1]), gys_full], axis=0),
        n_inner=n_inner, geometric=geometric, mult_y=mult_y,
        block_b=_pick_block(xh.shape[1]),
    )
    ddw = jnp.zeros_like(dw)     # noise is not differentiated
    return dparams, dxh, da, dgk, ddw, dy0


_fused_em.defvjp(_fused_em_fwd, _fused_em_bwd)


# ---------------------------------------------------------------------------
# Public entry: solve a DiffusionField SDE with the fused kernel
# ---------------------------------------------------------------------------

def supports_fused(field) -> bool:
    """True when the field's config maps onto the fused kernel: the
    LSDE/LNSDE/GSDE family with 2-layer time-only noise nets, and
    hidden == hidden_hidden (the emb width contract the reference also
    requires, neuralsde.py:154)."""
    io = getattr(field, "input_option", None)
    no = getattr(field, "noise_option", None)
    if io not in (2, 4, 6) or no not in (16, 17):
        return False
    H = field.linear_out.out_features
    if field.linear_in.out_features != H:
        return False
    return True


def fused_em_solve(field, path, times, y0, key, dt=None,
                   stream_dtype=None):
    """Drop-in EM solve for a supported DiffusionField. Returns
    ys [T, B, H] on the output times (torchsde layout).

    NOTE on semantics: matches DiffusionField.f/g exactly except that
    `nan_to_num` on the diffusion is a no-op here (gk and y are finite by
    construction on this path).

    stream_dtype: dtype for the LARGE per-step streams (control features,
    Brownian increments, trajectory, cotangents). bfloat16 halves the HBM
    traffic of the (bandwidth-bound) solve; all in-kernel compute and
    weight-gradient accumulation stays float32. Default float32
    (SNSDE_FUSED_STREAM=bf16 flips the default)."""
    import os as _os

    if stream_dtype is None:
        stream_dtype = (
            jnp.bfloat16
            if _os.environ.get("SNSDE_FUSED_STREAM", "f32") == "bf16"
            else jnp.float32
        )
    from ..ops.solve import make_grid
    from ..ops.brownian import brownian_increments
    from ..models.neuralsde import resolve_dt

    dt = resolve_dt(times) if dt is None else dt
    grid, out_idx = make_grid(times, dt)
    M = grid.shape[0] - 1
    B = y0.shape[0]
    H = field.linear_out.out_features
    Hp = _round_up(max(H, 8), LANE)
    n_inner = len(field.linears)
    io = field.input_option
    geometric = io == 6
    time_emb = io in (4, 6)
    mult_y = field.noise_option == 17

    # Brownian increments on the true H then padded (padded channels get
    # noise but g=0 there, so they stay zero). Split the key exactly like
    # ops.solve.sdeint does (kw for dW, ku unused here) so a given seed
    # draws the same Brownian path on the fused and scan paths.
    kw, _ = jax.random.split(key)
    dW = brownian_increments(kw, grid, (B, H), jnp.float32)
    dW = _pad_to(dW, Hp, 2).astype(stream_dtype)

    t_lo = jnp.asarray(grid[:-1], jnp.float32)
    # --- precompute step-dependent tensors (big MXU matmuls) ---
    Xg = path.evaluate_grid(grid[:-1])                  # [M, B, C]
    Xh = Xg @ field.initial_network.weight + field.initial_network.bias
    Xh = _pad_to(Xh, Hp, 2).astype(stream_dtype)

    tf = jnp.stack([jnp.sin(t_lo), jnp.cos(t_lo)], axis=-1)  # [M, 2]
    w_in = field.linear_in.weight                        # [(H+2)|H, H]
    if time_emb:
        Wt = w_in[:2]                                    # [2, H]
        Wy = w_in[2:]                                    # [H, H]
        a = tf @ Wt + field.linear_in.bias               # [M, H]
    else:
        Wy = w_in
        a = jnp.broadcast_to(field.linear_in.bias, (M, H))
    a = _pad_to(a, Hp, 1)[:, None, :]

    # diffusion time net: relu(L2(relu(L1(tf))))
    nt1, nt2 = field.noise_t
    gk = jax.nn.relu(
        jax.nn.relu(tf @ nt1.weight + nt1.bias) @ nt2.weight + nt2.bias
    )                                                    # [M, H]
    gk = _pad_to(gk, Hp, 1)[:, None, :]

    params = {
        "theta": field.theta.astype(jnp.float32),
        "wy": _pad_to(_pad_to(Wy, Hp, 0), Hp, 1),
        "we1": _pad_to(_pad_to(field.emb.weight[:H], Hp, 0), Hp, 1),
        "we2": _pad_to(_pad_to(field.emb.weight[H:], Hp, 0), Hp, 1),
        "be": _pad_to(field.emb.bias, Hp, 0)[None],
        "w_inner": tuple(
            _pad_to(_pad_to(l.weight, Hp, 0), Hp, 1) for l in field.linears
        ),
        "b_inner": tuple(_pad_to(l.bias, Hp, 0)[None] for l in field.linears),
        "wout": _pad_to(_pad_to(field.linear_out.weight, Hp, 0), Hp, 1),
        "bo": _pad_to(field.linear_out.bias, Hp, 0)[None],
    }

    y0p = _pad_to(y0.astype(jnp.float32), Hp, 1)
    dts_tuple = tuple(np.diff(grid).astype(np.float32).tolist())
    ys = _fused_em(params, Xh, a, gk, dW, y0p, dts_tuple, n_inner,
                   geometric, mult_y)
    full = jnp.concatenate([y0p[None].astype(ys.dtype), ys], axis=0)
    return full[jnp.asarray(out_idx)][..., :H].astype(jnp.float32)
