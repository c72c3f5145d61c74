"""Fused SRIW1 stochastic Runge–Kutta solver kernel (Pallas/TPU).

`srk` is the DEFAULT solver for the reference's entire torch-ists stream
family (/root/reference/torch-ists/torch_ists/diff_module/NSDE/
nsde_model.py:63-69), so its hot loop deserves the same treatment as the
Euler kernel (fused_em.py): the whole time loop on-chip, weights resident
in VMEM, step streams pipelined via BlockSpecs.

Scheme: Rößler SRIW1 (the tableau in ops/solve.py:_step_srk, pathwise-
verified against torchsde's SRID2 on shared (dW, I10) in
tests/test_solve.py). The tableau collapses nicely for fusion:

  * drift stages 2/3 coincide with stage 0 (A0/B0 rows are zero and
    c0 = 0), and alpha[2:] = 0 — only TWO distinct drift MLP evaluations
    per step: f0 = f(t, y) and f1 = f(t + 3/4 dt, H0_1);
  * four diffusion evaluations at three distinct stage times
    (t, t + dt/4, t + dt) and four states (y, H1_1, H1_2, H1_3).

Per-stage control/time features are precomputed outside the kernel (xh0/
xh1 for the two drift stage times; a0/a1 time-bias rows; gk0/gk1/gk2 or
an1_0/an1_1/an1_2 for the three noise stage times) exactly like the EM
kernel. dW and the space-time Lévy area I10 stream in; dt=0 padding steps
are exact identities (all stochastic increments zero, guarded 1/dt).

Covers the same full input_option x noise_option grid as fused_em; the
backward is a second Pallas kernel that recomputes all stage states from
the saved trajectory and reverses the tableau using the shared
_drift_bwd/_noise_bwd helpers.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_em import (
    LANE,
    _config,
    _drift_bwd,
    _drift_forward,
    _flatten_params,
    _interpret,
    _mm_mode,
    _noise_bwd,
    _noise_forward,
    _pad_to,
    _pdot,
    _precomp_gk,
    _round_up,
    _time_features,
)

__all__ = ["fused_srk_solve", "supports_fused_srk"]

# SRIW1 y-update weights (ops/solve.py:_SRK_*): alpha for the two live
# drift stages; beta rows evaluated as coeff_i over the 4 noise stages
_ALPHA0, _ALPHA1 = 1.0 / 3.0, 2.0 / 3.0
_BETA1 = (-1.0, 4.0 / 3.0, 2.0 / 3.0, 0.0)
_BETA2 = (-1.0, 4.0 / 3.0, -1.0 / 3.0, 0.0)
_BETA3 = (2.0, -4.0 / 3.0, -2.0 / 3.0, 0.0)
_BETA4 = (-2.0, 5.0 / 3.0, -2.0 / 3.0, 1.0)
# noise stage -> which of the 3 distinct stage times it evaluates at
_NOISE_TIME = (0, 1, 2, 1)


def _srk_input_names(cfg, n_inner):
    names = ["y0"]
    if cfg["drift"] in ("xt", "emb", "embm"):
        names += ["xh0", "xh1"]
    if cfg["drift"] != "xt":
        names += ["wy", "a0", "a1"]
    if cfg["drift"] == "emb":
        names += (["we1", "be"] if cfg["hoist"] else ["we1", "we2", "be"])
    names += [f"w_inner{i}" for i in range(n_inner)]
    names += [f"b_inner{i}" for i in range(n_inner)]
    names += ["wout", "bo", "theta"]
    if cfg["noise"] == "precomp":
        names += ["gk0", "gk1", "gk2"]
    elif cfg["noise"] in ("net1", "net2"):
        names += ["wn1", "an1_0", "an1_1", "an1_2"]
        if cfg["noise"] == "net2":
            names += ["wn2", "bn2"]
    names += ["dw", "i10", "dts"]
    if cfg["srows"]:
        names = [n for n in names if n not in cfg["srows"]]
        names.insert(names.index("dw"), "srow")
    return names


def _srk_bwd_output_names(cfg, n_inner):
    names = []
    if cfg["drift"] in ("xt", "emb", "embm"):
        names += ["dxh0", "dxh1"]
    if cfg["drift"] != "xt":
        names += ["dwy", "da0", "da1"]
    if cfg["drift"] == "emb":
        names += (["dwe1", "dbe"] if cfg["hoist"]
                  else ["dwe1", "dwe2", "dbe"])
    names += [f"dw_inner{i}" for i in range(n_inner)]
    names += [f"db_inner{i}" for i in range(n_inner)]
    names += ["dwout", "dbo", "dtheta"]
    if cfg["noise"] == "precomp":
        names += ["dgk0", "dgk1", "dgk2"]
    elif cfg["noise"] in ("net1", "net2"):
        names += ["dwn1", "dan1_0", "dan1_1", "dan1_2"]
        if cfg["noise"] == "net2":
            names += ["dwn2", "dbn2"]
    names.append("dy0")
    if cfg["srows"]:
        coal = tuple("d" + n for n in cfg["srows"])
        names = [n for n in names if n not in coal]
        names.insert(-1, "dsrow")
    return names


_STEP3 = ("xh0", "xh1", "dw", "i10")          # [M, B, H] streams
_STEP2 = ("a0", "a1", "gk0", "gk1", "gk2", "an1_0", "an1_1", "an1_2")


def _stage_view(r, u, *, drift_idx=None, noise_time=None, srows=None):
    """Per-stage dict for the shared fused_em helpers: maps the
    stage-specific stream slice onto the canonical 'xh'/'a'/'gk'/'an1'
    names the helpers expect. Row streams may ride coalesced in 'srow'
    (SNSDE_FUSED_COALESCE) — unpacked here by row index."""
    srows = srows or ()

    def pick(nm):
        if nm in srows:
            i = srows.index(nm)
            return r["srow"][u, i : i + 1]
        if nm in r:
            return r[nm][u]
        return None

    ru = dict(r)
    if drift_idx is not None:
        if f"xh{drift_idx}" in r:
            ru["xh"] = r[f"xh{drift_idx}"][u]
        a = pick(f"a{drift_idx}")
        if a is not None:
            ru["a"] = a
    if noise_time is not None:
        gk = pick(f"gk{noise_time}")
        if gk is not None:
            ru["gk"] = gk
        an1 = pick(f"an1_{noise_time}")
        if an1 is not None:
            ru["an1"] = an1
    return ru


def _srk_step(cfg, n_inner, r, u, y, dt, s_theta):
    """One SRIW1 step. Returns (y1, saves) with every stage state/aux the
    backward needs (the backward calls this again to recompute)."""
    f32 = jnp.float32
    dw = r["dw"][u].astype(f32)
    i10 = r["i10"][u].astype(f32)
    sqrt_dt = jnp.sqrt(dt)
    # dt=0 padding steps: guarded reciprocals keep them exact identities
    rdt = jnp.where(dt > 0.0, 1.0 / jnp.maximum(dt, 1e-30), 0.0)
    rsq = jnp.where(dt > 0.0,
                    1.0 / jnp.maximum(sqrt_dt, 1e-30), 0.0)

    r_f0 = _stage_view(r, u, drift_idx=0, srows=cfg["srows"])
    f0, auxf0 = _drift_forward(cfg, n_inner, r_f0, y)

    def g_eval(t_idx, state):
        rv = _stage_view(r, u, noise_time=t_idx, srows=cfg["srows"])
        graw, base, naux = _noise_forward(cfg, rv, state)
        g = jnp.tanh(s_theta * graw)
        return g, (graw, base, naux)

    g0, s0 = g_eval(0, y)
    H1_1 = y + 0.25 * dt * f0 + 0.5 * sqrt_dt * g0
    g1, s1 = g_eval(1, H1_1)
    H1_2 = y + dt * f0 - sqrt_dt * g0
    g2, s2 = g_eval(2, H1_2)
    H1_3 = y + 0.25 * dt * f0 + sqrt_dt * (
        -5.0 * g0 + 3.0 * g1 + 0.5 * g2
    )
    g3, s3 = g_eval(1, H1_3)
    H0_1 = y + 0.75 * dt * f0 + 1.5 * (i10 * rdt) * g0
    r_f1 = _stage_view(r, u, drift_idx=1, srows=cfg["srows"])
    f1, auxf1 = _drift_forward(cfg, n_inner, r_f1, H0_1)

    I1 = dw
    I11s = 0.5 * (dw * dw - dt) * rsq           # I11 / sqrt(dt)
    I111r = (dw * dw * dw - 3.0 * dt * dw) * (rdt / 6.0)
    I10r = i10 * rdt
    coeffs = [
        _BETA1[i] * I1 + _BETA2[i] * I11s + _BETA3[i] * I10r
        + _BETA4[i] * I111r
        for i in range(4)
    ]
    y1 = y + dt * (_ALPHA0 * f0 + _ALPHA1 * f1)
    for c, g in zip(coeffs, (g0, g1, g2, g3)):
        y1 = y1 + c * g

    saves = (dw, i10, sqrt_dt, rdt, f0, auxf0, f1, auxf1,
             (g0, g1, g2, g3), (s0, s1, s2, s3),
             (H1_1, H1_2, H1_3, H0_1), coeffs)
    return y1, saves


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg, n_inner, U, names, *refs):
    r = dict(zip(names, refs[: len(names)]))
    ys_ref, y_scr = refs[len(names) :]

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        y_scr[:] = r["y0"][:]

    y = y_scr[:]
    s_theta = jax.nn.sigmoid(r["theta"][:])      # [1, H] per-lane theta
    for u in range(U):
        dt = r["dts"][k * U + u, 0]
        y, _ = _srk_step(cfg, n_inner, r, u, y, dt, s_theta)
        ys_ref[u] = y.astype(ys_ref.dtype)
    y_scr[:] = y


def _specs_for(names, nk, B, H, block_b, U, reverse=False, srows=None):
    if reverse:
        s3 = pl.BlockSpec((U, block_b, H), lambda b, k: (nk - 1 - k, b, 0),
                          memory_space=pltpu.VMEM)
        s2 = pl.BlockSpec((U, 1, H), lambda b, k: (nk - 1 - k, 0, 0),
                          memory_space=pltpu.VMEM)
    else:
        s3 = pl.BlockSpec((U, block_b, H), lambda b, k: (k, b, 0),
                          memory_space=pltpu.VMEM)
        s2 = pl.BlockSpec((U, 1, H), lambda b, k: (k, 0, 0),
                          memory_space=pltpu.VMEM)
    w = pl.BlockSpec((H, H), lambda b, k: (0, 0), memory_space=pltpu.VMEM)
    bsp = pl.BlockSpec((1, H), lambda b, k: (0, 0), memory_space=pltpu.VMEM)
    by_name = {
        "y0": pl.BlockSpec((block_b, H), lambda b, k: (b, 0),
                           memory_space=pltpu.VMEM),
        "yprev": s3, "gys": s3,
        "dts": pl.BlockSpec(memory_space=pltpu.SMEM),
        "theta": pl.BlockSpec((1, H), lambda b, k: (0, 0),
                              memory_space=pltpu.VMEM),
    }
    for n in _STEP3:
        by_name[n] = s3
    for n in _STEP2:
        by_name[n] = s2
    if srows:
        R = len(srows)
        by_name["srow"] = pl.BlockSpec(
            (U, R, H),
            (lambda b, k: (nk - 1 - k, 0, 0)) if reverse
            else (lambda b, k: (k, 0, 0)),
            memory_space=pltpu.VMEM,
        )
    out = []
    for n in names:
        if n in by_name:
            out.append(by_name[n])
        elif n.startswith("b_inner") or n in ("be", "bo", "bn2"):
            out.append(bsp)
        else:                         # square weights
            out.append(w)
    return out


def _fused_srk_forward(params, streams, dts, y0, *, cfg, n_inner,
                       block_b, unroll):
    M = dts.shape[0]
    B, H = y0.shape
    U = unroll
    nk = M // U
    nb = B // block_b
    names = _srk_input_names(cfg, n_inner)
    vals = {"y0": y0, "dts": dts, **_flatten_params(params), **streams}
    args = [vals[n] for n in names]
    in_specs = _specs_for(names, nk, B, H, block_b, U,
                          srows=cfg["srows"])

    out_spec = pl.BlockSpec(
        (U, block_b, H), lambda b, k: (k, b, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_fwd_kernel, cfg, n_inner, U, names)
    ys = pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (M, B, H),
            jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    return ys


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg, n_inner, U, in_names, out_names, *refs):
    n_in = len(in_names)
    n_out = len(out_names)
    r = dict(zip(in_names, refs[:n_in]))
    o = dict(zip(out_names, refs[n_in : n_in + n_out]))
    gbar_scr, dth_scr = refs[n_in + n_out :]

    k = pl.program_id(1)
    nk = pl.num_programs(1)

    acc_names = [n for n in out_names
                 if n not in ("dxh0", "dxh1", "da0", "da1", "dgk0", "dgk1",
                              "dgk2", "dan1_0", "dan1_1", "dan1_2",
                              "dsrow", "dy0", "dtheta")]
    srows = cfg["srows"] or ()

    def row_set(name, u, val, add=False):
        """Write a per-step row cotangent, routed into dsrow when its
        stream rides coalesced."""
        base = name[1:]
        if base in srows:
            i = srows.index(base)
            if add:
                o["dsrow"][0, u, i] += val[0]
            else:
                o["dsrow"][0, u, i] = val[0]
        elif name in o:
            if add:
                o[name][0, u] += val
            else:
                o[name][0, u] = val

    @pl.when(k == 0)
    def _():
        gbar_scr[:] = jnp.zeros_like(gbar_scr)
        dth_scr[:] = jnp.zeros_like(dth_scr)
        for n in acc_names:
            o[n][0] = jnp.zeros_like(o[n][0])

    gbar = gbar_scr[:]
    dth = dth_scr[:]                              # [1, H]
    s_theta = jax.nn.sigmoid(r["theta"][:])      # [1, H]
    ds_dtheta = s_theta * (1.0 - s_theta)

    for u in range(U - 1, -1, -1):
        gbar = gbar + r["gys"][u].astype(jnp.float32)
        y = r["yprev"][u].astype(jnp.float32)
        dt = r["dts"][(nk - 1 - k) * U + u, 0]

        # recompute every stage of the forward step
        _, saves = _srk_step(cfg, n_inner, r, u, y, dt, s_theta)
        (dw, i10, sqrt_dt, rdt, f0, auxf0, f1, auxf1, gs, noise_saves,
         states, coeffs) = saves
        H1_1, H1_2, H1_3, H0_1 = states

        # ---- reverse the y-update ----
        df0 = gbar * (_ALPHA0 * dt)
        df1 = gbar * (_ALPHA1 * dt)
        dgs = [gbar * c for c in coeffs]
        dy = gbar                                 # direct y term

        def g_bwd(stage, state, dg_stage):
            """Reverse one diffusion stage; returns dstate."""
            nonlocal dth
            graw, base, naux = noise_saves[stage]
            g = gs[stage]
            dsg = dg_stage * (1.0 - g * g)
            dth = dth + (jnp.sum(dsg * graw, axis=0, keepdims=True)
                         * ds_dtheta)
            dgraw = dsg * s_theta
            rv = _stage_view(r, u, noise_time=_NOISE_TIME[stage],
                             srows=srows)
            dstate, nex = _noise_bwd(cfg, rv, state, base, naux, dgraw, o)
            t_idx = _NOISE_TIME[stage]
            if "dgk" in nex:
                row_set(f"dgk{t_idx}", u, nex["dgk"], add=True)
            if "dan1" in nex:
                row_set(f"dan1_{t_idx}", u, nex["dan1"], add=True)
            return dstate

        # noise-stage stream cotangents accumulate across stages sharing a
        # stage time (1 and 3) — zero the per-step rows first
        for t_idx in (0, 1, 2):
            for nm in (f"gk{t_idx}", f"an1_{t_idx}"):
                if nm in srows:
                    i = srows.index(nm)
                    o["dsrow"][0, u, i] = jnp.zeros_like(
                        o["dsrow"][0, u, i])
                elif "d" + nm in o:
                    o["d" + nm][0, u] = jnp.zeros_like(o["d" + nm][0, u])

        # stage f1 (state H0_1 = y + 3/4 dt f0 + 3/2 (I10/dt) g0)
        r_f1 = _stage_view(r, u, drift_idx=1, srows=srows)
        dH01, dex1 = _drift_bwd(cfg, n_inner, r_f1, H0_1, auxf1, df1, o)
        dy = dy + dH01
        df0 = df0 + 0.75 * dt * dH01
        dgs[0] = dgs[0] + 1.5 * (i10 * rdt) * dH01
        if "da" in dex1:
            row_set("da1", u, dex1["da"])
        if "dxh" in dex1:
            o["dxh1"][u] = dex1["dxh"].astype(o["dxh1"].dtype)

        # stage g3 (state H1_3 = y + 1/4 dt f0 + sqrt_dt(-5 g0 + 3 g1 + ½ g2))
        dH13 = g_bwd(3, H1_3, dgs[3])
        dy = dy + dH13
        df0 = df0 + 0.25 * dt * dH13
        dgs[0] = dgs[0] - 5.0 * sqrt_dt * dH13
        dgs[1] = dgs[1] + 3.0 * sqrt_dt * dH13
        dgs[2] = dgs[2] + 0.5 * sqrt_dt * dH13

        # stage g2 (state H1_2 = y + dt f0 − sqrt_dt g0)
        dH12 = g_bwd(2, H1_2, dgs[2])
        dy = dy + dH12
        df0 = df0 + dt * dH12
        dgs[0] = dgs[0] - sqrt_dt * dH12

        # stage g1 (state H1_1 = y + 1/4 dt f0 + ½ sqrt_dt g0)
        dH11 = g_bwd(1, H1_1, dgs[1])
        dy = dy + dH11
        df0 = df0 + 0.25 * dt * dH11
        dgs[0] = dgs[0] + 0.5 * sqrt_dt * dH11

        # stage g0 (state y)
        dy = dy + g_bwd(0, y, dgs[0])

        # stage f0 (state y)
        r_f0 = _stage_view(r, u, drift_idx=0, srows=srows)
        dyf0, dex0 = _drift_bwd(cfg, n_inner, r_f0, y, auxf0, df0, o)
        dy = dy + dyf0
        if "da" in dex0:
            row_set("da0", u, dex0["da"])
        if "dxh" in dex0:
            o["dxh0"][u] = dex0["dxh"].astype(o["dxh0"].dtype)

        gbar = dy

    gbar_scr[:] = gbar
    dth_scr[:] = dth

    @pl.when(k == nk - 1)
    def _():
        o["dy0"][0] = gbar_scr[:]
        o["dtheta"][0] = dth_scr[:]


def _fused_srk_backward(params, streams, dts, y0, ys, gys, *, cfg,
                        n_inner, block_b, unroll):
    M, B, H = ys.shape
    U = unroll
    nk = M // U
    nb = B // block_b

    traj = jnp.concatenate([y0[None].astype(ys.dtype), ys], axis=0)

    in_names = (["yprev", "gys"]
                + [n for n in _srk_input_names(cfg, n_inner) if n != "y0"])
    vals = {"yprev": traj[:-1], "gys": gys[1:], "dts": dts,
            **_flatten_params(params), **streams}
    args = [vals[n] for n in in_names]
    in_specs = _specs_for(in_names, nk, B, H, block_b, U, reverse=True,
                          srows=cfg["srows"])

    out_names = _srk_bwd_output_names(cfg, n_inner)
    stream_dtype = jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32
    s3_out = ((M, B, H), stream_dtype,
              pl.BlockSpec((U, block_b, H),
                           lambda b, k: (nk - 1 - k, b, 0),
                           memory_space=pltpu.VMEM))
    s2_out = ((nb, M, 1, H), jnp.float32,
              pl.BlockSpec((1, U, 1, H),
                           lambda b, k: (b, nk - 1 - k, 0, 0),
                           memory_space=pltpu.VMEM))
    shape_by = {
        "dxh0": s3_out, "dxh1": s3_out,
        "da0": s2_out, "da1": s2_out,
        "dgk0": s2_out, "dgk1": s2_out, "dgk2": s2_out,
        "dan1_0": s2_out, "dan1_1": s2_out, "dan1_2": s2_out,
        **({"dsrow": ((nb, M, len(cfg["srows"]), H), jnp.float32,
                      pl.BlockSpec(
                          (1, U, len(cfg["srows"]), H),
                          lambda b, k: (b, nk - 1 - k, 0, 0),
                          memory_space=pltpu.VMEM))}
           if cfg["srows"] else {}),
        "dy0": ((nb, block_b, H), jnp.float32,
                pl.BlockSpec((1, block_b, H), lambda b, k: (b, 0, 0),
                             memory_space=pltpu.VMEM)),
        "dtheta": ((nb, 1, H), jnp.float32,
                   pl.BlockSpec((1, 1, H), lambda b, k: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
    }
    w_out = ((nb, H, H), jnp.float32,
             pl.BlockSpec((1, H, H), lambda b, k: (b, 0, 0),
                          memory_space=pltpu.VMEM))
    b_out = ((nb, 1, H), jnp.float32,
             pl.BlockSpec((1, 1, H), lambda b, k: (b, 0, 0),
                          memory_space=pltpu.VMEM))

    out_shapes, out_specs = [], []
    for n in out_names:
        if n in shape_by:
            shp, dt_, spec = shape_by[n]
        elif n.startswith("db_inner") or n in ("dbe", "dbo", "dbn2"):
            shp, dt_, spec = b_out
        else:
            shp, dt_, spec = w_out
        out_shapes.append(jax.ShapeDtypeStruct(shp, dt_))
        out_specs.append(spec)

    kernel = functools.partial(_bwd_kernel, cfg, n_inner, U, in_names,
                               out_names)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),           # gbar
            pltpu.VMEM((1, H), jnp.float32),                 # dtheta acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    out = dict(zip(out_names, outs))

    dparams = {"theta": jnp.sum(out["dtheta"], axis=0)}
    if cfg["drift"] != "xt":
        dparams["wy"] = jnp.sum(out["dwy"], axis=0)
    if cfg["drift"] == "emb":
        dparams["we1"] = jnp.sum(out["dwe1"], axis=0)
        if not cfg["hoist"]:
            dparams["we2"] = jnp.sum(out["dwe2"], axis=0)
        dparams["be"] = jnp.sum(out["dbe"], axis=0)
    dparams["w_inner"] = tuple(
        jnp.sum(out[f"dw_inner{i}"], axis=0) for i in range(n_inner)
    )
    dparams["b_inner"] = tuple(
        jnp.sum(out[f"db_inner{i}"], axis=0) for i in range(n_inner)
    )
    dparams["wout"] = jnp.sum(out["dwout"], axis=0)
    dparams["bo"] = jnp.sum(out["dbo"], axis=0)
    if cfg["noise"] in ("net1", "net2"):
        dparams["wn1"] = jnp.sum(out["dwn1"], axis=0)
        if cfg["noise"] == "net2":
            dparams["wn2"] = jnp.sum(out["dwn2"], axis=0)
            dparams["bn2"] = jnp.sum(out["dbn2"], axis=0)

    dstreams = {}
    for n in ("xh0", "xh1"):
        if f"d{n}" in out:
            dstreams[n] = out[f"d{n}"]
    for n in ("a0", "a1", "gk0", "gk1", "gk2", "an1_0", "an1_1", "an1_2"):
        if f"d{n}" in out:
            dstreams[n] = jnp.sum(out[f"d{n}"], axis=0)
    if "dsrow" in out:
        dstreams["srow"] = jnp.sum(out["dsrow"], axis=0)

    dy0 = out["dy0"].reshape(-1, out["dy0"].shape[-1])
    return dparams, dstreams, dy0


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def _pick_block(B, Hp=LANE, bwd=False, mm=True):
    # SRK streams 2x the EM kernel's per-iteration VMEM (xh0/xh1, dw/i10,
    # three gk rows), so its sweet spot sits one notch below EM's:
    # cap_rows=512 (512-row blocks measured 28.1M vs 26.9M at 256 on
    # v5e). Shared block-picking algorithm lives in fused_em._pick_block.
    # Exact-f32 / bf16x3 matmuls (mm is not True) need Mosaic
    # operand-split scratch on top of that: the BACKWARD overflows scoped
    # VMEM at 512 rows under exact f32 (17.06M > 16M, round-4
    # ab/srk_baseline.log), so those modes drop the backward one notch.
    from .fused_em import _pick_block as _pick

    cap = 256 if (bwd and mm is not True) else 512
    return _pick(B, Hp, cap_rows=cap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_srk(params, streams, y0, dts_tuple, cfg_key, n_inner, unroll):
    cfg = _config(*cfg_key)
    dts = jnp.asarray(np.asarray(dts_tuple, np.float32))[:, None]
    return _fused_srk_forward(params, streams, dts, y0, cfg=cfg,
                              n_inner=n_inner,
                              block_b=_pick_block(*y0.shape),
                              unroll=unroll)


def _fused_srk_fwd(params, streams, y0, dts_tuple, cfg_key, n_inner,
                   unroll):
    ys = _fused_srk(params, streams, y0, dts_tuple, cfg_key, n_inner,
                    unroll)
    return ys, (params, streams, y0, ys)


def _fused_srk_bwd(dts_tuple, cfg_key, n_inner, unroll, res, gys_full):
    params, streams, y0, ys = res
    cfg = _config(*cfg_key)
    dts = jnp.asarray(np.asarray(dts_tuple, np.float32))[:, None]
    dparams, dstreams, dy0 = _fused_srk_backward(
        params, streams, dts, y0, ys,
        jnp.concatenate([jnp.zeros_like(gys_full[:1]), gys_full], axis=0),
        cfg=cfg, n_inner=n_inner,
        block_b=_pick_block(*y0.shape, bwd=True, mm=cfg["mm_bf16"]),
        unroll=unroll,
    )
    for k, v in streams.items():
        if k not in dstreams:
            dstreams[k] = jnp.zeros_like(v)
    for k, v in params.items():
        if k not in dparams:
            dparams[k] = jax.tree_util.tree_map(jnp.zeros_like, v)
    return dparams, dstreams, dy0


_fused_srk.defvjp(_fused_srk_fwd, _fused_srk_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def supports_fused_srk(field) -> bool:
    """Same coverage as the EM kernel: the full 7x20 grid."""
    io = getattr(field, "input_option", None)
    no = getattr(field, "noise_option", None)
    if io is None or no is None:
        return False
    return 0 <= io <= 6 and 0 <= no <= 19


def fused_srk_solve(field, path, times, y0, key, dt=None,
                    stream_dtype=None, brownian_override=None,
                    xh_override=None):
    """Drop-in SRIW1 solve for a supported DiffusionField. Returns
    ys [T, B, H] on the output times. Key handling matches
    ops.solve.sdeint (kw -> dW, ku -> Lévy area) so the same seed draws
    the same (dW, I10) on the fused and scan paths."""
    import os

    if stream_dtype is None:
        stream_dtype = (
            jnp.bfloat16
            if os.environ.get("SNSDE_FUSED_STREAM", "f32") == "bf16"
            else jnp.float32
        )
    from ..ops.solve import make_grid, sdeint
    from ..ops.brownian import brownian_increments, space_time_levy_area
    from ..models.neuralsde import resolve_dt
    from .fused_em import is_batched

    dt = resolve_dt(times) if dt is None else dt
    if is_batched(field, path, y0, key):
        # Route the vmap axis onto the lane-packed SRK kernel (custom
        # batching rule — see fused_em_solve's guard); scan fallback only
        # for packed-caller overrides or SNSDE_VMAP_ROUTE=0.
        if (brownian_override is None and xh_override is None
                and os.environ.get("SNSDE_VMAP_ROUTE", "1") != "0"):
            from .multi import route_vmapped

            return route_vmapped("srk", field, path, times, y0, key, dt,
                                 stream_dtype)
        import warnings

        warnings.warn(
            "fused_srk_solve called under vmap: falling back to the ~6x "
            "slower scan path (Mosaic mis-compiles the fused kernel's "
            "scratch carry under vmap). For batched same-config solves "
            "use snsde.kernels.multi (lane packing / SeedEnsemble).",
            stacklevel=2,
        )
        return sdeint(field.f, field.g, y0, times, key=key, dt=dt,
                      method="srk")
    grid, out_idx = make_grid(times, dt)
    M = grid.shape[0] - 1
    B = y0.shape[0]
    H = field.linear_out.out_features
    HH = field.linear_out.in_features
    Hp = _round_up(max(H, HH, 8), LANE)
    n_inner = len(field.linears)
    io = field.input_option
    no = field.noise_option
    mm_bf16 = _mm_mode()
    traj_bf16 = stream_dtype == jnp.bfloat16
    # merge default ON (round-4 v5e: +8.2% under bf16x3, 23.2M vs 21.5M;
    # see fused_em for the full matrix)
    merged = os.environ.get("SNSDE_FUSED_MERGE", "1") != "0"
    coalesce = os.environ.get("SNSDE_FUSED_COALESCE", "0") == "1"
    hoist = os.environ.get("SNSDE_FUSED_HOIST", "1") != "0"
    cfg_key = (io, no, mm_bf16, False, H, traj_bf16, merged, coalesce,
               True, False, 0, hoist)
    cfg = _config(*cfg_key)
    time_emb = io in (3, 4, 5, 6)

    if brownian_override is not None:
        # caller-supplied (dW, I10) [M, B, H] — lane-packed multi-model
        # solves draw per model with per-model keys and concatenate
        dW, I10 = brownian_override
    else:
        kw, ku = jax.random.split(key)
        dW = brownian_increments(kw, grid, (B, H), jnp.float32)
        I10 = space_time_levy_area(ku, grid, (B, H), dW, jnp.float32)

    dts_np = np.diff(grid).astype(np.float64)
    t0_np = grid[:-1]
    # stage-time vectors (host-side, concrete): drift at (t, t + 3/4 dt),
    # diffusion at (t, t + dt/4, t + dt)
    td = [t0_np, t0_np + 0.75 * dts_np]
    tn = [t0_np, t0_np + 0.25 * dts_np, grid[1:]]

    streams = {
        "dw": _pad_to(dW, Hp, 2).astype(stream_dtype),
        "i10": _pad_to(I10, Hp, 2).astype(stream_dtype),
    }
    # theta as a [1, Hp] lane row (per-model rows under lane packing)
    th = field.theta.astype(jnp.float32).reshape(1, -1)
    if th.shape[1] == 1:
        th = jnp.broadcast_to(th, (1, Hp))
    else:
        th = _pad_to(th, Hp, 1)
    params = {"theta": th}

    # --- drift precompute per stage time ---
    if cfg["drift"] in ("xt", "emb", "embm"):
        for i, tv in enumerate(td):
            if xh_override is not None:
                # per-stage caller-supplied embedded control streams
                # [M, B, H_total], PRE-we2 (lane packing with per-member
                # paths; the packed block-diagonal we2 is applied below)
                Xh = xh_override[i]
            else:
                Xg = path.evaluate_grid(tv)              # [M, B, C]
                Xh = (_pdot(Xg, field.initial_network.weight)
                      + field.initial_network.bias)
            if cfg["drift"] == "embm" or (cfg["drift"] == "emb"
                                          and cfg["hoist"]):
                # HOIST (see fused_em_solve): the y-independent xh @ we2
                # leaves the kernel's step loop; dwe2 via XLA autodiff
                Xh = _pdot(Xh, field.emb.weight[H:])
            streams[f"xh{i}"] = _pad_to(Xh, Hp, 2).astype(stream_dtype)
    if cfg["drift"] != "xt":
        w_in = field.linear_in.weight
        if time_emb:
            Wt = w_in[:2]
            Wy = w_in[2:]
        else:
            Wy = w_in
        we1 = field.emb.weight[:H] if cfg["drift"] == "embm" else None
        if we1 is not None:
            # MERGE (see fused_em_solve): wy@we1 / a@we1 + be folded here
            Wy = _pdot(Wy, we1)
        params["wy"] = _pad_to(_pad_to(Wy, Hp, 0), Hp, 1)
        for i, tv in enumerate(td):
            if time_emb:
                a = (_pdot(_time_features(jnp.asarray(tv, jnp.float32)),
                           Wt)
                     + field.linear_in.bias)
            else:
                a = jnp.broadcast_to(field.linear_in.bias,
                                     (M, w_in.shape[1]))
            if we1 is not None:
                a = _pdot(a, we1) + field.emb.bias
            streams[f"a{i}"] = _pad_to(a, Hp, 1)[:, None, :]
    if cfg["drift"] == "emb":
        params["we1"] = _pad_to(_pad_to(field.emb.weight[:H], Hp, 0), Hp, 1)
        if not cfg["hoist"]:
            params["we2"] = _pad_to(
                _pad_to(field.emb.weight[H:], Hp, 0), Hp, 1)
        params["be"] = _pad_to(field.emb.bias, Hp, 0)[None]

    params["w_inner"] = tuple(
        _pad_to(_pad_to(l.weight, Hp, 0), Hp, 1) for l in field.linears
    )
    params["b_inner"] = tuple(
        _pad_to(l.bias, Hp, 0)[None] for l in field.linears
    )
    params["wout"] = _pad_to(_pad_to(field.linear_out.weight, Hp, 0), Hp, 1)
    params["bo"] = _pad_to(field.linear_out.bias, Hp, 0)[None]

    # --- diffusion precompute per stage time ---
    if cfg["noise"] == "precomp":
        for i, tv in enumerate(tn):
            gk = _precomp_gk(field, no, jnp.asarray(tv, jnp.float32))
            streams[f"gk{i}"] = _pad_to(gk, Hp, 1)[:, None, :]
    elif cfg["noise"] in ("net1", "net2"):
        n1 = field.noise_y[0]
        Wt_n = n1.weight[:2]
        Wy_n = n1.weight[2:]
        params["wn1"] = _pad_to(_pad_to(Wy_n, Hp, 0), Hp, 1)
        for i, tv in enumerate(tn):
            an1 = (_pdot(_time_features(jnp.asarray(tv, jnp.float32)),
                         Wt_n)
                   + n1.bias)
            streams[f"an1_{i}"] = _pad_to(an1, Hp, 1)[:, None, :]
        if cfg["noise"] == "net2":
            n2 = field.noise_y[1]
            params["wn2"] = _pad_to(_pad_to(n2.weight, Hp, 0), Hp, 1)
            params["bn2"] = _pad_to(n2.bias, Hp, 0)[None]

    if cfg["srows"]:
        # SNSDE_FUSED_COALESCE: one [M, R, Hp] stream for the 5 per-step
        # stage rows — one block DMA per grid iteration instead of 5
        streams["srow"] = jnp.concatenate(
            [streams.pop(n) for n in cfg["srows"]], axis=1)

    y0p = _pad_to(y0.astype(jnp.float32), Hp, 1)

    U = int(os.environ.get("SNSDE_FUSED_UNROLL", "4"))
    U = max(1, min(U, M))
    Mp = _round_up(M, U)
    pad_steps = Mp - M
    dts_list = np.diff(grid).astype(np.float32).tolist()
    if pad_steps:
        streams = {
            k: jnp.pad(v, ((0, pad_steps),) + ((0, 0),) * (v.ndim - 1))
            for k, v in streams.items()
        }
        dts_list += [0.0] * pad_steps
    dts_tuple = tuple(dts_list)
    ys = _fused_srk(params, streams, y0p, dts_tuple, cfg_key, n_inner, U)
    full = jnp.concatenate([y0p[None].astype(ys.dtype), ys[:M]], axis=0)
    return full[jnp.asarray(out_idx)][..., :H].astype(jnp.float32)
