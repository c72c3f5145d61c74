"""Fused explicit-Runge–Kutta CDE solver kernel (Pallas/TPU).

The NCDE family (reference torch-ists diff_module/NCDE/ncde_model.py and
benchmark_classification/models/metamodel.py:109-118, default rk4 with
step_size) integrates dz = f(z) dX(t) with a MATRIX-valued vector field
f(z) in R^{H x C}: per RK stage, an MLP z -> [B, H*C] followed by a
per-sample contraction with the control derivative dX/dt in R^C. Under
`lax.scan` each step pays the same per-iteration XLA loop overhead + HBM
weight re-reads that motivated the fused EM/SRK kernels — this kernel
runs the ENTIRE time loop on-chip: weights live in VMEM across all steps,
the per-stage control derivatives are pipelined in as one packed stream,
and the state never leaves VMEM.

TPU-native handling of the [B, H, C] x [B, C] contraction (the op torch
does with a batched matvec): the field output is kept FLAT and h-major
(O[b, h*C + c], lanes = H*C zero-padded to 128), and both sides of the
contraction become one-hot MXU matmuls that are layout-trivial and exact
in f32:

    Dx = d @ E_s      E_s[s*C + c, h*C + c] = 1   (broadcast d over h)
    k  = (O * Dx) @ S S[h*C + c, h]         = 1   (sum over c per h)

The per-step control stream packs ALL distinct stage times into one row
(d[b, s*C + c], lanes = n_stage_times*C padded to 128 — for typical C
every RK4 stage fits a single 128-lane row), so each grid iteration DMAs
exactly one stream block.

Methods: any explicit tableau in _TABLEAUS (euler/midpoint/heun/rk2/rk4 —
rk4 is the reference default). Training uses a custom VJP whose backward
is a second Pallas kernel: reverse time loop, stage states recomputed
from the saved step trajectory (k-increments first, then per-stage wide
intermediates on demand — nothing [*, H*C]-wide is kept across stages),
weight-gradient accumulators resident in VMEM. Unlike the SDE kernels the
control stream IS differentiated (dd = (dP * O) @ E_s^T), so gradients
flow to interpolation coefficients exactly — learned-control models keep
working on the fused path.

Set SNSDE_FUSED_INTERPRET=1 to run in Pallas interpret mode (CPU) — used
by tests/test_fused_cde.py to validate every branch without TPU hardware.
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_em import (LANE, _dot, _interpret, _mm_mode, _pad_to,
                       _pick_block,
                       _round_up, is_batched)

__all__ = ["fused_cde_solve", "supports_fused_cde", "FUSED_CDE_METHODS"]


# ---------------------------------------------------------------------------
# Explicit RK tableaus: method -> (c, A, b). Stage i evaluates at
# t + c[i]*h on state z + h * sum_j A[i][j] * k_j; update is
# z + h * sum_i b[i] * k_i. Matches ops/solve.py's _ODE_STEPPERS exactly.
# ---------------------------------------------------------------------------

_TABLEAUS = {
    "euler": ((0.0,), ((),), (1.0,)),
    "midpoint": ((0.0, 0.5), ((), (0.5,)), (0.0, 1.0)),
    "heun": ((0.0, 1.0), ((), (1.0,)), (0.5, 0.5)),
    "rk4": (
        (0.0, 0.5, 0.5, 1.0),
        ((), (0.5,), (0.0, 0.5), (0.0, 0.0, 1.0)),
        (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0),
    ),
}
_TABLEAUS["rk2"] = _TABLEAUS["heun"]

FUSED_CDE_METHODS = frozenset(_TABLEAUS)

# VMEM guards: the out-projection weight [HHp, CHp] (and its gradient
# accumulator) must stay well under the ~16 MB VMEM budget alongside the
# one-hot matrices and stream blocks.
_MAX_WOUT_BYTES = 4 * 1024 * 1024
_MAX_LANES = 4096


def _stage_times(method):
    """Distinct stage-time offsets (ordered) + per-stage index into them."""
    c, _, _ = _TABLEAUS[method]
    uniq = sorted(set(c))
    return tuple(uniq), tuple(uniq.index(ci) for ci in c)


def _stage_grid(grid, hs, ut):
    """Stage-time array [M * len(ut)] replicating the scan steppers' f32
    arithmetic BIT-EXACTLY (_ode_rk4 computes t0 + 0.5*dt / t0 + dt on
    f32 scalars). Piecewise-LINEAR controls have discontinuous
    derivatives at knots, so a stage time 1 ulp across a knot picks a
    different segment slope — f64-exact knot landings would diverge from
    the scan path there (cubic controls never see this: their derivative
    is continuous)."""
    t32 = grid[:-1].astype(np.float32)
    h32 = hs.astype(np.float32)
    cols = []
    for u in ut:
        if u == 0.0:
            cols.append(t32)
        elif u == 1.0:
            cols.append(t32 + h32)
        else:
            cols.append(t32 + np.float32(u) * h32)
    return np.stack(cols, axis=1).reshape(-1)


@functools.lru_cache(maxsize=None)
def _config(method, act, n_inner, H, HH, C, mm_bf16, traj_bf16, members=1):
    """members > 1: the field is a lane-packed stack of `members`
    identically-shaped models (kernels/multi.py), each with its OWN
    control path — the packed stream carries members*NT*C derivative
    lanes (member-major) and E_j maps member i's hidden groups onto
    member i's rows. members == 1 is the plain single-model layout."""
    uniq, tidx = _stage_times(method)
    return {
        "method": method,
        "act": act,                       # 'relu' (FinalTanh) | 'tanh'
        "n_inner": n_inner,
        "H": H, "HH": HH, "C": C, "KM": members,
        "Hp": _round_up(max(H, 8), LANE),
        "HHp": _round_up(max(HH, 8), LANE),
        "CHp": _round_up(H * C, LANE),
        "SW": _round_up(members * len(uniq) * C, LANE),
        "ut": uniq,                       # distinct stage-time offsets
        "tidx": tidx,                     # stage -> distinct-time index
        "mm_bf16": mm_bf16,
        "traj_bf16": traj_bf16,
    }


def _onehots(cfg):
    """E_j [SW, CHp] (one per distinct stage time) and S [CHp, Hp] built
    from iota comparisons — computed, not literal, so the remote-runtime
    HLO carries no multi-MB constant payloads (CLAUDE.md HTTP-413).

    With KM packed members (H = KM * H_member), hidden group g = q // C
    belongs to member g // H_member, whose stage-j derivative row in the
    member-major packed stream is member*NT*C + j*C + c."""
    H, C, KM = cfg["H"], cfg["C"], cfg["KM"]
    CHp, SW, Hp = cfg["CHp"], cfg["SW"], cfg["Hp"]
    NT = len(cfg["ut"])
    Hm = H // KM
    q = jnp.arange(CHp)
    c_of_q = q % C
    h_of_q = q // C
    m_of_q = h_of_q // Hm
    valid_q = h_of_q < H
    rows = jnp.arange(SW)[:, None]
    es = []
    for j in range(NT):
        target = jnp.where(valid_q, m_of_q * (NT * C) + j * C + c_of_q,
                           -1)[None, :]
        es.append((rows == target).astype(jnp.float32))
    hcol = jnp.arange(Hp)[None, :]
    smat = jnp.logical_and(
        h_of_q[:, None] == hcol, valid_q[:, None]
    ).astype(jnp.float32)
    return es, smat


# ---------------------------------------------------------------------------
# Shared in-kernel math
# ---------------------------------------------------------------------------

def _act(cfg, z):
    return jnp.maximum(z, 0.0) if cfg["act"] == "relu" else jnp.tanh(z)


def _act_deriv(cfg, z, h):
    if cfg["act"] == "relu":
        return (z > 0.0).astype(jnp.float32)
    return 1.0 - h * h


def _field_forward(cfg, r, y, d, tj):
    """One vector-field evaluation k = (O(y) * (d @ E_tj)) @ S with O the
    flat h-major field output (tanh-MLP for FinalTanh/SingleHiddenLayer,
    continuous GRU gating for GRU_ODE). Returns (k, aux) with the
    intermediates the backward needs."""
    mm = cfg["mm_bf16"]
    if cfg["act"] == "gruode":
        # GRU-ODE field (reference vector_fields.py GRU_ODE):
        # O = (1 - sigmoid(zu)) * (tanh(sigmoid(zr) * zh) - z_expand),
        # where z_expand[b, h*C+c] = y[b, h] rides the S one-hot transpose
        rg = jax.nn.sigmoid(_dot(y, r["wr"][:], mm) + r["br"][:])
        ug = jax.nn.sigmoid(_dot(y, r["wz"][:], mm) + r["bz"][:])
        zh = _dot(y, r["wh"][:], mm) + r["bh"][:]
        gg = jnp.tanh(rg * zh)
        zx = _dot(y, r["smat"][:].T, mm)
        o_mat = (1.0 - ug) * (gg - zx)
        dx = _dot(d, r[f"e{tj}"][:], mm)
        k = _dot(o_mat * dx, r["smat"][:], mm)
        return k, (rg, ug, zh, gg, zx, o_mat, dx)
    z1 = _dot(y, r["win"][:], mm) + r["bin"][:]
    h = _act(cfg, z1)
    z_list, h_list = [z1], [h]
    for i in range(cfg["n_inner"]):
        zz = _dot(h, r[f"w_inner{i}"][:], mm) + r[f"b_inner{i}"][:]
        z_list.append(zz)
        h = _act(cfg, zz)
        h_list.append(h)
    zout = _dot(h, r["wout"][:], mm) + r["bout"][:]
    o_mat = jnp.tanh(zout)
    dx = _dot(d, r[f"e{tj}"][:], mm)
    k = _dot(o_mat * dx, r["smat"][:], mm)
    return k, (z_list, h_list, o_mat, dx)


def _field_bwd(cfg, r, y, aux, dk, o):
    """Reverse one field evaluation. dk = cotangent of k. Accumulates
    weight grads into o; returns (dy, dd) — dd is this stage's cotangent
    of the packed control row (caller adds across stages)."""
    mm = cfg["mm_bf16"]
    if cfg["act"] == "gruode":
        rg, ug, zh, gg, zx, o_mat, dx = aux
        dp = _dot(dk, r["smat"][:].T, mm)
        do = dp * dx
        ddx = dp * o_mat
        dug = -do * (gg - zx)
        dgg = do * (1.0 - ug)
        dzx = -do * (1.0 - ug)
        dgate = dgg * (1.0 - gg * gg)
        drg = dgate * zh
        dzh = dgate * rg
        dzr = drg * rg * (1.0 - rg)
        dzu = dug * ug * (1.0 - ug)
        o["dwr"][0] += _dot(y.T, dzr, mm)
        o["dbr"][0] += jnp.sum(dzr, axis=0, keepdims=True)
        o["dwz"][0] += _dot(y.T, dzu, mm)
        o["dbz"][0] += jnp.sum(dzu, axis=0, keepdims=True)
        o["dwh"][0] += _dot(y.T, dzh, mm)
        o["dbh"][0] += jnp.sum(dzh, axis=0, keepdims=True)
        dy = (_dot(dzr, r["wr"][:].T, mm)
              + _dot(dzu, r["wz"][:].T, mm)
              + _dot(dzh, r["wh"][:].T, mm)
              + _dot(dzx, r["smat"][:], mm))
        return dy, ddx
    z_list, h_list, o_mat, dx = aux
    dp = _dot(dk, r["smat"][:].T, mm)
    do = dp * dx
    ddx = dp * o_mat
    dzout = do * (1.0 - o_mat * o_mat)
    o["dwout"][0] += _dot(h_list[-1].T, dzout, mm)
    o["dbout"][0] += jnp.sum(dzout, axis=0, keepdims=True)
    dh = _dot(dzout, r["wout"][:].T, mm)
    for i in range(cfg["n_inner"] - 1, -1, -1):
        dz = dh * _act_deriv(cfg, z_list[i + 1], h_list[i + 1])
        o[f"dw_inner{i}"][0] += _dot(h_list[i].T, dz, mm)
        o[f"db_inner{i}"][0] += jnp.sum(dz, axis=0, keepdims=True)
        dh = _dot(dz, r[f"w_inner{i}"][:].T, mm)
    dz1 = dh * _act_deriv(cfg, z_list[0], h_list[0])
    o["dwin"][0] += _dot(y.T, dz1, mm)
    o["dbin"][0] += jnp.sum(dz1, axis=0, keepdims=True)
    dy = _dot(dz1, r["win"][:].T, mm)
    return dy, ddx


# ---------------------------------------------------------------------------
# Kernel argument lists
# ---------------------------------------------------------------------------

def _param_names(cfg):
    if cfg["act"] == "gruode":
        core = ["wr", "br", "wz", "bz", "wh", "bh"]
    else:
        core = (["win", "bin"]
                + [f"w_inner{i}" for i in range(cfg["n_inner"])]
                + [f"b_inner{i}" for i in range(cfg["n_inner"])]
                + ["wout", "bout"])
    return core + [f"e{j}" for j in range(len(cfg["ut"]))] + ["smat"]


def _specs_for(names, cfg, nk, block_b, U, reverse=False):
    Hp, HHp, CHp, SW = cfg["Hp"], cfg["HHp"], cfg["CHp"], cfg["SW"]
    kmap = (lambda b, k: (nk - 1 - k, b, 0)) if reverse \
        else (lambda b, k: (k, b, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda b, k: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    by_name = {
        "z0": pl.BlockSpec((block_b, Hp), lambda b, k: (b, 0),
                           memory_space=pltpu.VMEM),
        "yprev": pl.BlockSpec((U, block_b, Hp), kmap,
                              memory_space=pltpu.VMEM),
        "gys": pl.BlockSpec((U, block_b, Hp), kmap,
                            memory_space=pltpu.VMEM),
        "dx": pl.BlockSpec((U, block_b, SW), kmap,
                           memory_space=pltpu.VMEM),
        "dts": pl.BlockSpec(memory_space=pltpu.SMEM),
        "win": const((Hp, HHp)),
        "bin": const((1, HHp)),
        "wout": const((HHp, CHp)),
        "bout": const((1, CHp)),
        "smat": const((CHp, Hp)),
        # GRU-ODE gate projections (H -> H*C, h-major)
        "wr": const((Hp, CHp)), "br": const((1, CHp)),
        "wz": const((Hp, CHp)), "bz": const((1, CHp)),
        "wh": const((Hp, CHp)), "bh": const((1, CHp)),
    }
    for i in range(cfg["n_inner"]):
        by_name[f"w_inner{i}"] = const((HHp, HHp))
        by_name[f"b_inner{i}"] = const((1, HHp))
    for j in range(len(cfg["ut"])):
        by_name[f"e{j}"] = const((SW, CHp))
    return [by_name[n] for n in names]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg, U, names, *refs):
    r = dict(zip(names, refs[: len(names)]))
    ys_ref, z_scr = refs[len(names):]
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        z_scr[:] = r["z0"][:]

    _, A, btab = _TABLEAUS[cfg["method"]]
    tidx = cfg["tidx"]
    z = z_scr[:]
    for u in range(U):
        d = r["dx"][u].astype(jnp.float32)
        h_step = r["dts"][k * U + u, 0]
        ks = []
        for i in range(len(btab)):
            y = z
            for j, aij in enumerate(A[i]):
                if aij:
                    y = y + (aij * h_step) * ks[j]
            ki, _ = _field_forward(cfg, r, y, d, tidx[i])
            ks.append(ki)
        for i, bi in enumerate(btab):
            if bi:
                z = z + (bi * h_step) * ks[i]
        ys_ref[u] = z.astype(ys_ref.dtype)
    z_scr[:] = z


def _fused_cde_forward(params, dx, dts, z0, *, cfg, block_b, unroll):
    M = dts.shape[0]
    B = z0.shape[0]
    U = unroll
    nk = M // U
    nb = B // block_b
    es, smat = _onehots(cfg)
    names = ["z0"] + _param_names(cfg) + ["dx", "dts"]
    vals = {"z0": z0, "dx": dx, "dts": dts, "smat": smat, **params,
            **{f"e{j}": e for j, e in enumerate(es)}}
    args = [vals[n] for n in names]
    out_spec = pl.BlockSpec((U, block_b, cfg["Hp"]), lambda b, k: (k, b, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, cfg, U, names)
    return pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=_specs_for(names, cfg, nk, block_b, U),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (M, B, cfg["Hp"]),
            jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, cfg["Hp"]), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg, U, in_names, out_names, *refs):
    n_in, n_out = len(in_names), len(out_names)
    r = dict(zip(in_names, refs[:n_in]))
    o = dict(zip(out_names, refs[n_in:n_in + n_out]))
    (gbar_scr,) = refs[n_in + n_out:]

    k = pl.program_id(1)
    nk = pl.num_programs(1)
    acc_names = [n for n in out_names if n not in ("ddx", "dz0")]

    @pl.when(k == 0)
    def _():
        gbar_scr[:] = jnp.zeros_like(gbar_scr)
        for n in acc_names:
            o[n][0] = jnp.zeros_like(o[n][0])

    _, A, btab = _TABLEAUS[cfg["method"]]
    tidx = cfg["tidx"]
    n_stages = len(btab)
    gbar = gbar_scr[:]

    for u in range(U - 1, -1, -1):
        gbar = gbar + r["gys"][u].astype(jnp.float32)
        z = r["yprev"][u].astype(jnp.float32)
        d = r["dx"][u].astype(jnp.float32)
        h_step = r["dts"][(nk - 1 - k) * U + u, 0]

        # ---- recompute the stage states (k-increments only: nothing
        # [*, H*C]-wide is kept across stages) ----
        ks, ys = [], []
        for i in range(n_stages):
            y = z
            for j, aij in enumerate(A[i]):
                if aij:
                    y = y + (aij * h_step) * ks[j]
            ys.append(y)
            ki, _ = _field_forward(cfg, r, y, d, tidx[i])
            ks.append(ki)

        # ---- reverse through the tableau ----
        dz = gbar
        dks = [(bi * h_step) * gbar if bi else jnp.zeros_like(gbar)
               for bi in btab]
        dd = jnp.zeros_like(d)
        for i in range(n_stages - 1, -1, -1):
            # wide intermediates recomputed per stage, on demand
            _, aux = _field_forward(cfg, r, ys[i], d, tidx[i])
            dy, ddx_i = _field_bwd(cfg, r, ys[i], aux, dks[i], o)
            # route the Dx cotangent back through E_tj to the packed row
            dd = dd + _dot(ddx_i, r[f"e{tidx[i]}"][:].T, cfg["mm_bf16"])
            dz = dz + dy
            for j, aij in enumerate(A[i]):
                if aij:
                    dks[j] = dks[j] + (aij * h_step) * dy
        o["ddx"][u] = dd.astype(o["ddx"].dtype)
        gbar = dz

    gbar_scr[:] = gbar

    @pl.when(k == nk - 1)
    def _():
        o["dz0"][0] = gbar_scr[:]


def _bwd_output_names(cfg):
    if cfg["act"] == "gruode":
        return ["dwr", "dbr", "dwz", "dbz", "dwh", "dbh", "ddx", "dz0"]
    return (["dwin", "dbin"]
            + [f"dw_inner{i}" for i in range(cfg["n_inner"])]
            + [f"db_inner{i}" for i in range(cfg["n_inner"])]
            + ["dwout", "dbout", "ddx", "dz0"])


def _fused_cde_backward(params, dx, dts, z0, ys, gys, *, cfg, block_b,
                        unroll):
    M, B, Hp = ys.shape
    U = unroll
    nk = M // U
    nb = B // block_b
    HHp, CHp, SW = cfg["HHp"], cfg["CHp"], cfg["SW"]
    es, smat = _onehots(cfg)

    traj = jnp.concatenate([z0[None].astype(ys.dtype), ys], axis=0)
    in_names = ["yprev", "gys"] + _param_names(cfg) + ["dx", "dts"]
    vals = {"yprev": traj[:-1], "gys": gys[1:], "dx": dx, "dts": dts,
            "smat": smat, **params,
            **{f"e{j}": e for j, e in enumerate(es)}}
    args = [vals[n] for n in in_names]
    in_specs = _specs_for(in_names, cfg, nk, block_b, U, reverse=True)

    out_names = _bwd_output_names(cfg)
    stream_dtype = jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32
    acc = lambda shape: (
        (nb,) + shape, jnp.float32,
        pl.BlockSpec((1,) + shape, lambda b, k: (b,) + (0,) * len(shape),
                     memory_space=pltpu.VMEM),
    )
    shape_by = {
        "dwin": acc((Hp, HHp)), "dbin": acc((1, HHp)),
        "dwout": acc((HHp, CHp)), "dbout": acc((1, CHp)),
        "dz0": acc((block_b, Hp)),
        "ddx": ((M, B, SW), stream_dtype,
                pl.BlockSpec((U, block_b, SW),
                             lambda b, k: (nk - 1 - k, b, 0),
                             memory_space=pltpu.VMEM)),
    }
    for i in range(cfg["n_inner"]):
        shape_by[f"dw_inner{i}"] = acc((HHp, HHp))
        shape_by[f"db_inner{i}"] = acc((1, HHp))
    for g_ in ("r", "z", "h"):
        shape_by[f"dw{g_}"] = acc((Hp, CHp))
        shape_by[f"db{g_}"] = acc((1, CHp))

    out_shapes, out_specs = [], []
    for n in out_names:
        shp, dt_, spec = shape_by[n]
        out_shapes.append(jax.ShapeDtypeStruct(shp, dt_))
        out_specs.append(spec)

    kernel = functools.partial(_bwd_kernel, cfg, U, in_names, out_names)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((block_b, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    out = dict(zip(out_names, outs))

    dparams = {k[1:]: jnp.sum(v, axis=0) for k, v in out.items()
               if k not in ("ddx", "dz0")}
    ddx = out["ddx"]
    dz0 = out["dz0"].reshape(-1, Hp)
    return dparams, ddx, dz0


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def _pick_cde_block(B, cfg, bwd=False):
    # budget rows so block * CHp (the wide per-stage intermediates, which
    # are what scale) stays within the EM kernel's measured VMEM envelope:
    # block * CHp <= 256 * 1152 f32 elements (~1.2 MB per live array).
    # The BACKWARD streams gys + ddx on top of the forward's block set and
    # keeps the recomputed per-stage wide intermediates live alongside the
    # weight-grad accumulators — at the bench shape (B=1024, CHp=256) the
    # forward's block overflowed scoped VMEM there (21.76M > 16M, round-3
    # recovery stage2.log) and a half-budget backward block (512 rows)
    # still overflowed (18.27M > 16M, round-4 stage2 bench_cde.log), so
    # the backward budgets a quarter of the rows (block 256 at that
    # shape).
    cap = (256 * 1152) // LANE
    return _pick_block(B, cfg["CHp"], cap_rows=cap // 4 if bwd else cap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_cde(params, dx, z0, dts_tuple, cfg_key, unroll):
    cfg = _config(*cfg_key)
    dts = jnp.asarray(np.asarray(dts_tuple, np.float32))[:, None]
    return _fused_cde_forward(params, dx, dts, z0, cfg=cfg,
                              block_b=_pick_cde_block(z0.shape[0], cfg),
                              unroll=unroll)


def _fused_cde_fwd(params, dx, z0, dts_tuple, cfg_key, unroll):
    ys = _fused_cde(params, dx, z0, dts_tuple, cfg_key, unroll)
    return ys, (params, dx, z0, ys)


def _fused_cde_bwd(dts_tuple, cfg_key, unroll, res, gys_full):
    params, dx, z0, ys = res
    cfg = _config(*cfg_key)
    dts = jnp.asarray(np.asarray(dts_tuple, np.float32))[:, None]
    dparams, ddx, dz0 = _fused_cde_backward(
        params, dx, dts, z0, ys,
        jnp.concatenate([jnp.zeros_like(gys_full[:1]), gys_full], axis=0),
        cfg=cfg, block_b=_pick_cde_block(z0.shape[0], cfg, bwd=True),
        unroll=unroll,
    )
    return dparams, ddx.astype(dx.dtype), dz0


_fused_cde.defvjp(_fused_cde_fwd, _fused_cde_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def _field_kind(func):
    """('relu', n_inner) for FinalTanh, ('tanh', 0) for SingleHiddenLayer,
    ('gruode', 0) for GRUODEField, None for anything else (unknown fields
    stay on the scan path). Lane-packed synthetic fields
    (kernels/multi.py) carry an explicit `fused_cde_kind` attribute."""
    kind = getattr(func, "fused_cde_kind", None)
    if kind is not None:
        return kind
    from ..models.neuralcde import (FinalTanh, GRUODEField,
                                    SingleHiddenLayer)

    if isinstance(func, FinalTanh):
        return "relu", len(func.linears)
    if isinstance(func, SingleHiddenLayer):
        return "tanh", 0
    if isinstance(func, GRUODEField):
        return "gruode", 0
    return None


def supports_fused_cde(func, method: str = "rk4") -> bool:
    """True when (field, method) maps onto the fused CDE kernel:
    FinalTanh/SingleHiddenLayer vector fields (the canonical NCDE fields,
    reference vector_fields.py), any explicit tableau in _TABLEAUS, and
    lane widths within the VMEM guards."""
    if method not in _TABLEAUS:
        return False
    kind = _field_kind(func)
    if kind is None:
        return False
    H, C = func.hidden_channels, func.input_channels
    Hp = _round_up(max(H, 8), LANE)
    if kind[0] == "relu":
        HH = func.linear_in.out_features
    elif kind[0] == "tanh":
        HH = func.linear1.out_features
    else:                              # gruode: three H -> H*C gates
        HH = H
    members = getattr(func, "fused_cde_members", 1)
    uniq, _ = _stage_times(method)
    CHp = _round_up(H * C, LANE)
    HHp = _round_up(max(HH, 8), LANE)
    # gruode keeps THREE [Hp, CHp] gate weights VMEM-resident (plus their
    # gradient accumulators in the backward), so its budget scales by 3
    if kind[0] == "gruode":
        wide_bytes = 3 * Hp * CHp * 4
    else:
        wide_bytes = HHp * CHp * 4
    return (CHp <= _MAX_LANES
            and Hp <= 512
            and _round_up(members * len(uniq) * C, LANE) <= 512
            and wide_bytes <= _MAX_WOUT_BYTES)


def fused_cde_solve(func, path, times, z0, dt=None, method: str = "rk4",
                    stream_dtype=None, members: int = 1,
                    dx_override=None):
    """Drop-in fused solve for  dz = f(z) dX(t)  on a fixed grid.
    Returns zs [T, B, H] on the output times (ops.solve.cdeint layout).

    func: FinalTanh or SingleHiddenLayer (models/neuralcde.py), or a
          lane-packed synthetic field (kernels/multi.py).
    path: control path exposing derivative_grid (CubicPath/LinearPath).
    members/dx_override: packed-caller plumbing — `members` packed models
          with a member-major [M, B, members*NT*C] derivative stream.
    Semantics match cdeint(method=...) on the same make_grid(times, dt)
    grid; gradients flow to the field weights, z0, AND the control path's
    coefficients (the packed derivative stream is differentiated)."""
    from ..ops.solve import cdeint, make_grid

    if stream_dtype is None:
        stream_dtype = (
            jnp.bfloat16
            if os.environ.get("SNSDE_FUSED_STREAM", "f32") == "bf16"
            else jnp.float32
        )
    # dt=None keeps cdeint's semantics (make_grid steps exactly on ts)
    if is_batched(func, path, z0):
        # Route the batch axis onto the lane-packed kernel (custom
        # batching rule, kernels/multi.py) instead of the scan fallback —
        # same policy as fused_em_solve. Overrides are packed-caller
        # plumbing and never come from user vmap.
        if (dx_override is None and members == 1
                and os.environ.get("SNSDE_VMAP_ROUTE", "1") != "0"):
            from .multi import route_vmapped_cde

            return route_vmapped_cde(func, path, times, z0, dt, method,
                                     stream_dtype)
        warnings.warn(
            "fused_cde_solve called under vmap: falling back to the scan "
            "path (Mosaic mis-compiles the fused kernels' scratch carry "
            "under vmap).",
            stacklevel=2,
        )
        return cdeint(path, func, z0, times, dt=dt, method=method)

    act, n_inner = _field_kind(func)
    H, C = func.hidden_channels, func.input_channels
    if act == "relu":
        lin_in, lin_out = func.linear_in, func.linear_out
        inners = func.linears
        HH = lin_in.out_features
    elif act == "tanh":
        lin_in, lin_out = func.linear1, func.linear2
        inners = ()
        HH = lin_in.out_features
    else:                              # gruode
        lin_in = lin_out = None
        inners = ()
        HH = H

    # GRU-ODE is precision-sensitive: its z-feedback through the three
    # gate matmuls amplifies operand rounding — on v5e the scan path NaNs
    # at iter 1 under the platform-default bf16 rounding and the fused
    # path diverged after ~10 iters under bf16x3 (round-4
    # tools/probe_gruode_nan.py; BENCH_CDE_X3.json gruode_rk4). Pin the
    # gruode kind to exact-f32 dots regardless of SNSDE_FUSED_MATMUL.
    mm_bf16 = False if act == "gruode" else _mm_mode()
    traj_bf16 = stream_dtype == jnp.bfloat16
    cfg_key = (method, act, n_inner, H, HH, C, mm_bf16, traj_bf16, members)
    cfg = _config(*cfg_key)
    Hp, HHp, CHp, SW = cfg["Hp"], cfg["HHp"], cfg["CHp"], cfg["SW"]

    grid, out_idx = make_grid(times, dt)
    M = grid.shape[0] - 1
    hs = np.diff(grid)
    B = z0.shape[0]

    if dx_override is not None:
        # caller-supplied member-major packed stream [M, B, KM*NT*C]
        dx = _pad_to(dx_override, SW, 2).astype(stream_dtype)
    else:
        # packed per-step control-derivative rows: d[m, b, j*C + c] =
        # dX/dt at t_m + ut[j]*h_m — every distinct stage time rides ONE
        # stream row
        stage_t = _stage_grid(grid, hs, cfg["ut"])
        dvals = path.derivative_grid(stage_t)        # [M*NT, B, C]
        NT = len(cfg["ut"])
        dvals = jnp.moveaxis(dvals.reshape(M, NT, B, C), 1, 2)
        dx = _pad_to(dvals.reshape(M, B, NT * C), SW, 2).astype(
            stream_dtype)

    if act == "gruode":
        params = {}
        for nm, lin in (("r", func.W_r), ("z", func.W_z), ("h", func.W_h)):
            params[f"w{nm}"] = _pad_to(_pad_to(lin.weight, Hp, 0), CHp, 1)
            params[f"b{nm}"] = _pad_to(lin.bias, CHp, 0)[None]
    else:
        params = {
            "win": _pad_to(_pad_to(lin_in.weight, Hp, 0), HHp, 1),
            "bin": _pad_to(lin_in.bias, HHp, 0)[None],
            "wout": _pad_to(_pad_to(lin_out.weight, HHp, 0), CHp, 1),
            "bout": _pad_to(lin_out.bias, CHp, 0)[None],
        }
        for i, lin in enumerate(inners):
            params[f"w_inner{i}"] = _pad_to(_pad_to(lin.weight, HHp, 0),
                                            HHp, 1)
            params[f"b_inner{i}"] = _pad_to(lin.bias, HHp, 0)[None]

    z0p = _pad_to(z0.astype(jnp.float32), Hp, 1)

    # pad the step count to a multiple of the unroll with dt=0 identity
    # steps (z + 0 * sum(b_i k_i) = z; their cotangents are exactly zero)
    U = int(os.environ.get("SNSDE_FUSED_UNROLL", "4"))
    U = max(1, min(U, M))
    Mp = _round_up(M, U)
    pad_steps = Mp - M
    dts_list = hs.astype(np.float32).tolist()
    if pad_steps:
        dx = jnp.pad(dx, ((0, pad_steps), (0, 0), (0, 0)))
        dts_list += [0.0] * pad_steps

    ys = _fused_cde(params, dx, z0p, tuple(dts_list), cfg_key, U)
    full = jnp.concatenate([z0p[None].astype(ys.dtype), ys[:M]], axis=0)
    return full[jnp.asarray(out_idx)][..., :H].astype(jnp.float32)
