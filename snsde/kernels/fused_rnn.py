"""Fused GRU sequence kernel (Pallas/TPU).

The discrete recurrent baselines (torch-ists `gru`/`bigru` cells,
reference _layer.py:113-153) and the interpolation decoders' BiGRU
(reference benchmark_interpolation/models.py dec_rnn3/dec_mtan_rnn) run
L sequential cell evaluations; under `lax.scan` each step pays the same
per-iteration XLA loop overhead + HBM weight re-reads that motivated the
fused solver kernels. This kernel runs the ENTIRE recurrence on-chip:

  * the input contributions gi = x @ W_ih + b_ih are HOISTED out of the
    recurrence and computed as ONE large MXU matmul (their gradient and
    the chain to x ride XLA autodiff of that precompute);
  * the hidden weights live in VMEM across all steps; each step is one
    [B, Hp] @ [Hp, 3Hp] matmul + the gate elementwise math, with the
    torch gate layout (r, z, n) kept lane-ALIGNED by padding each gate's
    column block to the 128-lane tile separately;
  * training uses a custom VJP whose backward is a second Pallas kernel
    (reverse loop, gates recomputed from the saved hidden trajectory,
    weight-grad accumulators resident in VMEM, dgi streamed out).

Sequence-length padding to the unroll uses a `valid` SMEM flag row:
padded steps pass the state through unchanged and contribute exactly
zero cotangent. Bidirectional runs flip the stream outside the kernel.

Set SNSDE_FUSED_INTERPRET=1 to run in interpret mode (CPU tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_em import (LANE, _dot, _interpret, _mm_mode, _pad_to,
                       _pick_block,
                       _round_up)

__all__ = ["fused_gru_scan", "fused_lstm_scan",
           "supports_fused_gru", "supports_fused_lstm"]

_MAX_H = 512


def supports_fused_gru(cell) -> bool:
    """True for GRUCell-shaped cells (w_ih/w_hh/b_ih/b_hh with torch
    (r,z,n) gate layout) within the lane caps."""
    w_hh = getattr(cell, "w_hh", None)
    if w_hh is None or getattr(cell, "w_ih", None) is None:
        return False
    H = w_hh.shape[0]
    return w_hh.shape[1] == 3 * H and H <= _MAX_H


def _pad_gates(x, H, Hp):
    """Pad each of the three (r, z, n) gate blocks of a [..., 3H] array
    to Hp lanes -> [..., 3Hp], keeping gate boundaries lane-aligned."""
    parts = [x[..., i * H:(i + 1) * H] for i in range(3)]
    return jnp.concatenate([_pad_to(p, Hp, x.ndim - 1) for p in parts],
                           axis=-1)


def _gru_gates(cfg, r, h, gi):
    """One cell evaluation from VMEM state h and the per-step input row
    gi. Returns (h_next, aux)."""
    Hp = cfg["Hp"]
    gh = _dot(h, r["whh"][:], cfg["mm_bf16"]) + r["bhh"][:]
    rg = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
    zg = jax.nn.sigmoid(gi[:, Hp:2 * Hp] + gh[:, Hp:2 * Hp])
    hn = gh[:, 2 * Hp:]
    ng = jnp.tanh(gi[:, 2 * Hp:] + rg * hn)
    h_next = (1.0 - zg) * ng + zg * h
    return h_next, (rg, zg, ng, hn)


def _fwd_kernel(cfg, U, names, *refs):
    r = dict(zip(names, refs[: len(names)]))
    hs_ref, h_scr = refs[len(names):]
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_scr[:] = r["h0"][:]

    h = h_scr[:]
    for u in range(U):
        gi = r["gi"][u].astype(jnp.float32)
        # GRU-D: time-decay the state (precomputed row); ODE-RNN: evolve
        # it by the in-kernel euler MLP — then run the cell and keep the
        # update only at observed steps
        if cfg["has_dec"]:
            h_in = h * r["hdec"][u]
        elif cfg["n_ode"]:
            dt = r["tdif"][k * U + u, 0] / cfg["ode_steps"]
            h_in, _ = _ode_evolve(cfg, r, h, dt)
        else:
            h_in = h
        h_next, _ = _gru_gates(cfg, r, h_in, gi)
        if cfg["has_obs"]:
            sel = r["obs"][u].astype(jnp.float32)
            h_new = sel * h_next + (1.0 - sel) * h_in
        else:
            h_new = h_next
        v = r["valid"][k * U + u, 0]
        h = v * h_new + (1.0 - v) * h
        hs_ref[u] = h.astype(hs_ref.dtype)
    h_scr[:] = h


def _bwd_kernel(cfg, U, in_names, out_names, *refs):
    n_in, n_out = len(in_names), len(out_names)
    r = dict(zip(in_names, refs[:n_in]))
    o = dict(zip(out_names, refs[n_in:n_in + n_out]))
    (gbar_scr,) = refs[n_in + n_out:]
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        gbar_scr[:] = jnp.zeros_like(gbar_scr)
        o["dwhh"][0] = jnp.zeros_like(o["dwhh"][0])
        o["dbhh"][0] = jnp.zeros_like(o["dbhh"][0])
        for i in range(cfg["n_ode"]):
            o[f"dwf{i}"][0] = jnp.zeros_like(o[f"dwf{i}"][0])
            o[f"dbf{i}"][0] = jnp.zeros_like(o[f"dbf{i}"][0])

    Hp = cfg["Hp"]
    mm = cfg["mm_bf16"]
    gbar = gbar_scr[:]
    for u in range(U - 1, -1, -1):
        gbar = gbar + r["ghs"][u].astype(jnp.float32)
        h = r["hprev"][u].astype(jnp.float32)
        gi = r["gi"][u].astype(jnp.float32)
        v = r["valid"][(nk - 1 - k) * U + u, 0]

        subs = None
        if cfg["has_dec"]:
            h_in = h * r["hdec"][u]
        elif cfg["n_ode"]:
            dt = r["tdif"][(nk - 1 - k) * U + u, 0] / cfg["ode_steps"]
            h_in, subs = _ode_evolve(cfg, r, h, dt)
        else:
            h_in = h
        _, (rg, zg, ng, hn) = _gru_gates(cfg, r, h_in, gi)
        gb = gbar * v                   # padded steps: pure pass-through
        if cfg["has_obs"]:
            sel = r["obs"][u].astype(jnp.float32)
            dh_next = gb * sel
            dh_in = gb * (1.0 - sel)
        else:
            dh_next = gb
            dh_in = jnp.zeros_like(gb)
        dz = dh_next * (h_in - ng)
        dn = dh_next * (1.0 - zg)
        dn_pre = dn * (1.0 - ng * ng)
        dr = dn_pre * hn
        dgh_n = dn_pre * rg
        dr_pre = dr * rg * (1.0 - rg)
        dz_pre = dz * zg * (1.0 - zg)
        dgh = jnp.concatenate([dr_pre, dz_pre, dgh_n], axis=-1)
        o["dgi"][u] = jnp.concatenate(
            [dr_pre, dz_pre, dn_pre], axis=-1
        ).astype(o["dgi"].dtype)
        o["dwhh"][0] += _dot(h_in.T, dgh, mm)
        o["dbhh"][0] += jnp.sum(dgh, axis=0, keepdims=True)
        dh_in = dh_in + dh_next * zg + _dot(dgh, r["whh"][:].T, mm)
        if cfg["has_dec"] == 2:
            o["dhdec"][u] = (dh_in * h).astype(o["dhdec"].dtype)
            dh_prev = dh_in * r["hdec"][u]
        elif cfg["has_dec"]:
            o["dhdec"][0, u] = jnp.sum(dh_in * h, axis=0, keepdims=True)
            dh_prev = dh_in * r["hdec"][u]
        elif cfg["n_ode"]:
            dh_prev = _ode_evolve_bwd(cfg, r, subs, dt, dh_in, o)
        else:
            dh_prev = dh_in
        gbar = dh_prev + (1.0 - v) * gbar
    gbar_scr[:] = gbar

    @pl.when(k == nk - 1)
    def _():
        o["dh0"][0] = gbar_scr[:]


def _specs(names, cfg, nk, block_b, U, reverse=False):
    Hp = cfg["Hp"]
    kmap = (lambda b, k: (nk - 1 - k, b, 0)) if reverse \
        else (lambda b, k: (k, b, 0))
    by = {
        "h0": pl.BlockSpec((block_b, Hp), lambda b, k: (b, 0),
                           memory_space=pltpu.VMEM),
        "whh": pl.BlockSpec((Hp, 3 * Hp), lambda b, k: (0, 0),
                            memory_space=pltpu.VMEM),
        "bhh": pl.BlockSpec((1, 3 * Hp), lambda b, k: (0, 0),
                            memory_space=pltpu.VMEM),
        "gi": pl.BlockSpec((U, block_b, 3 * Hp), kmap,
                           memory_space=pltpu.VMEM),
        "hprev": pl.BlockSpec((U, block_b, Hp), kmap,
                              memory_space=pltpu.VMEM),
        "ghs": pl.BlockSpec((U, block_b, Hp), kmap,
                            memory_space=pltpu.VMEM),
        "obs": pl.BlockSpec((U, block_b, Hp), kmap,
                            memory_space=pltpu.VMEM),
        "hdec": (pl.BlockSpec((U, block_b, Hp), kmap,
                              memory_space=pltpu.VMEM)
                 if cfg.get("has_dec") == 2 else
                 pl.BlockSpec((U, 1, Hp),
                              (lambda b, k: (nk - 1 - k, 0, 0)) if reverse
                              else (lambda b, k: (k, 0, 0)),
                              memory_space=pltpu.VMEM)),
        "valid": pl.BlockSpec(memory_space=pltpu.SMEM),
        "tdif": pl.BlockSpec(memory_space=pltpu.SMEM),
    }
    HHp = cfg.get("HHp", 0)
    n = cfg.get("n_ode", 0)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, k: (0,) * len(shape), memory_space=pltpu.VMEM)
    for i in range(n):
        in_d = Hp if i == 0 else HHp
        out_d = Hp if i == n - 1 else HHp
        by[f"wf{i}"] = const((in_d, out_d))
        by[f"bf{i}"] = const((1, out_d))
    return [by[n_] for n_ in names]


def _names(cfg, base):
    out = list(base)
    if cfg["has_dec"]:
        out.insert(-1, "hdec")
    if cfg["has_obs"]:
        out.insert(-1, "obs")
    for i in range(cfg["n_ode"]):
        out.insert(-1, f"wf{i}")
        out.insert(-1, f"bf{i}")
    if cfg["n_ode"]:
        out.insert(-1, "tdif")
    return out


def _cfg(cfg_key):
    # (Hp, mm_bf16, traj_bf16, has_dec, has_obs[, HHp, n_ode, ode_steps])
    # has_dec: 0 = none, 1 = per-step ROW decay (GRU-D: time-only),
    #          2 = per-step per-SAMPLE decay stream (GRU-D-full: the
    #          hidden decay depends on per-channel deltas)
    # n_ode > 0: ODE-RNN euler evolve by an in-kernel MLP (n_ode layers,
    # tanh inners + linear out) over ode_steps substeps of tdif/ode_steps
    return {"Hp": cfg_key[0], "mm_bf16": cfg_key[1],
            "traj_bf16": cfg_key[2], "has_dec": cfg_key[3],
            "has_obs": cfg_key[4],
            "HHp": cfg_key[5] if len(cfg_key) > 5 else 0,
            "n_ode": cfg_key[6] if len(cfg_key) > 6 else 0,
            "ode_steps": cfg_key[7] if len(cfg_key) > 7 else 0}


def _ode_evolve(cfg, r, h, dt):
    """Euler substeps of the ODE-RNN MLP field. Returns (h_out, substate
    list [h before each substep] for the backward)."""
    subs = []
    for _ in range(cfg["ode_steps"]):
        subs.append(h)
        x = h
        for i in range(cfg["n_ode"] - 1):
            x = jnp.tanh(_dot(x, r[f"wf{i}"][:], cfg["mm_bf16"])
                         + r[f"bf{i}"][:])
        fx = _dot(x, r[f"wf{cfg['n_ode'] - 1}"][:], cfg["mm_bf16"]) \
            + r[f"bf{cfg['n_ode'] - 1}"][:]
        h = h + dt * fx
    return h, subs


def _ode_evolve_bwd(cfg, r, subs, dt, dh, o):
    """Reverse the euler substeps; accumulates MLP weight grads into o and
    returns the cotangent of the pre-evolve state."""
    n = cfg["n_ode"]
    mm = cfg["mm_bf16"]
    for h_sub in reversed(subs):
        # recompute the MLP intermediates for this substep
        xs = [h_sub]
        for i in range(n - 1):
            xs.append(jnp.tanh(_dot(xs[-1], r[f"wf{i}"][:], mm)
                               + r[f"bf{i}"][:]))
        dfx = dh * dt
        o[f"dwf{n - 1}"][0] += _dot(xs[-1].T, dfx, mm)
        o[f"dbf{n - 1}"][0] += jnp.sum(dfx, axis=0, keepdims=True)
        dx = _dot(dfx, r[f"wf{n - 1}"][:].T, mm)
        for i in range(n - 2, -1, -1):
            dz = dx * (1.0 - xs[i + 1] * xs[i + 1])
            o[f"dwf{i}"][0] += _dot(xs[i].T, dz, mm)
            o[f"dbf{i}"][0] += jnp.sum(dz, axis=0, keepdims=True)
            dx = _dot(dz, r[f"wf{i}"][:].T, mm)
        dh = dh + dx
    return dh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_gru(params, streams, h0, valid_tuple, cfg_key, unroll):
    cfg = _cfg(cfg_key)
    valid = jnp.asarray(np.asarray(valid_tuple, np.float32))[:, None]
    M = valid.shape[0]
    B = h0.shape[0]
    U = unroll
    nk = M // U
    block_b = _pick_block(B, 3 * cfg["Hp"])
    nb = B // block_b
    names = _names(cfg, ["h0", "whh", "bhh", "gi", "valid"])
    vals = {"h0": h0, "valid": valid, **streams, **params}
    kernel = functools.partial(_fwd_kernel, cfg, U, names)
    return pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=_specs(names, cfg, nk, block_b, U),
        out_specs=pl.BlockSpec((U, block_b, cfg["Hp"]),
                               lambda b, k: (k, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (M, B, cfg["Hp"]),
            jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, cfg["Hp"]), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*[vals[n] for n in names])


def _fused_gru_fwd(params, streams, h0, valid_tuple, cfg_key, unroll):
    hs = _fused_gru(params, streams, h0, valid_tuple, cfg_key, unroll)
    return hs, (params, streams, h0, hs)


def _fused_gru_bwd(valid_tuple, cfg_key, unroll, res, ghs):
    params, streams, h0, hs = res
    cfg = _cfg(cfg_key)
    valid = jnp.asarray(np.asarray(valid_tuple, np.float32))[:, None]
    M, B, Hp = hs.shape
    U = unroll
    nk = M // U
    block_b = _pick_block(B, 3 * Hp)
    nb = B // block_b
    traj = jnp.concatenate([h0[None].astype(hs.dtype), hs[:-1]], axis=0)
    in_names = _names(cfg, ["hprev", "ghs", "whh", "bhh", "gi", "valid"])
    vals = {"hprev": traj, "ghs": ghs, "valid": valid, **streams, **params}
    out_names = ["dwhh", "dbhh", "dgi", "dh0"]
    stream_dtype = jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((nb, Hp, 3 * Hp), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, 3 * Hp), jnp.float32),
        jax.ShapeDtypeStruct((M, B, 3 * Hp), stream_dtype),
        jax.ShapeDtypeStruct((nb, block_b, Hp), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, Hp, 3 * Hp), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3 * Hp), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((U, block_b, 3 * Hp), lambda b, k: (nk - 1 - k, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, Hp), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if cfg["has_dec"] == 2:
        out_names.append("dhdec")
        out_shapes.append(
            jax.ShapeDtypeStruct((M, B, Hp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((U, block_b, Hp),
                         lambda b, k: (nk - 1 - k, b, 0),
                         memory_space=pltpu.VMEM))
    elif cfg["has_dec"]:
        out_names.append("dhdec")
        out_shapes.append(
            jax.ShapeDtypeStruct((nb, M, 1, Hp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, U, 1, Hp), lambda b, k: (b, nk - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM))
    HHp = cfg["HHp"]
    n_ode = cfg["n_ode"]
    for i in range(n_ode):
        in_d = Hp if i == 0 else HHp
        out_d = Hp if i == n_ode - 1 else HHp
        out_names += [f"dwf{i}", f"dbf{i}"]
        out_shapes += [jax.ShapeDtypeStruct((nb, in_d, out_d), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 1, out_d), jnp.float32)]
        out_specs += [
            pl.BlockSpec((1, in_d, out_d), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, out_d), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    kernel = functools.partial(_bwd_kernel, cfg, U, in_names, out_names)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=_specs(in_names, cfg, nk, block_b, U, reverse=True),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((block_b, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*[vals[n] for n in in_names])
    out = dict(zip(out_names, outs))
    dparams = {"whh": jnp.sum(out["dwhh"], axis=0),
               "bhh": jnp.sum(out["dbhh"], axis=0)}
    for i in range(n_ode):
        dparams[f"wf{i}"] = jnp.sum(out[f"dwf{i}"], axis=0)
        dparams[f"bf{i}"] = jnp.sum(out[f"dbf{i}"], axis=0)
    dstreams = {"gi": out["dgi"].astype(streams["gi"].dtype)}
    if "tdif" in streams:
        dstreams["tdif"] = jnp.zeros_like(streams["tdif"])
    if cfg["has_dec"] == 2:
        dstreams["hdec"] = out["dhdec"].astype(streams["hdec"].dtype)
    elif cfg["has_dec"]:
        dstreams["hdec"] = jnp.sum(out["dhdec"], axis=0).astype(
            streams["hdec"].dtype)
    if cfg["has_obs"]:
        # observation indicators are data (0/1) — zero cotangent
        dstreams["obs"] = jnp.zeros_like(streams["obs"])
    return (dparams, dstreams,
            out["dh0"].reshape(-1, Hp).astype(h0.dtype))


_fused_gru.defvjp(_fused_gru_fwd, _fused_gru_bwd)


def fused_gru_scan(cell, xs, h0=None, reverse: bool = False,
                   stream_dtype=None, obs=None, hdec=None,
                   ode_layers=None, tdif=None, ode_steps: int = 1):
    """Drop-in GRU recurrence: xs [L, B, C] -> hs [L, B, H], matching
    lax.scan over GRUCell (torch (r,z,n) gate semantics) exactly.
    reverse=True runs the backward-direction recurrence of a BiGRU
    (hs[i] is the state after consuming xs[i:] from the right).

    GRU-dt/GRU-D variants (models/rnn._ObservationGRUBase):
      obs  [L, B]  — keep the cell update only where 1 (masked steps
                     pass the (decayed) state through); data, no grad.
      hdec — per-step hidden decay applied BEFORE the cell, either a
                     time-only ROW [L, H] (GRU-D's exp(-relu(decay(dt))))
                     or a PER-SAMPLE stream [L, B, H] (GRUD-full); the
                     rank selects the mode, and the cotangent chains
                     back to the decay net via XLA autodiff either way.
      ode_layers / tdif / ode_steps — ODE-RNN: euler-evolve the state
                     in-kernel by the MLP (tanh inners + linear out)
                     over ode_steps substeps of tdif[t]/ode_steps
                     BEFORE the cell (mutually exclusive with hdec)."""
    if stream_dtype is None:
        stream_dtype = (
            jnp.bfloat16
            if os.environ.get("SNSDE_FUSED_STREAM", "f32") == "bf16"
            else jnp.float32
        )
    L, B, _ = xs.shape
    H = cell.hidden_size
    Hp = _round_up(max(H, 8), LANE)
    if h0 is None:
        h0 = jnp.zeros((B, H), xs.dtype)
    if reverse:
        xs = jnp.flip(xs, axis=0)
        if obs is not None:
            obs = jnp.flip(obs, axis=0)
        if hdec is not None:
            hdec = jnp.flip(hdec, axis=0)

    # hoist the input projection out of the recurrence (one MXU matmul;
    # dW_ih/db_ih and the chain to xs ride XLA autodiff of this line)
    gi = xs @ cell.w_ih + cell.b_ih                 # [L, B, 3H]
    streams = {"gi": _pad_gates(gi, H, Hp).astype(stream_dtype)}
    if obs is not None:
        streams["obs"] = jnp.broadcast_to(
            obs.astype(stream_dtype)[:, :, None], (L, B, Hp))
    dec_mode = 0
    if hdec is not None:
        if hdec.ndim == 3:                      # [L, B, H] per-sample decay
            dec_mode = 2
            streams["hdec"] = _pad_to(hdec, Hp, 2)
        else:                                   # [L, H] time-only row
            dec_mode = 1
            streams["hdec"] = _pad_to(hdec, Hp, 1)[:, None, :]
    params = {
        "whh": _pad_gates(_pad_to(cell.w_hh, Hp, 0), H, Hp),
        "bhh": _pad_gates(cell.b_hh, H, Hp)[None],
    }
    HHp = 0
    n_ode = 0
    if ode_layers is not None:
        n_ode = len(ode_layers)
        HH = ode_layers[0].weight.shape[1] if n_ode > 1 else H
        HHp = _round_up(max(HH, 8), LANE)
        for i, lin in enumerate(ode_layers):
            in_d = Hp if i == 0 else HHp
            out_d = Hp if i == n_ode - 1 else HHp
            params[f"wf{i}"] = _pad_to(_pad_to(lin.weight, in_d, 0),
                                       out_d, 1)
            params[f"bf{i}"] = _pad_to(lin.bias, out_d, 0)[None]
        if reverse:
            tdif = jnp.flip(tdif, axis=0)
        streams["tdif"] = jnp.asarray(tdif, jnp.float32).reshape(-1, 1)
    h0p = _pad_to(h0.astype(jnp.float32), Hp, 1)

    mm_bf16 = _mm_mode()
    traj_bf16 = stream_dtype == jnp.bfloat16
    U = int(os.environ.get("SNSDE_FUSED_UNROLL", "4"))
    U = max(1, min(U, L))
    Lp = _round_up(L, U)
    valid = [1.0] * L + [0.0] * (Lp - L)
    if Lp > L:
        streams = {
            k: jnp.pad(v, ((0, Lp - L),) + ((0, 0),) * (v.ndim - 1))
            for k, v in streams.items()
        }
    hs = _fused_gru(params, streams, h0p, tuple(valid),
                    (Hp, mm_bf16, traj_bf16, dec_mode,
                     obs is not None, HHp, n_ode,
                     ode_steps if n_ode else 0), U)
    hs = hs[:L, :, :H].astype(jnp.float32)
    return jnp.flip(hs, axis=0) if reverse else hs


# ---------------------------------------------------------------------------
# Fused LSTM (torch (i, f, g, o) gate ordering; nn/layers.LSTMCell)
# ---------------------------------------------------------------------------

def supports_fused_lstm(cell) -> bool:
    w_hh = getattr(cell, "w_hh", None)
    if w_hh is None or getattr(cell, "w_ih", None) is None:
        return False
    H = w_hh.shape[0]
    return w_hh.shape[1] == 4 * H and H <= _MAX_H


def _pad_gates4(x, H, Hp):
    parts = [x[..., i * H:(i + 1) * H] for i in range(4)]
    return jnp.concatenate([_pad_to(p, Hp, x.ndim - 1) for p in parts],
                           axis=-1)


def _lstm_gates(cfg, r, h, c, gi, tg=None, tel=None):
    """One LSTM cell evaluation. tg (TGLSTM): [B, 3Hp] sigmoid time-gate
    modifiers multiplying the i/f/o gates (models/time_rnn.TGLSTMCell).
    tel (TLSTM): per-sample elapsed-time factor — the short-term memory
    component tanh(c @ wd + bd) is rescaled by tel before the
    (f, i, o, sigmoid-candidate) gate update (time_rnn.TLSTMCell)."""
    Hp = cfg["Hp"]
    if cfg.get("kind") == "tlstm":
        c_short = jnp.tanh(_dot(c, r["wd"][:], cfg["mm_bf16"])
                           + r["bd"][:])
        c_adj = c - c_short + c_short * tel
        g = gi + _dot(h, r["whh"][:], cfg["mm_bf16"]) + r["bhh"][:]
        fg = jax.nn.sigmoid(g[:, :Hp])
        ig = jax.nn.sigmoid(g[:, Hp:2 * Hp])
        og = jax.nn.sigmoid(g[:, 2 * Hp:3 * Hp])
        ct = jax.nn.sigmoid(g[:, 3 * Hp:])
        c_next = fg * c_adj + ig * ct
        h_next = og * jnp.tanh(c_next)
        return h_next, c_next, (ig, fg, ct, og, (c_short, c_adj))
    g = gi + _dot(h, r["whh"][:], cfg["mm_bf16"]) + r["bhh"][:]
    ig = jax.nn.sigmoid(g[:, :Hp])
    fg = jax.nn.sigmoid(g[:, Hp:2 * Hp])
    gg = jnp.tanh(g[:, 2 * Hp:3 * Hp])
    og = jax.nn.sigmoid(g[:, 3 * Hp:])
    sraw = None
    if tg is not None:
        sraw = (ig, fg, og)             # raw sigmoids, for the backward
        ig = ig * tg[:, :Hp]
        fg = fg * tg[:, Hp:2 * Hp]
        og = og * tg[:, 2 * Hp:]
    c_next = fg * c + ig * gg
    h_next = og * jnp.tanh(c_next)
    return h_next, c_next, (ig, fg, gg, og, sraw)


def _lstm_fwd_kernel(cfg, U, names, *refs):
    r = dict(zip(names, refs[: len(names)]))
    hs_ref, cs_ref, h_scr, c_scr = refs[len(names):]
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h, c = h_scr[:], c_scr[:]
    for u in range(U):
        gi = r["gi"][u].astype(jnp.float32)
        tg = (r["tg"][u].astype(jnp.float32) if cfg.get("has_tg")
              else None)
        tel = (r["tel"][u].astype(jnp.float32)
               if cfg.get("kind") == "tlstm" else None)
        h_next, c_next, _ = _lstm_gates(cfg, r, h, c, gi, tg, tel)
        if cfg.get("n_ode"):
            # ODE-LSTM: euler-evolve the OUTPUT state between
            # observations (per-sample dt stream; c passes through)
            h_next, _ = _ode_evolve(cfg, r, h_next,
                                    r["odt"][u].astype(jnp.float32))
        if cfg.get("has_sel"):
            # PLSTM phased time gate: leaky per-unit openness applied to
            # BOTH carries (plstm.py:131-137)
            sel = r["sel"][u].astype(jnp.float32)
            h_next = sel * h_next + (1.0 - sel) * h
            c_next = sel * c_next + (1.0 - sel) * c
        v = r["valid"][k * U + u, 0]
        h = v * h_next + (1.0 - v) * h
        c = v * c_next + (1.0 - v) * c
        hs_ref[u] = h.astype(hs_ref.dtype)
        cs_ref[u] = c.astype(cs_ref.dtype)
    h_scr[:] = h
    c_scr[:] = c


def _lstm_bwd_kernel(cfg, U, in_names, out_names, *refs):
    n_in, n_out = len(in_names), len(out_names)
    r = dict(zip(in_names, refs[:n_in]))
    o = dict(zip(out_names, refs[n_in:n_in + n_out]))
    gh_scr, gc_scr = refs[n_in + n_out:]
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        gh_scr[:] = jnp.zeros_like(gh_scr)
        gc_scr[:] = jnp.zeros_like(gc_scr)
        o["dwhh"][0] = jnp.zeros_like(o["dwhh"][0])
        o["dbhh"][0] = jnp.zeros_like(o["dbhh"][0])
        for i in range(cfg.get("n_ode", 0)):
            o[f"dwf{i}"][0] = jnp.zeros_like(o[f"dwf{i}"][0])
            o[f"dbf{i}"][0] = jnp.zeros_like(o[f"dbf{i}"][0])
        if cfg.get("kind") == "tlstm":
            o["dwd"][0] = jnp.zeros_like(o["dwd"][0])
            o["dbd"][0] = jnp.zeros_like(o["dbd"][0])

    Hp = cfg["Hp"]
    mm = cfg["mm_bf16"]
    gh, gc = gh_scr[:], gc_scr[:]
    for u in range(U - 1, -1, -1):
        gh = gh + r["ghs"][u].astype(jnp.float32)
        h = r["hprev"][u].astype(jnp.float32)
        c = r["cprev"][u].astype(jnp.float32)
        gi = r["gi"][u].astype(jnp.float32)
        v = r["valid"][(nk - 1 - k) * U + u, 0]

        tg = (r["tg"][u].astype(jnp.float32) if cfg.get("has_tg")
              else None)
        tel = (r["tel"][u].astype(jnp.float32)
               if cfg.get("kind") == "tlstm" else None)
        h_next, c_next, (ig, fg, gg, og, sraw) = _lstm_gates(
            cfg, r, h, c, gi, tg, tel)
        subs = None
        if cfg.get("n_ode"):
            odt = r["odt"][u].astype(jnp.float32)
            h_next, subs = _ode_evolve(cfg, r, h_next, odt)
        ghv = gh * v
        gcv = gc * v
        dh_carry = jnp.zeros_like(ghv)
        dc_carry = jnp.zeros_like(gcv)
        if cfg.get("has_sel"):
            sel = r["sel"][u].astype(jnp.float32)
            # h_out = sel*h_next + (1-sel)*h  (likewise c): the sel
            # cotangent and the pass-through carries
            o["dsel"][u] = (ghv * (h_next - h)
                            + gcv * (c_next - c)).astype(o["dsel"].dtype)
            dh_carry = ghv * (1.0 - sel)
            dc_carry = gcv * (1.0 - sel)
            ghv = ghv * sel
            gcv = gcv * sel
        if cfg.get("n_ode"):
            ghv = _ode_evolve_bwd(cfg, r, subs, odt, ghv, o)
        tc = jnp.tanh(c_next)
        do = ghv * tc
        dc_n = gcv + ghv * og * (1.0 - tc * tc)
        if cfg.get("kind") == "tlstm":
            # gates are (f, i, o, sigmoid-candidate) on the time-adjusted
            # cell state c_adj = c + tanh(c@wd+bd) * (tel - 1)
            c_short, c_adj = sraw
            ct = gg
            df = dc_n * c_adj
            di = dc_n * ct
            dct = dc_n * ig
            dc_adj = dc_n * fg
            df_pre = df * fg * (1.0 - fg)
            di_pre = di * ig * (1.0 - ig)
            do_pre = do * og * (1.0 - og)
            dct_pre = dct * ct * (1.0 - ct)
            dgates = jnp.concatenate(
                [df_pre, di_pre, do_pre, dct_pre], axis=-1)
            o["dgi"][u] = dgates.astype(o["dgi"].dtype)
            o["dwhh"][0] += _dot(h.T, dgates, mm)
            o["dbhh"][0] += jnp.sum(dgates, axis=0, keepdims=True)
            dcs = dc_adj * (tel - 1.0)
            dzd = dcs * (1.0 - c_short * c_short)
            o["dwd"][0] += _dot(c.T, dzd, mm)
            o["dbd"][0] += jnp.sum(dzd, axis=0, keepdims=True)
            dc_prev = dc_adj + _dot(dzd, r["wd"][:].T, mm)
            gh = _dot(dgates, r["whh"][:].T, mm) + dh_carry                 + (1.0 - v) * gh
            gc = dc_prev + dc_carry + (1.0 - v) * gc
            continue
        df = dc_n * c
        dc_prev = dc_n * fg
        di = dc_n * gg
        dg = dc_n * ig
        if cfg.get("has_tg"):
            # gate modifiers: d(sig(g)*tgx) splits between the gate
            # pre-activation and the modifier stream (sraw = raw sigmoids)
            si, sf, so = sraw
            o["dtg"][u] = jnp.concatenate(
                [di * si, df * sf, do * so], axis=-1
            ).astype(o["dtg"].dtype)
            di_pre = di * tg[:, :Hp] * si * (1.0 - si)
            df_pre = df * tg[:, Hp:2 * Hp] * sf * (1.0 - sf)
            do_pre = do * tg[:, 2 * Hp:] * so * (1.0 - so)
        else:
            di_pre = di * ig * (1.0 - ig)
            df_pre = df * fg * (1.0 - fg)
            do_pre = do * og * (1.0 - og)
        dg_pre = dg * (1.0 - gg * gg)
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
        o["dgi"][u] = dgates.astype(o["dgi"].dtype)
        o["dwhh"][0] += _dot(h.T, dgates, mm)
        o["dbhh"][0] += jnp.sum(dgates, axis=0, keepdims=True)
        gh = _dot(dgates, r["whh"][:].T, mm) + dh_carry + (1.0 - v) * gh
        gc = dc_prev + dc_carry + (1.0 - v) * gc
    gh_scr[:] = gh
    gc_scr[:] = gc


def _lstm_specs(names, cfg, nk, block_b, U, reverse=False):
    Hp = cfg["Hp"]
    kmap = (lambda b, k: (nk - 1 - k, b, 0)) if reverse \
        else (lambda b, k: (k, b, 0))
    by = {
        "whh": pl.BlockSpec((Hp, 4 * Hp), lambda b, k: (0, 0),
                            memory_space=pltpu.VMEM),
        "bhh": pl.BlockSpec((1, 4 * Hp), lambda b, k: (0, 0),
                            memory_space=pltpu.VMEM),
        "gi": pl.BlockSpec((U, block_b, 4 * Hp), kmap,
                           memory_space=pltpu.VMEM),
        "hprev": pl.BlockSpec((U, block_b, Hp), kmap,
                              memory_space=pltpu.VMEM),
        "cprev": pl.BlockSpec((U, block_b, Hp), kmap,
                              memory_space=pltpu.VMEM),
        "ghs": pl.BlockSpec((U, block_b, Hp), kmap,
                            memory_space=pltpu.VMEM),
        "sel": pl.BlockSpec((U, block_b, Hp), kmap,
                            memory_space=pltpu.VMEM),
        "tg": pl.BlockSpec((U, block_b, 3 * Hp), kmap,
                           memory_space=pltpu.VMEM),
        "odt": pl.BlockSpec((U, block_b, Hp), kmap,
                            memory_space=pltpu.VMEM),
        "tel": pl.BlockSpec((U, block_b, Hp), kmap,
                            memory_space=pltpu.VMEM),
        "wd": pl.BlockSpec((Hp, Hp), lambda b, k: (0, 0),
                           memory_space=pltpu.VMEM),
        "bd": pl.BlockSpec((1, Hp), lambda b, k: (0, 0),
                           memory_space=pltpu.VMEM),
        "valid": pl.BlockSpec(memory_space=pltpu.SMEM),
    }
    HHp = cfg.get("HHp", 0)
    n = cfg.get("n_ode", 0)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, k: (0,) * len(shape), memory_space=pltpu.VMEM)
    for i in range(n):
        in_d = Hp if i == 0 else HHp
        out_d = Hp if i == n - 1 else HHp
        by[f"wf{i}"] = const((in_d, out_d))
        by[f"bf{i}"] = const((1, out_d))
    return [by[n_] for n_ in names]


def _lstm_names(cfg, base):
    out = list(base)
    if cfg.get("has_sel"):
        out.insert(-1, "sel")
    if cfg.get("has_tg"):
        out.insert(-1, "tg")
    for i in range(cfg.get("n_ode", 0)):
        out.insert(-1, f"wf{i}")
        out.insert(-1, f"bf{i}")
    if cfg.get("n_ode"):
        out.insert(-1, "odt")
    if cfg.get("kind") == "tlstm":
        out.insert(-1, "wd")
        out.insert(-1, "bd")
        out.insert(-1, "tel")
    return out


def _lstm_cfg(cfg_key):
    # (Hp, mm, tb, has_sel, has_tg[, HHp, n_ode, ode_steps, kind]) —
    # n_ode > 0: ODE-LSTM euler evolve of h AFTER the cell by an
    # in-kernel MLP with a PER-SAMPLE dt stream ('odt', pre-divided by
    # ode_steps). kind='tlstm': TLSTM memory decomposition — the cell
    # state is adjusted by a learned short-term component discounted by
    # elapsed time BEFORE (f,i,o,sigmoid-candidate)-ordered gates.
    return {"Hp": cfg_key[0], "mm_bf16": cfg_key[1],
            "traj_bf16": cfg_key[2],
            "has_sel": cfg_key[3] if len(cfg_key) > 3 else False,
            "has_tg": cfg_key[4] if len(cfg_key) > 4 else False,
            "HHp": cfg_key[5] if len(cfg_key) > 5 else 0,
            "n_ode": cfg_key[6] if len(cfg_key) > 6 else 0,
            "ode_steps": cfg_key[7] if len(cfg_key) > 7 else 0,
            "kind": cfg_key[8] if len(cfg_key) > 8 else "lstm"}


def _lstm_forward(params, streams, valid_tuple, cfg_key, unroll,
                  save_cs=True):
    """save_cs=False (the inference-only primal): the cell-state
    trajectory blocks overwrite ONE [U, B, Hp] buffer instead of
    streaming [M, B, Hp] to HBM — Pallas outputs cannot be DCE'd, so
    this halves the forward's output bandwidth when no backward will
    need the residual."""
    cfg = _lstm_cfg(cfg_key)
    valid = jnp.asarray(np.asarray(valid_tuple, np.float32))[:, None]
    M = valid.shape[0]
    B = streams["gi"].shape[1]
    U = unroll
    nk = M // U
    block_b = _pick_block(B, 4 * cfg["Hp"])
    nb = B // block_b
    names = _lstm_names(cfg, ["whh", "bhh", "gi", "valid"])
    vals = {"valid": valid, **streams, **params}
    traj_dtype = jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32
    out_spec = pl.BlockSpec((U, block_b, cfg["Hp"]), lambda b, k: (k, b, 0),
                            memory_space=pltpu.VMEM)
    if save_cs:
        cs_spec = out_spec
        cs_shape = jax.ShapeDtypeStruct((M, B, cfg["Hp"]), traj_dtype)
    else:
        cs_spec = pl.BlockSpec((U, block_b, cfg["Hp"]),
                               lambda b, k: (0, b, 0),
                               memory_space=pltpu.VMEM)
        cs_shape = jax.ShapeDtypeStruct((U, B, cfg["Hp"]), traj_dtype)
    hs, cs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, cfg, U, names),
        grid=(nb, nk),
        in_specs=_lstm_specs(names, cfg, nk, block_b, U),
        out_specs=[out_spec, cs_spec],
        out_shape=[jax.ShapeDtypeStruct((M, B, cfg["Hp"]), traj_dtype),
                   cs_shape],
        scratch_shapes=[pltpu.VMEM((block_b, cfg["Hp"]), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*[vals[n] for n in names])
    return hs, cs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_lstm(params, streams, valid_tuple, cfg_key, unroll):
    # the cell-state trajectory is an internal residual for the backward,
    # NOT a differentiable output — only hs is exposed (and the primal
    # skips streaming it entirely)
    hs, _ = _lstm_forward(params, streams, valid_tuple, cfg_key, unroll,
                          save_cs=False)
    return hs


def _fused_lstm_fwd(params, streams, valid_tuple, cfg_key, unroll):
    hs, cs = _lstm_forward(params, streams, valid_tuple, cfg_key, unroll)
    return hs, (params, streams, hs, cs)


def _fused_lstm_bwd(valid_tuple, cfg_key, unroll, res, ghs):
    params, streams, hs, cs = res
    cfg = _lstm_cfg(cfg_key)
    valid = jnp.asarray(np.asarray(valid_tuple, np.float32))[:, None]
    M, B, Hp = hs.shape
    U = unroll
    nk = M // U
    block_b = _pick_block(B, 4 * Hp)
    nb = B // block_b
    zrow = jnp.zeros_like(hs[:1])
    hprev = jnp.concatenate([zrow, hs[:-1]], axis=0)
    cprev = jnp.concatenate([zrow, cs[:-1]], axis=0)
    in_names = _lstm_names(
        cfg, ["hprev", "cprev", "ghs", "whh", "bhh", "gi", "valid"])
    vals = {"hprev": hprev, "cprev": cprev, "ghs": ghs,
            "valid": valid, **streams, **params}
    stream_dtype = jnp.bfloat16 if cfg["traj_bf16"] else jnp.float32
    out_names = ["dwhh", "dbhh", "dgi"]
    rev = lambda b, k: (nk - 1 - k, b, 0)
    out_specs = [
        pl.BlockSpec((1, Hp, 4 * Hp), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 4 * Hp), lambda b, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((U, block_b, 4 * Hp), rev, memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nb, Hp, 4 * Hp), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, 4 * Hp), jnp.float32),
        jax.ShapeDtypeStruct((M, B, 4 * Hp), stream_dtype),
    ]
    if cfg["has_sel"]:
        out_names.append("dsel")
        out_shapes.append(jax.ShapeDtypeStruct((M, B, Hp), jnp.float32))
        out_specs.append(pl.BlockSpec((U, block_b, Hp), rev,
                                      memory_space=pltpu.VMEM))
    if cfg["has_tg"]:
        out_names.append("dtg")
        out_shapes.append(
            jax.ShapeDtypeStruct((M, B, 3 * Hp), jnp.float32))
        out_specs.append(pl.BlockSpec((U, block_b, 3 * Hp), rev,
                                      memory_space=pltpu.VMEM))
    HHp = cfg["HHp"]
    n_ode = cfg["n_ode"]
    for i in range(n_ode):
        in_d = Hp if i == 0 else HHp
        out_d = Hp if i == n_ode - 1 else HHp
        out_names += [f"dwf{i}", f"dbf{i}"]
        out_shapes += [jax.ShapeDtypeStruct((nb, in_d, out_d), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 1, out_d), jnp.float32)]
        out_specs += [
            pl.BlockSpec((1, in_d, out_d), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, out_d), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if cfg.get("kind") == "tlstm":
        out_names += ["dwd", "dbd"]
        out_shapes += [jax.ShapeDtypeStruct((nb, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 1, Hp), jnp.float32)]
        out_specs += [
            pl.BlockSpec((1, Hp, Hp), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hp), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, cfg, U, in_names, out_names),
        grid=(nb, nk),
        in_specs=_lstm_specs(in_names, cfg, nk, block_b, U, reverse=True),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((block_b, Hp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*[vals[n] for n in in_names])
    out = dict(zip(out_names, outs))
    dparams = {"whh": jnp.sum(out["dwhh"], axis=0),
               "bhh": jnp.sum(out["dbhh"], axis=0)}
    dstreams = {"gi": out["dgi"].astype(streams["gi"].dtype)}
    if cfg["has_sel"]:
        dstreams["sel"] = out["dsel"].astype(streams["sel"].dtype)
    if cfg["has_tg"]:
        dstreams["tg"] = out["dtg"].astype(streams["tg"].dtype)
    for i in range(n_ode):
        dparams[f"wf{i}"] = jnp.sum(out[f"dwf{i}"], axis=0)
        dparams[f"bf{i}"] = jnp.sum(out[f"dbf{i}"], axis=0)
    if cfg.get("kind") == "tlstm":
        dparams["wd"] = jnp.sum(out["dwd"], axis=0)
        dparams["bd"] = jnp.sum(out["dbd"], axis=0)
    if "tel" in streams:
        # elapsed times come from data timestamps — zero cotangent
        dstreams["tel"] = jnp.zeros_like(streams["tel"])
    if "odt" in streams:
        # per-sample dts come from data timestamps — zero cotangent
        dstreams["odt"] = jnp.zeros_like(streams["odt"])
    return dparams, dstreams


_fused_lstm.defvjp(_fused_lstm_fwd, _fused_lstm_bwd)


def fused_lstm_scan(cell, xs, reverse: bool = False, stream_dtype=None,
                    sel=None, tg=None, ode_layers=None, odt=None,
                    ode_steps: int = 1, tlstm=None, tel=None):
    """Drop-in LSTM recurrence from zero (h, c): xs [L, B, C] ->
    hs [L, B, H], matching lax.scan over LSTMCell exactly.

    sel [L, B, H] — PLSTM phased time gate: per-unit openness selecting
                    between the cell update and the previous (h, c)
                    (differentiated: grads reach periods/shifts/on_end
                    through the precompute).
    tg  [L, B, 3H] — TGLSTM sigmoid time-gate modifiers multiplying the
                    i/f/o gates (differentiated).
    ode_layers / odt / ode_steps — ODE-LSTM: euler-evolve h AFTER the
                    cell by the in-kernel MLP over ode_steps substeps of
                    the PER-SAMPLE dt stream odt [L, B].
    tlstm (W_d Linear) / tel [L, B] — TLSTM memory decomposition: the
                    short-term component tanh(c @ W_d) is rescaled by the
                    elapsed-time factor before (f,i,o,sigmoid-candidate)
                    gates."""
    if stream_dtype is None:
        stream_dtype = (
            jnp.bfloat16
            if os.environ.get("SNSDE_FUSED_STREAM", "f32") == "bf16"
            else jnp.float32
        )
    L, B, _ = xs.shape
    H = cell.hidden_size
    Hp = _round_up(max(H, 8), LANE)
    if reverse:
        xs = jnp.flip(xs, axis=0)
        if sel is not None:
            sel = jnp.flip(sel, axis=0)
        if tg is not None:
            tg = jnp.flip(tg, axis=0)
    gi = xs @ cell.w_ih + cell.b_ih                 # [L, B, 4H]
    streams = {"gi": _pad_gates4(gi, H, Hp).astype(stream_dtype)}
    if sel is not None:
        streams["sel"] = _pad_to(sel, Hp, 2).astype(stream_dtype)
    if tg is not None:
        streams["tg"] = _pad_gates(tg, H, Hp).astype(stream_dtype)
    params = {
        "whh": _pad_gates4(_pad_to(cell.w_hh, Hp, 0), H, Hp),
        "bhh": _pad_gates4(cell.b_hh, H, Hp)[None],
    }
    HHp = 0
    n_ode = 0
    if ode_layers is not None:
        n_ode = len(ode_layers)
        HH = ode_layers[0].weight.shape[1] if n_ode > 1 else H
        HHp = _round_up(max(HH, 8), LANE)
        for i, lin in enumerate(ode_layers):
            in_d = Hp if i == 0 else HHp
            out_d = Hp if i == n_ode - 1 else HHp
            params[f"wf{i}"] = _pad_to(_pad_to(lin.weight, in_d, 0),
                                       out_d, 1)
            params[f"bf{i}"] = _pad_to(lin.bias, out_d, 0)[None]
        if reverse:
            odt = jnp.flip(odt, axis=0)
        streams["odt"] = jnp.broadcast_to(
            (odt / ode_steps).astype(stream_dtype)[:, :, None],
            (L, odt.shape[1], Hp))
    kind = "lstm"
    if tlstm is not None:
        kind = "tlstm"
        params["wd"] = _pad_to(_pad_to(tlstm.weight, Hp, 0), Hp, 1)
        params["bd"] = _pad_to(tlstm.bias, Hp, 0)[None]
        if reverse:
            tel = jnp.flip(tel, axis=0)
        streams["tel"] = jnp.broadcast_to(
            tel.astype(stream_dtype)[:, :, None], (L, tel.shape[1], Hp))
    mm_bf16 = _mm_mode()
    traj_bf16 = stream_dtype == jnp.bfloat16
    U = int(os.environ.get("SNSDE_FUSED_UNROLL", "4"))
    U = max(1, min(U, L))
    Lp = _round_up(L, U)
    valid = [1.0] * L + [0.0] * (Lp - L)
    if Lp > L:
        streams = {
            k: jnp.pad(v, ((0, Lp - L),) + ((0, 0),) * (v.ndim - 1))
            for k, v in streams.items()
        }
    hs = _fused_lstm(params, streams, tuple(valid),
                     (Hp, mm_bf16, traj_bf16, sel is not None,
                      tg is not None, HHp, n_ode,
                      ode_steps if n_ode else 0, kind), U)
    hs = hs[:L, :, :H].astype(jnp.float32)
    return jnp.flip(hs, axis=0) if reverse else hs
