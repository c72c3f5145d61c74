"""Lane-packed multi-model fused solves.

The fused kernels pad the hidden width to the 128-lane MXU tile, so a
single H=49 model wastes ~85% of the matmul lanes (RESULTS.md roofline —
"padding waste is removable only by batching multiple models into the
lane dimension"). This module removes that waste for the framework's
dominant sweep workloads (the reference's robustness sweep trains the
same config over 5 seeds per cell — torch-ists/model_run.py — and the
grids in sepsis-sde.py:70-83 repeat each model 5 times): K same-config
models are packed along the lane axis with BLOCK-DIAGONAL weights and
solved by ONE fused kernel invocation.

Why block-diagonal packing is exact: every cross-feature mixing in the
step is a matmul against a model's weight matrix; with the K weight
matrices placed on the diagonal of a [K*H, K*H] matrix, lanes of model i
only ever mix with lanes of model i. Everything else in the step
(tanh/sigmoid/relu bounds, noise application, the Euler update) is
elementwise over lanes. Per-model theta rides the kernels' per-lane
theta row; per-model Brownian increments are drawn from per-model keys
and concatenated, so packed model i is bit-comparable to a single-model
solve with the same key.

Gradients: the packing is ordinary jnp (block_diag / concatenate /
repeat), so reverse-mode AD slices each model's cotangents back out of
the packed kernel gradients.
"""

from __future__ import annotations

import types
import warnings

import jax
import jax.numpy as jnp
from jax.scipy.linalg import block_diag

from .fused_em import fused_em_solve

__all__ = ["fused_em_solve_packed", "fused_srk_solve_packed",
           "fused_cde_solve_packed", "fused_latent_em_solve_packed",
           "pack_fields", "pack_cde_fields", "pack_latent_models",
           "route_vmapped", "route_vmapped_cde", "MAX_PACKED_LANES"]

# Routed vmap solves lane-pack up to this many hidden lanes (K * max(H,
# HH)). Packed weights are [K*H, K*H] and stay VMEM-resident across every
# step, so the cap bounds kernel VMEM at ~1 MB/weight matrix; larger vmap
# axes fall back to the (warned) vmapped scan path.
MAX_PACKED_LANES = 512


def packed_cde_pays(input_channels: int) -> bool:
    """Measured perf gate for the lane-packed fused CDE paths.

    Round-5 fidelity-matched crossover (both arms exact-f32 operands —
    the scan arm runs at the library-default HIGHEST precision since the
    round-5 pin; /tmp/r5/stageC_packed.log, K=3 vs jax.vmap of the scan
    cdeint): packed wins 2.17x at C=5 and 1.21x at C=12, loses at C=16
    (0.67x), C=20 (0.63x), C=28 (0.30x) — exact-f32 in-kernel dots
    (bf16x6 passes) are ~2x the cost of the round-4 bf16x3 arm, which
    moves the crossover down from 16 to between 12 and 16. In the
    production bf16x3 regime the round-5 fidelity-explicit rerun
    (BENCH_PACKED_CDE_R5.json) wins further: 3.85x at C=5, 1.99x at
    C=12, 1.26x at C=16, 1.23x at C=20, losing at C=28 (0.61x) — the
    round-4 threshold of 16 was pessimistic against the slow scan arm.
    Gate: C <= SNSDE_FUSED_CDE_PACKED_MAX_C when set; otherwise
    regime-aware default — 12 for exact-f32 kernels, 20 for bf16x3/bf16
    (0 disables the gate)."""
    import os

    env = os.environ.get("SNSDE_FUSED_CDE_PACKED_MAX_C")
    if env is not None:
        max_c = int(env)
    else:
        from .fused_em import _mm_mode

        max_c = 20 if _mm_mode() else 12
    return max_c <= 0 or input_channels <= max_c


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _check_same_config(fields):
    f0 = fields[0]
    for f in fields[1:]:
        if (f.input_option != f0.input_option
                or f.noise_option != f0.noise_option
                or f.linear_out.out_features != f0.linear_out.out_features
                or f.linear_out.in_features != f0.linear_out.in_features
                or len(f.linears) != len(f0.linears)):
            raise ValueError(
                "pack_fields needs identically-configured models "
                "(same input/noise option, widths, depth)"
            )


def pack_fields(fields):
    """Pack K identically-configured DiffusionFields into one synthetic
    field of hidden width K*H with block-diagonal weights. The result
    exposes exactly the attributes fused_em_solve reads."""
    _check_same_config(fields)
    f0 = fields[0]
    H = f0.linear_out.out_features
    io, no = f0.input_option, f0.noise_option
    time_emb = io in (3, 4, 5, 6)

    def cat(xs):
        return jnp.concatenate(xs, axis=-1)

    def lin_blockdiag(lins):
        return _ns(
            weight=block_diag(*[l.weight for l in lins]),
            bias=cat([l.bias for l in lins]),
            in_features=sum(l.weight.shape[0] for l in lins),
            out_features=sum(l.weight.shape[1] for l in lins),
        )

    def lin_cat_cols(lins):
        """Shared-input rows (time features / data channels): concatenate
        output columns only."""
        return _ns(
            weight=cat([l.weight for l in lins]),
            bias=cat([l.bias for l in lins]),
            in_features=lins[0].weight.shape[0],
            out_features=sum(l.weight.shape[1] for l in lins),
        )

    def lin_time_plus_state(lins, n_time=2):
        """[(n_time + H), HH] weights: time rows concatenated by column,
        state rows block-diagonal."""
        wt = cat([l.weight[:n_time] for l in lins])
        wy = block_diag(*[l.weight[n_time:] for l in lins])
        return _ns(
            weight=jnp.concatenate([wt, wy], axis=0),
            bias=cat([l.bias for l in lins]),
            in_features=n_time + wy.shape[0],
            out_features=wt.shape[1],
        )

    # linear_in: time rows shared across models, state rows block-diag
    if io == 0:
        linear_in = None
    elif time_emb:
        linear_in = lin_time_plus_state([f.linear_in for f in fields])
    else:
        linear_in = lin_blockdiag([f.linear_in for f in fields])

    # emb: rows [:H] (yy part) and [H:] (xh part) block-diag separately,
    # restacked so the packed field splits at K*H exactly like a single
    # field splits at H (fused_em_solve reads emb.weight[:H_packed]).
    emb = None
    if io in (2, 4, 6):
        we1 = block_diag(*[f.emb.weight[:H] for f in fields])
        we2 = block_diag(*[f.emb.weight[H:] for f in fields])
        emb = _ns(
            weight=jnp.concatenate([we1, we2], axis=0),
            bias=cat([f.emb.bias for f in fields]),
        )

    initial_network = None
    if io in (0, 2, 4, 6):
        initial_network = lin_cat_cols([f.initial_network for f in fields])

    linears = [
        lin_blockdiag([f.linears[i] for f in fields])
        for i in range(len(f0.linears))
    ]
    linear_out = lin_blockdiag([f.linear_out for f in fields])

    # per-model theta repeated across that model's lane block
    theta = jnp.concatenate(
        [jnp.broadcast_to(f.theta.reshape(1, 1), (1, H)) for f in fields],
        axis=1,
    )

    sigma = None
    if f0.sigma is not None:
        # scalar sigma per model -> per-lane vector (exp/broadcast in the
        # gk precompute works elementwise over lanes)
        sigma = jnp.concatenate(
            [jnp.broadcast_to(f.sigma.reshape(1), (H,)) for f in fields]
        )
    sigma_diag = None
    if f0.sigma_diag is not None:
        sigma_diag = cat([f.sigma_diag for f in fields])

    noise_t = None
    if f0.noise_t is not None:
        if len(f0.noise_t) == 1:                 # 12/13: 1NN(t)
            noise_t = (lin_cat_cols([f.noise_t[0] for f in fields]),)
        else:                                    # 16/17: 2NN(t)
            noise_t = (
                lin_cat_cols([f.noise_t[0] for f in fields]),
                lin_blockdiag([f.noise_t[1] for f in fields]),
            )
    noise_y = None
    if f0.noise_y is not None:
        first = lin_time_plus_state([f.noise_y[0] for f in fields])
        if len(f0.noise_y) == 1:                 # 14/15
            noise_y = (first,)
        else:                                    # 18/19
            noise_y = (
                first,
                lin_blockdiag([f.noise_y[1] for f in fields]),
            )

    return _ns(
        input_option=io,
        noise_option=no,
        initial_network=initial_network,
        linear_in=linear_in,
        linears=linears,
        linear_out=linear_out,
        emb=emb,
        theta=theta,
        sigma=sigma,
        sigma_diag=sigma_diag,
        noise_t=noise_t,
        noise_y=noise_y,
    )


def _member_xh(fields, paths, tv):
    """Per-member embedded control at concrete times tv: member i's
    Xh_i = paths[i].evaluate_grid(tv) @ W_init_i + b_i, concatenated along
    the lane axis -> [M, B, K*H]. With identical paths this equals the
    shared-path packed precompute exactly (lin_cat_cols concatenates
    output columns of a shared input)."""
    from .fused_em import _pdot

    xhs = []
    for f, p in zip(fields, paths):
        Xg = p.evaluate_grid(tv)
        xhs.append(_pdot(Xg, f.initial_network.weight)
                   + f.initial_network.bias)
    return jnp.concatenate(xhs, axis=-1)


def fused_em_solve_packed(fields, path, times, y0s, keys, dt=None,
                          stream_dtype=None, paths=None):
    """Solve K identically-configured models in one fused EM kernel.

    fields: list of K DiffusionFields (unbound).
    y0s:    [K, B, H] per-model initial states.
    keys:   [K] per-model PRNG keys; packed model i draws the SAME dW as
            fused_em_solve(fields[i], ..., keys[i]) would.
    paths:  optional list of K control paths — one PER MEMBER (the
            robustness sweep's seeds each carry their own missingness
            pattern, so members see different data); `path` is then only
            used for io=0-family shared plumbing and may be paths[0].

    Returns ys [K, T, B, H]."""
    from ..models.neuralsde import resolve_dt
    from ..ops.brownian import brownian_increments
    from ..ops.solve import make_grid

    K = len(fields)
    if y0s.shape[0] != K or len(keys) != K:
        raise ValueError("need one y0 slice and one key per field")
    H = fields[0].linear_out.out_features
    B = y0s.shape[1]
    packed = pack_fields(fields)

    dt = resolve_dt(times) if dt is None else dt
    grid, _ = make_grid(times, dt)
    dWs = []
    for i in range(K):
        kw, _ = jax.random.split(keys[i])
        dWs.append(brownian_increments(kw, grid, (B, H), jnp.float32))
    dW = jnp.concatenate(dWs, axis=-1)           # [M, B, K*H]

    xh = None
    if paths is not None and fields[0].input_option in (0, 2, 4, 6):
        if len(paths) != K:
            raise ValueError("need one control path per field")
        xh = _member_xh(fields, paths, grid[:-1])

    y0 = jnp.concatenate([y0s[i] for i in range(K)], axis=-1)  # [B, K*H]
    ys = fused_em_solve(packed, path, times, y0, keys[0], dt=dt,
                        stream_dtype=stream_dtype, dW_override=dW,
                        xh_override=xh)
    T = ys.shape[0]
    return ys.reshape(T, B, K, H).transpose(2, 0, 1, 3)


def _slice_member(tree, batched, i):
    """Member i of a vmap-stacked pytree: leaves marked batched carry the
    vmap axis at dim 0 (custom_vmap normalizes axes); unbatched leaves are
    shared across members."""
    return jax.tree_util.tree_map(
        lambda l, b: l[i] if b else l, tree, batched
    )


def route_vmapped(kind, field, path, times, y0, key, dt, stream_dtype):
    """Custom batching rule: route a vmapped fused solve onto the
    lane-packed kernel instead of the ~5-6x slower scan fallback.

    fused_{em,srk}_solve detect vmap BatchTracers (Mosaic mis-compiles the
    kernels' scratch carry under automatic vmap lifting — fused_em.is_batched)
    and call this router, which wraps the solve in jax.custom_batching so
    the batching interpreter hands us the K stacked members: they are
    sliced out, lane-packed with block-diagonal weights (pack_fields) and
    solved by ONE fused kernel call. fused_*_solve_packed's key contract
    makes routed member i draw the same Brownian increments a sequential
    fused solve with keys[i] would (bit-exact under the threefry PRNG; the
    default RBG PRNG is not transform-invariant for any vmapped draw, so
    there routed == packed == sequential, all differing from what a
    literal vmapped scan would draw).

    Composition: only grad-AROUND-vmap is supported (grad(vmap(f)) /
    jit(grad(vmap(f)))) — custom_vmap does not implement JVP of the
    unbatched primal, but the unbatched path never runs here (the router
    is only invoked when batching was already detected).

    Falls back to the previous warned vmapped-scan behavior when the
    packed width K*max(H, HH) exceeds MAX_PACKED_LANES.
    """
    from jax.custom_batching import custom_vmap

    from ..ops.solve import sdeint

    if kind == "em":
        solve, packed_solve, method = (
            fused_em_solve, fused_em_solve_packed, "euler")
    else:
        from .fused_srk import fused_srk_solve

        solve, packed_solve, method = (
            fused_srk_solve, fused_srk_solve_packed, "srk")

    @custom_vmap
    def core(field, path, y0, key):
        return solve(field, path, times, y0, key, dt=dt,
                     stream_dtype=stream_dtype)

    @core.def_vmap
    def rule(axis_size, in_batched, field_b, path_b, y0_b, key_b):
        K = axis_size
        fb, pb, yb, kb = in_batched
        # static widths are readable without slicing members out
        H = field_b.linear_out.out_features
        HH = field_b.linear_out.in_features
        from .fused_em import is_batched

        nested = is_batched(field_b, path_b, y0_b, key_b)
        if nested or K * max(H, HH) > MAX_PACKED_LANES:
            # Two reasons to keep the (warned) vmapped scan path:
            # (a) an OUTER vmap is still tracing (nested vmap) — the
            # packed kernel's caller plumbing cannot run under a second
            # batch trace, but a vmapped scan lifts through it cleanly;
            # (b) the axis is too wide to lane-pack.
            warnings.warn(
                (f"nested vmap over a fused {kind} solve" if nested else
                 f"vmapped fused {kind} solve: packed width {K}*"
                 f"{max(H, HH)} exceeds MAX_PACKED_LANES="
                 f"{MAX_PACKED_LANES}")
                + "; falling back to the ~5x slower scan path. Split the "
                "vmap axis or use snsde.kernels.multi directly.",
                stacklevel=2,
            )
            in_axes = jax.tree_util.tree_map(
                lambda b: 0 if b else None, (fb, yb, kb)
            )

            def scan_one(f, y, k):
                # the bound field carries its own control path; the
                # separate `path` arg is only used by the fused precompute
                return sdeint(f.f, f.g, y, times, key=k, dt=dt,
                              method=method)

            return (
                jax.vmap(scan_one, in_axes=in_axes)(field_b, y0_b, key_b),
                True,
            )

        members = [_slice_member(field_b, fb, i) for i in range(K)]
        paths = None
        shared_path = path_b
        if any(jax.tree_util.tree_leaves(pb)):
            paths = [_slice_member(path_b, pb, i) for i in range(K)]
            shared_path = paths[0]
        y0s = y0_b if yb else jnp.broadcast_to(
            y0_b, (K,) + y0_b.shape)
        keys = [key_b[i] if kb else key_b for i in range(K)]
        ys = packed_solve(members, shared_path, times, y0s, keys, dt=dt,
                          stream_dtype=stream_dtype, paths=paths)
        return ys, True

    return core(field, path, y0, key)


def fused_srk_solve_packed(fields, path, times, y0s, keys, dt=None,
                           stream_dtype=None, paths=None):
    """Lane-packed SRIW1 solve — same contract as fused_em_solve_packed
    (incl. optional per-member `paths`) but through the fused SRK kernel
    (the torch-ists default solver), with per-model (dW, I10) drawn
    exactly like fused_srk_solve would from each member's key.
    Returns ys [K, T, B, H]."""
    from ..kernels.fused_srk import fused_srk_solve
    from ..models.neuralsde import resolve_dt
    from ..ops.brownian import brownian_increments, space_time_levy_area
    from ..ops.solve import make_grid

    K = len(fields)
    if y0s.shape[0] != K or len(keys) != K:
        raise ValueError("need one y0 slice and one key per field")
    H = fields[0].linear_out.out_features
    B = y0s.shape[1]
    packed = pack_fields(fields)

    dt = resolve_dt(times) if dt is None else dt
    grid, _ = make_grid(times, dt)
    dWs, I10s = [], []
    for i in range(K):
        kw, ku = jax.random.split(keys[i])
        dw = brownian_increments(kw, grid, (B, H), jnp.float32)
        dWs.append(dw)
        I10s.append(space_time_levy_area(ku, grid, (B, H), dw,
                                         jnp.float32))
    dW = jnp.concatenate(dWs, axis=-1)
    I10 = jnp.concatenate(I10s, axis=-1)

    xh = None
    if paths is not None and fields[0].input_option in (0, 2, 4, 6):
        if len(paths) != K:
            raise ValueError("need one control path per field")
        import numpy as _np

        dts_np = _np.diff(grid).astype(_np.float64)
        td = [grid[:-1], grid[:-1] + 0.75 * dts_np]  # SRK drift stages
        xh = tuple(_member_xh(fields, paths, tv) for tv in td)

    y0 = jnp.concatenate([y0s[i] for i in range(K)], axis=-1)
    ys = fused_srk_solve(packed, path, times, y0, keys[0], dt=dt,
                         stream_dtype=stream_dtype,
                         brownian_override=(dW, I10), xh_override=xh)
    T = ys.shape[0]
    return ys.reshape(T, B, K, H).transpose(2, 0, 1, 3)


# ---------------------------------------------------------------------------
# Lane-packed CDE solves (the NCDE family's sweep workloads)
# ---------------------------------------------------------------------------

def pack_cde_fields(funcs):
    """Pack K identically-configured FinalTanh/SingleHiddenLayer vector
    fields into one synthetic field of hidden width K*H with
    block-diagonal weights. Exactness argument: every mixing in the field
    is a matmul against a member's weight matrix, and the out-projection's
    h-major column layout keeps each member's [HH, H*C] block CONTIGUOUS
    ((i*H + h)*C + c spans [i*H*C, (i+1)*H*C)), so plain block_diag packs
    it; the kernel's one-hot E/S matrices are member-aware
    (fused_cde._onehots). The activation pattern rides through unchanged
    (elementwise over lanes)."""
    from .fused_cde import _field_kind

    kind0 = _field_kind(funcs[0])
    if kind0 is None:
        raise ValueError("pack_cde_fields needs FinalTanh, "
                         "SingleHiddenLayer or GRUODEField members")
    for f in funcs[1:]:
        if (_field_kind(f) != kind0
                or f.hidden_channels != funcs[0].hidden_channels
                or f.input_channels != funcs[0].input_channels):
            raise ValueError(
                "pack_cde_fields needs identically-configured fields "
                "(same kind, widths, depth)"
            )
    act, n_inner = kind0
    K = len(funcs)

    def bd(lins):
        return _ns(
            weight=block_diag(*[l.weight for l in lins]),
            bias=jnp.concatenate([l.bias for l in lins]),
            in_features=sum(l.weight.shape[0] for l in lins),
            out_features=sum(l.weight.shape[1] for l in lins),
        )

    if act == "relu":
        lin_in = bd([f.linear_in for f in funcs])
        inners = tuple(
            bd([f.linears[i] for f in funcs]) for i in range(n_inner)
        )
        lin_out = bd([f.linear_out for f in funcs])
        extra = dict(linear_in=lin_in, linears=inners, linear_out=lin_out)
    elif act == "tanh":
        extra = dict(linear1=bd([f.linear1 for f in funcs]),
                     linear2=bd([f.linear2 for f in funcs]))
    else:                              # gruode: three H -> H*C gates
        extra = dict(W_r=bd([f.W_r for f in funcs]),
                     W_z=bd([f.W_z for f in funcs]),
                     W_h=bd([f.W_h for f in funcs]))
    return _ns(
        fused_cde_kind=kind0,
        fused_cde_members=K,
        hidden_channels=K * funcs[0].hidden_channels,
        input_channels=funcs[0].input_channels,
        **extra,
    )


def fused_cde_solve_packed(funcs, path, times, z0s, dt=None,
                           method="rk4", stream_dtype=None, paths=None):
    """Solve K identically-configured CDE vector fields in one fused CDE
    kernel invocation.

    funcs: list of K FinalTanh/SingleHiddenLayer fields.
    z0s:   [K, B, H] per-member initial states.
    paths: optional list of K control paths — one PER MEMBER (per-seed
           missingness in the robustness sweep); omitted -> all members
           ride `path`. Returns zs [K, T, B, H]."""
    from ..models.neuralsde import resolve_dt
    from ..ops.solve import make_grid
    from .fused_cde import (_stage_grid, _stage_times,
                            fused_cde_solve)

    K = len(funcs)
    if z0s.shape[0] != K:
        raise ValueError("need one z0 slice per field")
    H = funcs[0].hidden_channels
    B = z0s.shape[1]
    packed = pack_cde_fields(funcs)
    z0 = jnp.concatenate([z0s[i] for i in range(K)], axis=-1)

    dt = resolve_dt(times, floor=0.0) if dt is None else dt
    dx = None
    members = 1
    if paths is not None:
        if len(paths) != K:
            raise ValueError("need one control path per field")
        members = K
        grid, _ = make_grid(times, dt)
        import numpy as _np

        hs = _np.diff(grid)
        ut = _stage_times(method)[0]
        stage_t = _stage_grid(grid, hs, ut)
        M, NT, C = len(hs), len(ut), funcs[0].input_channels
        ds = []
        for p in paths:
            dv = p.derivative_grid(stage_t)          # [M*NT, B, C]
            ds.append(jnp.moveaxis(dv.reshape(M, NT, B, C), 1, 2)
                      .reshape(M, B, NT * C))
        dx = jnp.concatenate(ds, axis=-1)            # [M, B, K*NT*C]

    zs = fused_cde_solve(packed, path, times, z0, dt=dt, method=method,
                         stream_dtype=stream_dtype, members=members,
                         dx_override=dx)
    T = zs.shape[0]
    return zs.reshape(T, B, K, H).transpose(2, 0, 1, 3)


def route_vmapped_cde(func, path, times, z0, dt, method, stream_dtype):
    """Custom batching rule for vmapped fused CDE solves: slice the K
    stacked members out, lane-pack them (pack_cde_fields) and solve them
    in ONE kernel call — same policy and caveats as route_vmapped
    (grad-around-vmap only; nested vmap and too-wide axes keep the warned
    vmapped-scan fallback)."""
    from jax.custom_batching import custom_vmap

    from ..ops.solve import cdeint
    from .fused_cde import (_MAX_WOUT_BYTES, _field_kind, _round_up,
                            _stage_times, fused_cde_solve, is_batched)

    @custom_vmap
    def core(func, path, z0):
        return fused_cde_solve(func, path, times, z0, dt=dt, method=method,
                               stream_dtype=stream_dtype)

    @core.def_vmap
    def rule(axis_size, in_batched, func_b, path_b, z0_b):
        K = axis_size
        fb, pb, zb = in_batched
        H = func_b.hidden_channels
        kind = _field_kind(func_b)
        if kind[0] == "relu":
            HH = func_b.linear_in.out_features
        elif kind[0] == "tanh":
            HH = func_b.linear1.out_features
        else:                          # gruode
            HH = H
        C = func_b.input_channels
        NT = len(_stage_times(method)[0])
        nested = is_batched(func_b, path_b, z0_b)
        per_member_paths = any(jax.tree_util.tree_leaves(pb))
        packed_sw = _round_up((K if per_member_paths else 1) * NT * C, 128)
        # mirror supports_fused_cde's guards at the PACKED widths — the
        # per-member check alone would route VMEM-blowing packs into a
        # Mosaic compile failure instead of the warned scan fallback
        chp_p = _round_up(K * H * C, 128)
        if kind[0] == "gruode":
            wide_bytes_p = 3 * _round_up(K * H, 128) * chp_p * 4
        else:
            wide_bytes_p = _round_up(K * HH, 128) * chp_p * 4
        too_wide = (K * max(H, HH) > MAX_PACKED_LANES
                    or chp_p > 4096
                    or packed_sw > 512
                    or wide_bytes_p > _MAX_WOUT_BYTES)
        if not packed_cde_pays(C) and not (nested or too_wide):
            # measured perf gate (BENCH_PACKED_CDE.json): at wide C the
            # packed kernel loses to the vmapped scan — route there
            # QUIETLY (a policy choice, not a capability limit)
            in_axes = jax.tree_util.tree_map(
                lambda b: 0 if b else None, (fb, pb, zb)
            )
            out = jax.vmap(
                lambda f, p, z: cdeint(p, f, z, times, dt=dt,
                                       method=method),
                in_axes=in_axes,
            )(func_b, path_b, z0_b)
            return out, True
        if nested or too_wide:
            warnings.warn(
                ("nested vmap over a fused cde solve" if nested else
                 f"vmapped fused cde solve: packed widths (K={K}, H={H}, "
                 f"C={C}) exceed the lane caps")
                + "; falling back to the scan path. Split the vmap axis "
                "or use snsde.kernels.multi.fused_cde_solve_packed.",
                stacklevel=2,
            )
            in_axes = jax.tree_util.tree_map(
                lambda b: 0 if b else None, (fb, pb, zb)
            )
            out = jax.vmap(
                lambda f, p, z: cdeint(p, f, z, times, dt=dt,
                                       method=method),
                in_axes=in_axes,
            )(func_b, path_b, z0_b)
            return out, True

        members = [_slice_member(func_b, fb, i) for i in range(K)]
        paths = None
        shared_path = path_b
        if per_member_paths:
            paths = [_slice_member(path_b, pb, i) for i in range(K)]
            shared_path = paths[0]
        z0s = z0_b if zb else jnp.broadcast_to(z0_b, (K,) + z0_b.shape)
        zs = fused_cde_solve_packed(members, shared_path, times, z0s,
                                    dt=dt, method=method,
                                    stream_dtype=stream_dtype, paths=paths)
        return zs, True

    return core(func, path, z0)


# ---------------------------------------------------------------------------
# Lane-packed LatentSDE solves
# ---------------------------------------------------------------------------

def pack_latent_models(models):
    """Pack K identically-configured LatentSDE models into one synthetic
    latent spec of augmented width K*Hm. Per-member zero rows/columns at
    each KL lane keep the KL channels out of the drift MLP exactly like a
    single model's padding does; theta/mu/sigma become per-lane rows that
    the kernel's member-aware masks consume (fused_em._latent_u)."""
    m0 = models[0]
    Hm = m0.linear_out.out_features + 1        # augmented member width
    HH = m0.linear_out.in_features
    for m in models[1:]:
        if (m.linear_out.out_features != Hm - 1
                or m.linear_out.in_features != HH
                or len(m.linears) != len(m0.linears)):
            raise ValueError("pack_latent_models needs identically-"
                             "configured models (same widths, depth)")
    K = len(models)

    def zrow(w):                                # [Hm-1, HH] -> [Hm, HH]
        return jnp.concatenate([w, jnp.zeros((1, w.shape[1]), w.dtype)])

    def zcol(w):                                # [HH, Hm-1] -> [HH, Hm]
        return jnp.concatenate([w, jnp.zeros((w.shape[0], 1), w.dtype)],
                               axis=1)

    wt = jnp.concatenate([m.linear_in.weight[:2] for m in models], axis=1)
    wy = block_diag(*[zrow(m.linear_in.weight[2:]) for m in models])
    linear_in = _ns(
        weight=jnp.concatenate([wt, wy], axis=0),
        bias=jnp.concatenate([m.linear_in.bias for m in models]),
        in_features=2 + K * Hm, out_features=K * HH,
    )
    linears = tuple(
        _ns(weight=block_diag(*[m.linears[i].weight for m in models]),
            bias=jnp.concatenate([m.linears[i].bias for m in models]),
            in_features=K * HH, out_features=K * HH)
        for i in range(len(m0.linears))
    )
    linear_out = _ns(
        weight=block_diag(*[zcol(m.linear_out.weight) for m in models]),
        bias=jnp.concatenate([
            jnp.concatenate([m.linear_out.bias,
                             jnp.zeros((1,), m.linear_out.bias.dtype)])
            for m in models
        ]),
        in_features=K * HH, out_features=K * Hm,
    )

    def row(get):
        return jnp.concatenate([
            jnp.broadcast_to(get(m).astype(jnp.float32), (Hm,))
            for m in models
        ])

    return _ns(
        linear_in=linear_in, linears=linears, linear_out=linear_out,
        sigma_row=row(lambda m: m.sigma.value[0, 0]),
        theta_row=row(lambda m: m.theta.value[0, 0]),
        mu_row=row(lambda m: m.mu.value[0, 0]),
        lat_hm=Hm,
    )


def fused_latent_em_solve_packed(models, times, aug0s, keys, dt=None,
                                 stream_dtype=None):
    """Solve K identically-configured LatentSDE augmented systems in one
    fused latent EM kernel invocation.

    aug0s: [K, B, Hm] per-member augmented initial states (KL lane zero).
    keys:  [K] per-member PRNG keys; packed member i draws the SAME dW as
           fused_latent_em_solve(models[i], ..., keys[i]) would.
    Returns ys [K, T, B, Hm] (member KL totals at ys[i, -1, :, -1])."""
    from ..models.neuralsde import resolve_dt
    from ..ops.brownian import brownian_increments
    from ..ops.solve import make_grid
    from .fused_em import fused_latent_em_solve

    K = len(models)
    if aug0s.shape[0] != K or len(keys) != K:
        raise ValueError("need one aug0 slice and one key per model")
    Hm = aug0s.shape[-1]
    B = aug0s.shape[1]
    packed = pack_latent_models(models)

    dt = resolve_dt(times) if dt is None else dt
    grid, _ = make_grid(times, dt)
    dWs = []
    for i in range(K):
        kw, _ = jax.random.split(keys[i])
        dWs.append(brownian_increments(kw, grid, (B, Hm), jnp.float32))
    dW = jnp.concatenate(dWs, axis=-1)             # [M, B, K*Hm]

    aug0 = jnp.concatenate([aug0s[i] for i in range(K)], axis=-1)
    ys = fused_latent_em_solve(packed, times, aug0, keys[0], dt=dt,
                               stream_dtype=stream_dtype, dW_override=dW)
    T = ys.shape[0]
    return ys.reshape(T, B, K, Hm).transpose(2, 0, 1, 3)
