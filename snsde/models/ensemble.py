"""Seed ensembles trained through one lane-packed fused kernel.

The reference's dominant workloads repeat the SAME model config over
seeds — 5 repeats per cell in the classification grids
(benchmark_classification/sepsis-sde.py:70-83) and 5 seeds per cell in
the robustness sweep (torch-ists/model_run.py:294-305) — training each
replica in its own process. `SeedEnsemble` trains K same-config replicas
CONCURRENTLY: the SDE solve (the entire hot loop) runs as one lane-packed
fused kernel invocation (kernels/multi.py, ~1.8x sweep throughput for
K=2 at H=49 on v5e, more for smaller H), while the tiny per-replica
initial networks and readout heads run as ordinary per-member ops.

Members are statistically independent: per-member init keys, per-member
Brownian keys (packed member i draws the same dW a solo run with that key
would), per-member dropout keys. Off-TPU (or under SNSDE_NO_FUSED=1) the
solve falls back to per-member scan solves with identical key handling.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Module, module, static_field
from ..nn.layers import Linear
from ..ops.interp import CubicPath
from .neuralsde import ReadoutHead, resolve_dt, solve_dispatch

__all__ = ["SeedEnsemble"]


@module
class SeedEnsemble(Module):
    """K seed-replicas of a terminal-readout grid NeuralSDE.

    forward(times, coeffs, final_index) -> logits [K, B, out]: every
    member sees the same data and solves with its own weights and noise.
    """

    fields: Tuple[Module, ...]             # K same-config DiffusionFields
    initial_networks: Tuple[Linear, ...]
    readouts: Tuple[ReadoutHead, ...]
    method: str = static_field(default="euler")

    @staticmethod
    def create(key, make_field, input_channels: int, hidden_channels: int,
               output_channels: int, n_members: int,
               method: str = "euler", dtype=jnp.float32) -> "SeedEnsemble":
        """make_field(key) -> DiffusionField (same config per call)."""
        keys = jax.random.split(key, n_members)
        fields, inits, reads = [], [], []
        for km in keys:
            k1, k2, k3 = jax.random.split(km, 3)
            fields.append(make_field(k1))
            inits.append(Linear.create(k2, input_channels, hidden_channels,
                                       dtype=dtype))
            reads.append(ReadoutHead.create(k3, hidden_channels,
                                            output_channels, dtype=dtype))
        return SeedEnsemble(fields=tuple(fields),
                            initial_networks=tuple(inits),
                            readouts=tuple(reads), method=method)

    @property
    def n_members(self) -> int:
        return len(self.fields)

    # --- member subtree plumbing for fit_classifier_ensemble ---
    @staticmethod
    def member_subtree(tree, k):
        return tree.replace(fields=(tree.fields[k],),
                            initial_networks=(tree.initial_networks[k],),
                            readouts=(tree.readouts[k],))

    @staticmethod
    def replace_member(tree, k, sub):
        fs, ins, rs = (list(tree.fields), list(tree.initial_networks),
                       list(tree.readouts))
        fs[k], ins[k], rs[k] = (sub.fields[0], sub.initial_networks[0],
                                sub.readouts[0])
        return tree.replace(fields=tuple(fs), initial_networks=tuple(ins),
                            readouts=tuple(rs))

    @staticmethod
    def member_reg_subtree(member):
        return member.fields[0]

    def solve(self, times, coeffs, *, key, dt=None):
        """Packed solve. Returns zs [K, L, B, H]."""
        path = CubicPath(coeffs, times)
        x0 = path.evaluate(jnp.asarray(times)[0])
        y0s = jnp.stack([net(x0) for net in self.initial_networks])
        dt = resolve_dt(times) if dt is None else dt
        keys = list(jax.random.split(key, self.n_members))
        use_packed = (
            self.method == "euler"
            and jax.default_backend() == "tpu"
            and os.environ.get("SNSDE_NO_FUSED", "0") != "1"
        )
        if use_packed:
            from ..kernels.fused_em import is_batched
            from ..kernels.multi import fused_em_solve_packed

            if not is_batched(self.fields, y0s, keys[0]):
                return fused_em_solve_packed(list(self.fields), path,
                                             times, y0s, keys, dt=dt)
        zs = [
            solve_dispatch(f.bind(path), path, times, y0s[i], key=keys[i],
                           dt=dt, method=self.method)
            for i, f in enumerate(self.fields)
        ]
        return jnp.stack(zs)                         # [K, L, B, H]

    def __call__(self, times, coeffs, final_index, *, key, train=False,
                 dt=None):
        ksolve, kdrop = jax.random.split(key)
        zs = self.solve(times, coeffs, key=ksolve, dt=dt)   # [K, L, B, H]
        idx = jnp.asarray(final_index)
        preds, new_reads = [], []
        for i, head in enumerate(self.readouts):
            z = jnp.take_along_axis(
                jnp.moveaxis(zs[i], 0, 1), idx[:, None, None], axis=1
            )[:, 0]                                  # [B, H]
            p, new_head = head(z, key=jax.random.fold_in(kdrop, i),
                               train=train)
            preds.append(p)
            new_reads.append(new_head)
        return jnp.stack(preds), self.replace(readouts=tuple(new_reads))


def packed_solve(fields, path, times, y0s, keys, *, method="euler",
                 dt=None, paths=None):
    """Shared K-member solve dispatch: one lane-packed fused kernel on TPU
    (euler -> fused_em, srk -> fused_srk), per-member scan solves
    otherwise (identical key handling either way). `paths` (list of K)
    gives each member its OWN control path (per-seed missingness in the
    robustness sweep); omitted, all members share `path`.
    Returns [K, L, B, H]."""
    dt = resolve_dt(times) if dt is None else dt
    use_packed = (
        jax.default_backend() == "tpu"
        and method in ("euler", "srk")
        and os.environ.get("SNSDE_NO_FUSED", "0") != "1"
    )
    if use_packed:
        from ..kernels.fused_em import is_batched
        from ..kernels.multi import (fused_em_solve_packed,
                                     fused_srk_solve_packed)

        if not is_batched(fields, y0s, keys[0], paths):
            packed_fn = (fused_em_solve_packed if method == "euler"
                         else fused_srk_solve_packed)
            return packed_fn(list(fields), path, times, y0s, keys, dt=dt,
                             paths=paths)
    member_paths = paths if paths is not None else [path] * len(fields)
    zs = [
        solve_dispatch(f.bind(member_paths[i]), member_paths[i], times,
                       y0s[i], key=keys[i], dt=dt, method=method)
        for i, f in enumerate(fields)
    ]
    return jnp.stack(zs)


def packed_cde_solve(funcs, path, times, z0s, *, method="rk4", dt=None,
                     paths=None):
    """K-member CDE solve dispatch (packed_solve's deterministic twin):
    one lane-packed fused CDE kernel on TPU for supported
    (field, tableau) pairs, per-member scan cdeint otherwise. `paths`
    (list of K) gives each member its own control path. Returns
    [K, L, B, H]."""
    from .neuralsde import resolve_dt as _rdt

    dt = _rdt(times, floor=0.0) if dt is None else dt
    use_packed = (
        jax.default_backend() == "tpu"
        and os.environ.get("SNSDE_NO_FUSED", "0") != "1"
    )
    if use_packed:
        from ..kernels.fused_cde import is_batched, supports_fused_cde
        from ..kernels.multi import (fused_cde_solve_packed,
                                     pack_cde_fields, packed_cde_pays)

        if not packed_cde_pays(funcs[0].input_channels):
            use_packed = False         # measured C gate (multi.py)
    if use_packed:
        if not is_batched(funcs, z0s, paths):
            try:
                packed = pack_cde_fields(list(funcs))
            except ValueError:
                packed = None
            if packed is not None and supports_fused_cde(packed, method):
                return fused_cde_solve_packed(list(funcs), path, times,
                                              z0s, dt=dt, method=method,
                                              paths=paths)
    from ..ops.solve import cdeint

    member_paths = paths if paths is not None else [path] * len(funcs)
    zs = [
        cdeint(member_paths[i], f, z0s[i], times, dt=dt, method=method)
        for i, f in enumerate(funcs)
    ]
    return jnp.stack(zs)


@module
class IVMember(Module):
    """One seed replica of the sepsis InitialValue model: static-feature
    encoder (sepsis-sde.py:15-28) + DiffusionField + terminal readout."""

    linear1: Linear
    linear2: Linear
    field: Module
    readout: "Module"


@module
class InitialValueSeedEnsemble(Module):
    """K seed replicas of the sepsis flagship model trained through ONE
    lane-packed solve (the reference trains each of its 5 repeats,
    sepsis-sde.py:70-83, in its own process on the SAME data — repeats
    differ only in init + training noise, which maps exactly onto packed
    members with per-member keys).

    forward(times, coeffs, static, final_index) -> logits [K, B, out].
    """

    members: Tuple[IVMember, ...]
    method: str = static_field(default="euler")

    @staticmethod
    def create(key, make_field, static_dim: int, hidden_channels: int,
               output_channels: int, n_members: int,
               method: str = "euler") -> "InitialValueSeedEnsemble":
        """make_field(key) -> DiffusionField (same config per call)."""
        keys = jax.random.split(key, n_members)
        members = []
        for km in keys:
            k1, k2, k3, k4 = jax.random.split(km, 4)
            members.append(IVMember(
                linear1=Linear.create(k1, static_dim, 256),
                linear2=Linear.create(k2, 256, hidden_channels),
                field=make_field(k3),
                readout=ReadoutHead.create(k4, hidden_channels,
                                           output_channels),
            ))
        return InitialValueSeedEnsemble(members=tuple(members),
                                        method=method)

    @property
    def n_members(self) -> int:
        return len(self.members)

    # --- member subtree plumbing for fit_classifier_ensemble ---
    @staticmethod
    def member_subtree(tree, k):
        return tree.members[k]

    @staticmethod
    def replace_member(tree, k, sub):
        ms = list(tree.members)
        ms[k] = sub
        return tree.replace(members=tuple(ms))

    @staticmethod
    def member_reg_subtree(member):
        return member.field

    def __call__(self, times, coeffs, static, final_index, *, key,
                 train=False, dt=None):
        ksolve, kdrop = jax.random.split(key)
        y0s = jnp.stack([
            m.linear2(jax.nn.relu(m.linear1(static))) for m in self.members
        ])                                            # [K, B, H]
        path = CubicPath(coeffs, times)
        keys = list(jax.random.split(ksolve, self.n_members))
        zs = packed_solve([m.field for m in self.members], path, times,
                          y0s, keys, method=self.method, dt=dt)
        idx = jnp.asarray(final_index)
        preds, new_members = [], []
        for i, m in enumerate(self.members):
            z = jnp.take_along_axis(
                jnp.moveaxis(zs[i], 0, 1), idx[:, None, None], axis=1
            )[:, 0]                                   # [B, H]
            p, new_head = m.readout(z, key=jax.random.fold_in(kdrop, i),
                                    train=train)
            preds.append(p)
            new_members.append(m.replace(readout=new_head))
        return jnp.stack(preds), self.replace(members=tuple(new_members))
