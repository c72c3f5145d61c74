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
