"""NeuralSDE model wrappers (terminal / stream / forecasting heads).

TPU-native rebuild of:
  * `NeuralSDE` classification wrapper
    (/root/reference/benchmark_classification/models_sde/neuralsde.py:51-120)
  * `NeuralSDE_forecasting`
    (/root/reference/benchmark_forecasting/models_sde/neuralsde.py:123-186)
  * torch-ists stream variant
    (/root/reference/torch-ists/torch_ists/diff_module/NSDE/nsde_model.py:45-84)
  * tutorial `NDE_model` (tutorial notebooks cell 7)

Design differences from the reference (deliberate, TPU-first):
  * The reference's "output-time surgery" (solving only at the unique
    final-index times, neuralsde.py:94-103) exists to save per-step Python
    overhead in torchsde. Here the solver is one compiled scan that must
    step through every grid interval anyway (dt = min Δt), so we solve on
    the full grid and gather each sample's final state — identical result,
    no data-dependent shapes.
  * Control-path state is bound functionally (`func.bind(path)`), not
    mutated.
  * Dropout/BatchNorm state is threaded functionally; calls return
    (output, updated_model).
"""

from __future__ import annotations


import os

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import Module, module, static_field
from ..nn.layers import BatchNorm, Dropout, Linear
from ..ops.interp import CubicPath
from ..ops.solve import sdeint

__all__ = ["ReadoutHead", "NeuralSDE", "NeuralSDEStream",
           "NeuralSDEForecasting", "NDEModel", "resolve_dt",
           "solve_dispatch"]


def resolve_dt(times, floor: float = 1e-3) -> float:
    """torchsde-compatible default step: max(min Δt, 1e-3)
    (reference neuralsde.py:30-48)."""
    t = np.asarray(jax.device_get(times), dtype=np.float64)
    return float(max(np.min(t[1:] - t[:-1]), floor))


def solve_dispatch(func, path, times, y0, *, key, dt, method, bm=None,
                   use_fused: bool = True):
    """Shared solver dispatch: the fused Pallas kernels when the bound
    field supports them (the full 7x20 grid; euler -> fused_em, srk ->
    fused_srk, TPU only), otherwise the generic scan solver.
    SNSDE_NO_FUSED=1 forces the scan path (perf A/Bs, debugging)."""
    if os.environ.get("SNSDE_NO_FUSED", "0") == "1":
        use_fused = False
    if use_fused and bm is None and jax.default_backend() == "tpu":
        if method == "euler":
            from ..kernels.fused_em import fused_em_solve, supports_fused

            if supports_fused(func):
                return fused_em_solve(func, path, times, y0, key, dt=dt)
        elif method == "srk":
            from ..kernels.fused_srk import (fused_srk_solve,
                                             supports_fused_srk)

            if supports_fused_srk(func):
                return fused_srk_solve(func, path, times, y0, key, dt=dt)
    return sdeint(func.f, func.g, y0, times, key=key, dt=dt, method=method,
                  bm=bm)


@module
class ReadoutHead(Module):
    """Linear -> BatchNorm -> ReLU -> Dropout(0.1) -> Linear
    (reference neuralsde.py:59-61)."""

    linear1: Linear
    norm: BatchNorm
    dropout: Dropout
    linear2: Linear

    @staticmethod
    def create(key, hidden_channels: int, output_channels: int,
               dropout: float = 0.1, dtype=jnp.float32) -> "ReadoutHead":
        k1, k2 = jax.random.split(key)
        return ReadoutHead(
            linear1=Linear.create(k1, hidden_channels, hidden_channels,
                                  dtype=dtype),
            norm=BatchNorm.create(hidden_channels, dtype=dtype),
            dropout=Dropout(rate=dropout),
            linear2=Linear.create(k2, hidden_channels, output_channels,
                                  dtype=dtype),
        )

    def __call__(self, x, *, key=None, train: bool = False):
        h = self.linear1(x)
        h, norm = self.norm(h, train=train)
        h = jax.nn.relu(h)
        h = self.dropout(h, key=key, train=train)
        out = self.linear2(h)
        return out, self.replace(norm=norm)


@module
class NeuralSDE(Module):
    """Terminal-readout NeuralSDE for classification.

    forward(times, coeffs, final_index) — times [L], packed hermite/natural
    coeffs [B, L-1, 4C], final_index [B] int. Returns logits [B, out] (or the
    stream [B, L, out] with stream=True).
    """

    func: Module              # any field with .bind/.f/.g
    initial_network: Linear
    readout: ReadoutHead
    initial: bool = static_field(default=True)
    method: str = static_field(default="euler")

    @staticmethod
    def create(key, func, input_channels: int, hidden_channels: int,
               output_channels: int, initial: bool = True,
               method: str = "euler", dtype=jnp.float32) -> "NeuralSDE":
        k1, k2 = jax.random.split(key)
        return NeuralSDE(
            func=func,
            initial_network=Linear.create(k1, input_channels,
                                          hidden_channels, dtype=dtype),
            readout=ReadoutHead.create(k2, hidden_channels, output_channels,
                                       dtype=dtype),
            initial=initial,
            method=method,
        )

    def solve(self, times, coeffs, *, key, z0=None, dt=None, method=None,
              bm=None, use_fused: bool = True):
        """Bind control path, build z0, integrate over the full grid.
        Returns zs [L, B, H].

        When the vector field is in the fused-kernel family (LSDE/LNSDE/
        GSDE configs) and method is euler, dispatches to the Pallas
        fused-EM kernel (kernels.fused_em) — same math, whole time loop
        on-chip."""
        path = CubicPath(coeffs, times)
        func = self.func.bind(path)
        if z0 is None:
            if not self.initial:
                raise ValueError("expected an explicit z0 (initial=False)")
            z0 = self.initial_network(path.evaluate(jnp.asarray(times)[0]))
        dt = resolve_dt(times) if dt is None else dt
        method = method or self.method
        return solve_dispatch(func, path, times, z0, key=key, dt=dt,
                              method=method, bm=bm, use_fused=use_fused)

    def __call__(self, times, coeffs, final_index, *, key, z0=None,
                 stream: bool = False, train: bool = False, dt=None,
                 method=None, bm=None):
        ksolve, kdrop = jax.random.split(key)
        zs = self.solve(times, coeffs, key=ksolve, z0=z0, dt=dt,
                        method=method, bm=bm)          # [L, B, H]
        if stream:
            z = jnp.moveaxis(zs, 0, -2)                 # [B, L, H]
        else:
            # gather per-sample final state (replaces output-time surgery)
            idx = jnp.asarray(final_index)
            z = jnp.take_along_axis(
                jnp.moveaxis(zs, 0, 1), idx[:, None, None], axis=1
            )[:, 0]                                     # [B, H]
        pred, readout = self.readout(z, key=kdrop, train=train)
        return pred, self.replace(readout=readout)


@module
class NeuralSDEStream(Module):
    """torch-ists stream variant: whole trajectory + per-step linear readout
    (nsde_model.py:45-84). Default solver 'srk'."""

    func: Module
    initial_network: Linear
    linear: Linear
    initial: bool = static_field(default=True)
    method: str = static_field(default="srk")

    @staticmethod
    def create(key, func, input_channels: int, hidden_channels: int,
               output_channels: int, initial: bool = True,
               method: str = "srk", dtype=jnp.float32) -> "NeuralSDEStream":
        k1, k2 = jax.random.split(key)
        return NeuralSDEStream(
            func=func,
            initial_network=Linear.create(k1, input_channels,
                                          hidden_channels, dtype=dtype),
            linear=Linear.create(k2, hidden_channels, output_channels,
                                 dtype=dtype),
            initial=initial,
            method=method,
        )

    def __call__(self, times, coeffs, *, key, dt=None, method=None, bm=None):
        path = CubicPath(coeffs, times)
        func = self.func.bind(path)
        if self.initial:
            y0 = self.initial_network(path.evaluate(jnp.asarray(times)[0]))
        else:
            B = path.a.shape[0]
            H = self.linear.in_features
            y0 = jnp.zeros((B, H), path.a.dtype)
        dt = resolve_dt(times) if dt is None else dt
        zs = solve_dispatch(func, path, times, y0, key=key, dt=dt,
                            method=method or self.method, bm=bm)
        z = jnp.moveaxis(zs, 0, 1)                         # [B, L, H]
        return self.linear(z), z


@module
class NeuralSDEForecasting(Module):
    """Solve on the full grid, then apply a ReLU-MLP readout to the last
    `output_time` steps (reference forecasting neuralsde.py:123-186)."""

    func: Module
    initial_network: Linear
    linear1: Linear
    linear2: Linear
    output_time: int = static_field(default=10)
    method: str = static_field(default="euler")

    @staticmethod
    def create(key, func, input_channels: int, hidden_channels: int,
               output_channels: int, output_time: int = 10,
               method: str = "euler", dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return NeuralSDEForecasting(
            func=func,
            initial_network=Linear.create(k1, input_channels,
                                          hidden_channels, dtype=dtype),
            linear1=Linear.create(k2, hidden_channels, hidden_channels,
                                  dtype=dtype),
            linear2=Linear.create(k3, hidden_channels, output_channels,
                                  dtype=dtype),
            output_time=output_time,
            method=method,
        )

    def __call__(self, times, coeffs, *, key, dt=None, method=None, bm=None):
        path = CubicPath(coeffs, times)
        func = self.func.bind(path)
        y0 = self.initial_network(path.evaluate(jnp.asarray(times)[0]))
        dt = resolve_dt(times) if dt is None else dt
        zs = solve_dispatch(func, path, times, y0, key=key, dt=dt,
                            method=method or self.method, bm=bm)
        z = jnp.moveaxis(zs, 0, 1)                         # [B, L, H]
        z = z[:, -self.output_time:, :]
        h = jax.nn.relu(self.linear1(z))
        return self.linear2(h)


@module
class NDEModel(Module):
    """Tutorial wrapper: initial linear -> sdeint(euler, dt=0.05) ->
    per-step linear decoder (tutorial notebooks cell 7)."""

    func: Module
    initial: Linear
    decoder: Linear
    dt: float = static_field(default=0.05)
    method: str = static_field(default="euler")

    @staticmethod
    def create(key, input_dim: int, hidden_dim: int, output_dim: int,
               num_layers: int, vector_field=None, activation: str =
               "lipswish", dt: float = 0.05, method: str = "euler",
               dtype=jnp.float32) -> "NDEModel":
        k1, k2, k3 = jax.random.split(key, 3)
        func = vector_field.create(k1, input_dim, hidden_dim, hidden_dim,
                                   num_layers, activation, dtype=dtype)
        return NDEModel(
            func=func,
            initial=Linear.create(k2, input_dim, hidden_dim, dtype=dtype),
            decoder=Linear.create(k3, hidden_dim, output_dim, dtype=dtype),
            dt=dt,
            method=method,
        )

    def __call__(self, coeffs, times, *, key, bm=None):
        path = CubicPath(coeffs, times)
        func = self.func.bind(path)
        y0 = self.initial(path.evaluate(jnp.asarray(times)[0]))
        zs = sdeint(func.f, func.g, y0, times, key=key, dt=self.dt,
                    method=self.method, bm=bm)
        return self.decoder(jnp.moveaxis(zs, 0, 1))
