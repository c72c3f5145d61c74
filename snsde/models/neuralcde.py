"""Neural CDE family: vector fields + terminal/stream wrappers.

Rebuilds:
  * `FinalTanh`, `SingleHiddenLayer`, `GRU_ODE` vector fields
    (/root/reference/torch-ists/torch_ists/diff_module/NCDE/vector_fields.py)
  * `NeuralCDE` terminal wrapper
    (/root/reference/benchmark_classification/models/metamodel.py) and the
    stream variant (diff_module/NCDE/ncde_model.py:14-170)
  * control types: hermite/natural cubic (CubicPath), linear, rectilinear
    (`neuralcde-l/-r/-c/-h`, torch-ists/_layer.py:163-213)

CDE dynamics dz = f(z) dX(t) integrate through ops.solve.cdeint (CDE→ODE
reduction + fixed-grid RK4 by default, the reference's rk4/step_size
policy at models/metamodel.py:109-118).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import Module, module, static_field
from ..nn.layers import Linear
from ..ops.interp import CubicPath, LinearPath
from ..ops.solve import cdeint
from .neuralsde import ReadoutHead, resolve_dt

__all__ = ["FinalTanh", "SingleHiddenLayer", "GRUODEField", "NeuralCDE",
           "NeuralCDEStream", "cde_solve_dispatch"]


def _fused_cde_pays(func, method="rk4"):
    """Measured perf gate for the single-model fused CDE dispatch.

    Round-5 fidelity-matched crossover (BENCH_GATE_R5.json — the scan
    arm runs at the library-default HIGHEST precision since the r5 pin;
    both fused regimes measured against it): the kernel's one-hot MXU
    expand/reduce contraction scales with the input width C, and its
    in-kernel dot cost doubles from bf16x3 to exact-f32 (HIGHEST =
    bf16x6 passes), so the two regimes gate differently:

      * bf16x3 (production, SNSDE_FUSED_MATMUL=bf16x3): wins through
        C=16 (c6 1.44x, c12 1.36x, c16 1.07x), even at C=20 (0.98x),
        loses at C=35 (0.77x) -> MAX_C default 16.
      * exact-f32 (library default): loses at every measured width
        (c6 0.93x, c12 0.76x, c20 0.54x) -> no default dispatch; the
        scan path at HIGHEST is both faster and equally exact.

    SNSDE_FUSED_CDE_MAX_C overrides either default (0 disables the
    gate, i.e. always fused). The GRU-ODE field kind stays opt-in via
    SNSDE_FUSED_GRUODE=1. The lane-PACKED multi-model path gates
    separately (kernels/multi.py:packed_cde_pays)."""
    import os as _os

    from ..kernels.fused_cde import _field_kind
    from ..kernels.fused_em import _mm_mode

    kind = _field_kind(func)
    if kind is not None and kind[0] == "gruode":
        return _os.environ.get("SNSDE_FUSED_GRUODE", "0") == "1"
    env = _os.environ.get("SNSDE_FUSED_CDE_MAX_C")
    if env is not None:
        max_c = int(env)
        return max_c <= 0 or func.input_channels <= max_c
    if not _mm_mode():
        # exact-f32 kernels: scan-HIGHEST wins at every rk4 width; the
        # cheaper euler tableau still clears it at narrow C
        # (uea_euler C=6: 1.11x) — keep that one dispatch
        return method == "euler" and func.input_channels <= 6
    return func.input_channels <= 16


def cde_solve_dispatch(path, func, z0, ts, *, dt, method,
                       use_fused: bool = True):
    """Shared CDE solver dispatch: the fused Pallas CDE kernel when the
    bound (field, method) supports it (FinalTanh/SingleHiddenLayer on any
    explicit tableau incl. the reference's rk4 default; TPU only),
    otherwise the generic scan cdeint. SNSDE_NO_FUSED=1 forces the scan
    path (perf A/Bs, debugging); SNSDE_FUSED_CDE=0 disables just the CDE
    kernel. Default ON: the round-3b parity failure was root-caused to
    Mosaic's bf16-rounded DEFAULT dot precision and fixed by pinning
    exact-f32 dots (round 4; hardware suite green, full-solve divergence
    <= 7.6e-6 vs the scan path)."""
    if os.environ.get("SNSDE_NO_FUSED", "0") == "1":
        use_fused = False
    if os.environ.get("SNSDE_FUSED_CDE", "1") == "0":
        use_fused = False
    if (use_fused and jax.default_backend() == "tpu"
            and hasattr(path, "derivative_grid")):
        from ..kernels.fused_cde import fused_cde_solve, supports_fused_cde

        if supports_fused_cde(func, method) and _fused_cde_pays(
                func, method):
            return fused_cde_solve(func, path, ts, z0, dt=dt, method=method)
    if getattr(func, "precision_sensitive", False):
        # GRU-ODE NaNs at iter 1 on v5e under the platform-default bf16
        # operand rounding (its z-feedback through the gate matmuls
        # amplifies rounding; round-4 tools/probe_gruode_nan.py — clean
        # convergence at exact f32). Pin the scan solve to exact dots;
        # the fused kernel pins its gruode kind the same way.
        with jax.default_matmul_precision("highest"):
            return cdeint(path, func, z0, ts, dt=dt, method=method)
    return cdeint(path, func, z0, ts, dt=dt, method=method)


@module
class FinalTanh(Module):
    """z -> relu-MLP -> [H*C] matrix, tanh at the end (the canonical NCDE
    vector field)."""

    linear_in: Linear
    linears: Tuple[Linear, ...]
    linear_out: Linear
    input_channels: int = static_field(default=1)
    hidden_channels: int = static_field(default=1)

    @staticmethod
    def create(key, input_channels, hidden_channels, hidden_hidden_channels,
               num_hidden_layers, dtype=jnp.float32):
        ks = jax.random.split(key, num_hidden_layers + 2)
        return FinalTanh(
            linear_in=Linear.create(ks[0], hidden_channels,
                                    hidden_hidden_channels, dtype=dtype),
            linears=tuple(
                Linear.create(ks[i + 1], hidden_hidden_channels,
                              hidden_hidden_channels, dtype=dtype)
                for i in range(num_hidden_layers - 1)
            ),
            linear_out=Linear.create(
                ks[-1], hidden_hidden_channels,
                input_channels * hidden_channels, dtype=dtype,
            ),
            input_channels=input_channels,
            hidden_channels=hidden_channels,
        )

    def __call__(self, t, z):
        h = jax.nn.relu(self.linear_in(z))
        for lin in self.linears:
            h = jax.nn.relu(lin(h))
        out = jnp.tanh(self.linear_out(h))
        return out.reshape(z.shape[:-1] + (self.hidden_channels,
                                           self.input_channels))


@module
class SingleHiddenLayer(Module):
    linear1: Linear
    linear2: Linear
    input_channels: int = static_field(default=1)
    hidden_channels: int = static_field(default=1)

    @staticmethod
    def create(key, input_channels, hidden_channels, hidden_hidden_channels,
               num_hidden_layers=1, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return SingleHiddenLayer(
            linear1=Linear.create(k1, hidden_channels,
                                  hidden_hidden_channels, dtype=dtype),
            linear2=Linear.create(
                k2, hidden_hidden_channels,
                input_channels * hidden_channels, dtype=dtype,
            ),
            input_channels=input_channels,
            hidden_channels=hidden_channels,
        )

    def __call__(self, t, z):
        h = jnp.tanh(self.linear1(z))
        out = jnp.tanh(self.linear2(h))
        return out.reshape(z.shape[:-1] + (self.hidden_channels,
                                           self.input_channels))


@module
class GRUODEField(Module):
    """GRU-ODE vector field: continuous GRU gating producing a [H, C]
    update matrix via outer structure (gruode baseline,
    reference diff_module/NCDE/vector_fields.py GRU_ODE)."""

    W_r: Linear
    W_z: Linear
    W_h: Linear
    input_channels: int = static_field(default=1)
    hidden_channels: int = static_field(default=1)
    # z feeds back through the three gate matmuls every solver stage;
    # operand rounding amplifies and the scan path NaNs on TPU at the
    # platform-default matmul precision (round-4 probe_gruode_nan.py).
    # cde_solve_dispatch pins solves over this field to exact-f32 dots.
    precision_sensitive = True

    @staticmethod
    def create(key, input_channels, hidden_channels, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return GRUODEField(
            W_r=Linear.create(k1, hidden_channels,
                              input_channels * hidden_channels, dtype=dtype),
            W_z=Linear.create(k2, hidden_channels,
                              input_channels * hidden_channels, dtype=dtype),
            W_h=Linear.create(k3, hidden_channels,
                              input_channels * hidden_channels, dtype=dtype),
            input_channels=input_channels,
            hidden_channels=hidden_channels,
        )

    def __call__(self, t, z):
        shape = z.shape[:-1] + (self.hidden_channels, self.input_channels)
        r = jax.nn.sigmoid(self.W_r(z)).reshape(shape)
        u = jax.nn.sigmoid(self.W_z(z)).reshape(shape)
        g = jnp.tanh(r * self.W_h(z).reshape(shape))
        return (1.0 - u) * (g - z[..., :, None])


def _build_path(coeffs, times, control: str):
    if control in ("cubic", "hermite", "natural"):
        return CubicPath(coeffs, times)
    if control == "linear":
        return LinearPath(times=jnp.asarray(times), values=coeffs)
    raise ValueError(f"unknown control type {control!r}")


@module
class NeuralCDE(Module):
    """Terminal-readout Neural CDE (classification twin of NeuralSDE)."""

    func: Module
    initial_network: Linear
    readout: ReadoutHead
    initial: bool = static_field(default=True)
    method: str = static_field(default="rk4")
    control: str = static_field(default="cubic")

    @staticmethod
    def create(key, func, input_channels, hidden_channels, output_channels,
               initial=True, method="rk4", control="cubic",
               dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return NeuralCDE(
            func=func,
            initial_network=Linear.create(k1, input_channels,
                                          hidden_channels, dtype=dtype),
            readout=ReadoutHead.create(k2, hidden_channels, output_channels,
                                       dtype=dtype),
            initial=initial,
            method=method,
            control=control,
        )

    def __call__(self, times, coeffs, final_index, *, key=None, z0=None,
                 stream: bool = False, train: bool = False, dt=None,
                 method=None):
        path = _build_path(coeffs, times, self.control)
        if z0 is None:
            if not self.initial:
                raise ValueError("expected z0 (initial=False)")
            z0 = self.initial_network(path.evaluate(jnp.asarray(times)[0]))
        # reference rk4 step policy: step_size = min Δt
        dt = resolve_dt(times, floor=0.0) if dt is None else dt
        zs = cde_solve_dispatch(path, self.func, z0, times, dt=dt,
                                method=method or self.method)  # [L, B, H]
        if stream:
            z = jnp.moveaxis(zs, 0, -2)
        else:
            idx = jnp.asarray(final_index)
            z = jnp.take_along_axis(
                jnp.moveaxis(zs, 0, 1), idx[:, None, None], axis=1
            )[:, 0]
        kdrop = key if key is not None else jax.random.PRNGKey(0)
        pred, readout = self.readout(z, key=kdrop, train=train)
        return pred, self.replace(readout=readout)


@module
class NeuralCDEStream(Module):
    """Stream variant: whole trajectory + per-step linear readout
    (diff_module/NCDE/ncde_model.py)."""

    func: Module
    initial_network: Linear
    linear: Linear
    initial: bool = static_field(default=True)
    method: str = static_field(default="rk4")
    control: str = static_field(default="cubic")

    @staticmethod
    def create(key, func, input_channels, hidden_channels, output_channels,
               initial=True, method="rk4", control="cubic",
               dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return NeuralCDEStream(
            func=func,
            initial_network=Linear.create(k1, input_channels,
                                          hidden_channels, dtype=dtype),
            linear=Linear.create(k2, hidden_channels, output_channels,
                                 dtype=dtype),
            initial=initial,
            method=method,
            control=control,
        )

    def __call__(self, times, coeffs, *, dt=None, method=None, **kw):
        path = _build_path(coeffs, times, self.control)
        if self.initial:
            z0 = self.initial_network(path.evaluate(jnp.asarray(times)[0]))
        else:
            B = (path.a if hasattr(path, "a") else path.values).shape[0]
            z0 = jnp.zeros((B, self.linear.in_features))
        dt = resolve_dt(times, floor=0.0) if dt is None else dt
        zs = cde_solve_dispatch(path, self.func, z0, times, dt=dt,
                                method=method or self.method)
        z = jnp.moveaxis(zs, 0, 1)
        return self.linear(z), z
