"""Neural Flows: invertible time-indexed transformations + NFE wrappers.

Rebuilds /root/reference/torch-ists/torch_ists/diff_module/NFE/
{flow.py, gru.py, nfe_model.py} (the stribor-based CouplingFlow/ResNetFlow/
GRUFlow and the NeuralFlow / NeuralFlowCDE / NeuralMixture /
NeuralControlledFlow wrappers with input_option {n,x,y,z} × flow_option
{n,r,g,c}).

Flow layers follow the Neural Flows paper (Biloš et al. 2021) construction
with an identity-at-t=0 time net (TimeTanh: φ(t) = tanh(W t), φ(0)=0):
  * coupling:  x_b <- x_b * exp(s(x_a,t)·φ(t)) + u(x_a,t)·φ(t)
  * resnet:    x <- x + φ(t)·tanh(net([x, t]))
  * gru flow:  x <- x + φ(t)·z·(u − x) with α=2/5, β=4/5 bounds
    (gru.py:76-88; spectral norm omitted — the α/β contraction constants
    carry the invertibility argument at these widths).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Module, module, static_field
from ..nn.layers import Linear
from ..ops.interp import CubicPath, hermite_cubic_coeffs
from .neuralcde import cde_solve_dispatch

__all__ = ["TimeTanh", "CouplingFlowLayer", "ResNetFlowLayer",
           "GRUFlowBlock", "NeuralFlow", "NeuralFlowCDE", "NeuralMixture",
           "NeuralControlledFlow"]


@module
class TimeTanh(Module):
    lin: Linear

    @staticmethod
    def create(key, out_dim, dtype=jnp.float32):
        # bias-free (stribor TimeTanh): φ(0) = 0 exactly, which is what
        # makes every flow layer the identity at t=0 — the defining flow
        # property F(x, 0) = x.
        return TimeTanh(
            lin=Linear.create(key, 1, out_dim, use_bias=False, dtype=dtype)
        )

    def __call__(self, t):
        return jnp.tanh(self.lin(t))


@module
class CouplingFlowLayer(Module):
    net1: Linear
    net2: Linear
    time_net: TimeTanh
    parity: int = static_field(default=0)

    @staticmethod
    def create(key, dim, hidden, parity, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return CouplingFlowLayer(
            net1=Linear.create(k1, dim + 1, hidden, dtype=dtype),
            net2=Linear.create(k2, hidden, 2 * dim, dtype=dtype),
            time_net=TimeTanh.create(k3, 2 * dim, dtype),
            parity=parity,
        )

    def __call__(self, x, t):
        D = x.shape[-1]
        idx = jnp.arange(D)
        mask = ((idx % 2) == self.parity).astype(x.dtype)
        if D == 1:
            mask = jnp.zeros_like(mask)  # 'none' mask: transform everything
        xa = x * mask
        h = jax.nn.relu(self.net1(jnp.concatenate([xa, t], axis=-1)))
        su = self.net2(h) * self.time_net(t)
        s, u = su[..., :D], su[..., D:]
        xb = x * jnp.exp(s * (1 - mask)) + u * (1 - mask)
        return xa + xb * (1 - mask)


@module
class ResNetFlowLayer(Module):
    net1: Linear
    net2: Linear
    time_net: TimeTanh

    @staticmethod
    def create(key, dim, hidden, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return ResNetFlowLayer(
            net1=Linear.create(k1, dim + 1, hidden, dtype=dtype),
            net2=Linear.create(k2, hidden, dim, dtype=dtype),
            time_net=TimeTanh.create(k3, dim, dtype),
        )

    def __call__(self, x, t):
        h = jax.nn.relu(self.net1(jnp.concatenate([x, t], axis=-1)))
        return x + self.time_net(t) * jnp.tanh(self.net2(h))


@module
class GRUFlowBlock(Module):
    lin_hh: Linear
    lin_hz: Linear
    lin_hr: Linear
    time_net: TimeTanh

    @staticmethod
    def create(key, dim, dtype=jnp.float32):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return GRUFlowBlock(
            lin_hh=Linear.create(k1, dim + 1, dim, dtype=dtype),
            lin_hz=Linear.create(k2, dim + 1, dim, dtype=dtype),
            lin_hr=Linear.create(k3, dim + 1, dim, dtype=dtype),
            time_net=TimeTanh.create(k4, dim, dtype),
        )

    def __call__(self, h, t):
        inp = jnp.concatenate([h, t], axis=-1)
        r = 0.8 * jax.nn.sigmoid(self.lin_hr(inp))
        z = 0.4 * jax.nn.sigmoid(self.lin_hz(inp))
        u = jnp.tanh(self.lin_hh(jnp.concatenate([r * h, t], axis=-1)))
        return h + self.time_net(t) * (z * (u - h))


def _make_flow(key, kind: str, dim: int, hidden: int, n_layers: int,
               dtype=jnp.float32):
    ks = jax.random.split(key, max(n_layers, 1))
    if kind == "c":
        return tuple(
            CouplingFlowLayer.create(ks[i], dim, hidden, i % 2, dtype)
            for i in range(n_layers)
        )
    if kind == "r":
        return tuple(
            ResNetFlowLayer.create(ks[i], dim, hidden, dtype)
            for i in range(n_layers)
        )
    if kind == "g":
        return tuple(
            GRUFlowBlock.create(ks[i], dim, dtype) for i in range(n_layers)
        )
    raise ValueError(kind)


def _apply_flow(layers, x, t):
    for layer in layers:
        x = layer(x, t)
    return x


@module
class _FlowBase(Module):
    initial_flow: Linear
    initial_control: Linear
    emb: Optional[Linear]
    flow_layers: Tuple[Module, ...]
    mlp_in: Optional[Linear]
    mlp_layers: Tuple[Linear, ...]
    head: Linear
    input_option: str = static_field(default="z")
    flow_option: str = static_field(default="c")


@module
class NeuralFlow(_FlowBase):
    """Pointwise flow over the stream (no solver): embed [t, x] and control
    evals, mix per input_option, push through the flow network, readout
    (nfe_model.py:19-86)."""

    @staticmethod
    def create(key, input_channels, hidden_channels, num_hidden_layers,
               output_channels, input_option="z", flow_option="c",
               dtype=jnp.float32):
        ks = jax.random.split(key, 8 + num_hidden_layers)
        H = hidden_channels
        flow_layers = (
            _make_flow(ks[0], flow_option, H, H, 1, dtype)
            if flow_option in "rgc"
            else tuple(
                Linear.create(ks[0 + i], H, H, dtype=dtype)
                for i in range(max(num_hidden_layers, 1))
            )
        )
        return NeuralFlow(
            initial_flow=Linear.create(ks[-1], input_channels, H,
                                       dtype=dtype),
            initial_control=Linear.create(ks[-2], input_channels, H,
                                          dtype=dtype),
            emb=Linear.create(ks[-3], 2 * H, H, dtype=dtype),
            flow_layers=flow_layers,
            mlp_in=None,
            mlp_layers=tuple(
                Linear.create(ks[1 + i], H, H, dtype=dtype)
                for i in range(num_hidden_layers - 1)
            ),
            head=Linear.create(ks[-4], H, output_channels, dtype=dtype),
            input_option=input_option,
            flow_option=flow_option,
        )

    def __call__(self, x, seq_ts, seq_mask, coeffs, times, **kw):
        """x [B,L,D], seq_ts [B,L], seq_mask [B,L,D]; coeffs over
        [t ‖ x] channels."""
        tcol = seq_ts[..., None]
        z_flow = self.initial_flow(jnp.concatenate([tcol, x], axis=-1))
        path = CubicPath(coeffs, times)
        xx = jax.vmap(path.evaluate)(jnp.asarray(times))   # [L, B, C]
        z_x = self.initial_control(jnp.moveaxis(xx, 0, 1))

        io = self.input_option
        if io in ("n", "x"):
            z = z_flow
        elif io == "y":
            z = z_x
        else:
            z = self.emb(jnp.concatenate([z_flow, z_x], axis=-1))

        if self.flow_option == "n":
            z = jax.nn.relu(z)
            for lin in self.flow_layers:
                z = jax.nn.relu(lin(z))
        else:
            z = _apply_flow(self.flow_layers, z, tcol)

        z = jax.nn.relu(z)
        for lin in self.mlp_layers:
            z = jax.nn.relu(lin(z))
        return self.head(z), z


@module
class NeuralFlowCDE(_FlowBase):
    """Flow-transform the input stream, re-fit hermite coeffs on the
    transformed stream (differentiably), then solve a CDE over it
    (nfe_model.py:89-196)."""

    func: Module = None
    method: str = static_field(default="rk4")

    @staticmethod
    def create(key, func, input_channels, hidden_channels, num_hidden_layers,
               output_channels, input_option="z", flow_option="c",
               dtype=jnp.float32):
        ks = jax.random.split(key, 8 + num_hidden_layers)
        C, H = input_channels, hidden_channels
        flow_layers = (
            _make_flow(ks[0], flow_option, C, H, 1, dtype)
            if flow_option in "rgc"
            else (
                Linear.create(ks[0], C, H, dtype=dtype),
            ) + tuple(
                Linear.create(ks[1 + i], H, H, dtype=dtype)
                for i in range(num_hidden_layers - 1)
            ) + (Linear.create(ks[num_hidden_layers], H, C, dtype=dtype),)
        )
        return NeuralFlowCDE(
            func=func,
            initial_flow=Linear.create(ks[-1], C, C, dtype=dtype),
            initial_control=Linear.create(ks[-2], C, H, dtype=dtype),
            emb=Linear.create(ks[-3], 2 * C, C, dtype=dtype),
            flow_layers=flow_layers,
            mlp_in=None,
            mlp_layers=(
                Linear.create(ks[-5], H, H, dtype=dtype),
            ),
            head=Linear.create(ks[-4], H, output_channels, dtype=dtype),
            input_option=input_option,
            flow_option=flow_option,
        )

    def __call__(self, x, seq_ts, seq_mask, coeffs, times, method=None,
                 **kw):
        tcol = seq_ts[..., None]
        path = CubicPath(coeffs, times)
        io = self.input_option
        if io in ("n", "x"):
            z_flow = self.initial_flow(jnp.concatenate([tcol, x], axis=-1)[
                ..., : self.initial_flow.in_features])
        elif io == "y":
            xx = jnp.moveaxis(
                jax.vmap(path.evaluate)(jnp.asarray(times)), 0, 1
            )
            z_flow = self.initial_flow(xx)
        else:
            xx = jnp.moveaxis(
                jax.vmap(path.evaluate)(jnp.asarray(times)), 0, 1
            )
            cat = jnp.concatenate([tcol, x], axis=-1)
            z_flow = self.initial_flow(
                self.emb(jnp.concatenate([cat, xx], axis=-1))
            )

        if self.flow_option == "n":
            z = z_flow
            for lin in self.flow_layers[:-1]:
                z = jax.nn.relu(lin(z))
            z_flow = self.flow_layers[-1](z)
        else:
            z_flow = _apply_flow(self.flow_layers, z_flow, tcol)

        # re-fit hermite coeffs on the transformed stream (differentiable)
        new_coeffs = hermite_cubic_coeffs(jnp.asarray(times), z_flow)
        Z = CubicPath(new_coeffs, times)
        z0 = self.initial_control(Z.evaluate(jnp.asarray(times)[0]))
        from .neuralsde import resolve_dt

        dt = resolve_dt(times, floor=0.0)
        zs = cde_solve_dispatch(Z, self.func, z0, times, dt=dt,
                                method=method or self.method)
        zt = jnp.moveaxis(zs, 0, 1)
        h = jnp.tanh(zt)
        h = jax.nn.relu(self.mlp_layers[0](h))
        return self.head(h), zt


@module
class NeuralMixture(_FlowBase):
    """Run the flow branch and the CDE branch in parallel, mix their
    streams (nfe_model.py:199-...)."""

    func: Module = None
    mixture: Linear = None
    method: str = static_field(default="rk4")

    @staticmethod
    def create(key, func, input_channels, hidden_channels, num_hidden_layers,
               output_channels, input_option="z", flow_option="c",
               dtype=jnp.float32):
        ks = jax.random.split(key, 10)
        H = hidden_channels
        flow_layers = (
            _make_flow(ks[0], flow_option, H, H, 1, dtype)
            if flow_option in "rgc"
            else tuple(
                Linear.create(ks[0], H, H, dtype=dtype)
                for _ in range(max(num_hidden_layers, 1))
            )
        )
        return NeuralMixture(
            func=func,
            initial_flow=Linear.create(ks[1], input_channels, H,
                                       dtype=dtype),
            initial_control=Linear.create(ks[2], input_channels, H,
                                          dtype=dtype),
            emb=Linear.create(ks[3], 2 * H, H, dtype=dtype),
            mixture=Linear.create(ks[4], 2 * H, H, dtype=dtype),
            flow_layers=flow_layers,
            mlp_in=None,
            mlp_layers=(Linear.create(ks[5], H, H, dtype=dtype),),
            head=Linear.create(ks[6], H, output_channels, dtype=dtype),
            input_option=input_option,
            flow_option=flow_option,
        )

    def __call__(self, x, seq_ts, seq_mask, coeffs, times, method=None,
                 **kw):
        tcol = seq_ts[..., None]
        path = CubicPath(coeffs, times)
        z_flow = self.initial_flow(jnp.concatenate([tcol, x], axis=-1))
        xx = jnp.moveaxis(jax.vmap(path.evaluate)(jnp.asarray(times)), 0, 1)
        z_x = self.initial_control(xx)
        io = self.input_option
        if io in ("n", "x"):
            z = z_flow
        elif io == "y":
            z = z_x
        else:
            z = self.emb(jnp.concatenate([z_flow, z_x], axis=-1))
        if self.flow_option == "n":
            for lin in self.flow_layers:
                z = jax.nn.relu(lin(z))
        else:
            z = _apply_flow(self.flow_layers, z, tcol)
        z_flow = z

        z0 = self.initial_control(path.evaluate(jnp.asarray(times)[0]))
        from .neuralsde import resolve_dt

        dt = resolve_dt(times, floor=0.0)
        zs = cde_solve_dispatch(path, self.func, z0, times, dt=dt,
                                method=method or self.method)
        z_cde = jnp.moveaxis(zs, 0, 1)
        mixed = self.mixture(jnp.concatenate([z_flow, z_cde], axis=-1))
        h = jnp.tanh(mixed)
        h = jax.nn.relu(self.mlp_layers[0](h))
        return self.head(h), mixed


@module
class NeuralControlledFlow(_FlowBase):
    """CDE over the raw control path, flow applied to the CDE *output*
    stream (nfe_model.py:300-...)."""

    func: Module = None
    method: str = static_field(default="rk4")

    @staticmethod
    def create(key, func, input_channels, hidden_channels, num_hidden_layers,
               output_channels, input_option="z", flow_option="c",
               dtype=jnp.float32):
        ks = jax.random.split(key, 8)
        H = hidden_channels
        flow_layers = (
            _make_flow(ks[0], flow_option, H, H, 1, dtype)
            if flow_option in "rgc"
            else tuple(
                Linear.create(ks[0], H, H, dtype=dtype)
                for _ in range(max(num_hidden_layers, 1))
            )
        )
        return NeuralControlledFlow(
            func=func,
            initial_flow=Linear.create(ks[1], input_channels, H,
                                       dtype=dtype),
            initial_control=Linear.create(ks[2], input_channels, H,
                                          dtype=dtype),
            emb=None,
            flow_layers=flow_layers,
            mlp_in=None,
            mlp_layers=(Linear.create(ks[3], H, H, dtype=dtype),),
            head=Linear.create(ks[4], H, output_channels, dtype=dtype),
            input_option=input_option,
            flow_option=flow_option,
        )

    def __call__(self, x, seq_ts, seq_mask, coeffs, times, method=None,
                 **kw):
        path = CubicPath(coeffs, times)
        z0 = self.initial_control(path.evaluate(jnp.asarray(times)[0]))
        from .neuralsde import resolve_dt

        dt = resolve_dt(times, floor=0.0)
        zs = cde_solve_dispatch(path, self.func, z0, times, dt=dt,
                                method=method or self.method)
        z = jnp.moveaxis(zs, 0, 1)
        B, L = z.shape[:2]
        tcol = jnp.broadcast_to(
            jnp.asarray(times)[None, :, None], (B, L, 1)
        ).astype(z.dtype)
        if self.flow_option == "n":
            for lin in self.flow_layers:
                z = jax.nn.relu(lin(z))
        else:
            z = _apply_flow(self.flow_layers, z, tcol)
        h = jnp.tanh(z)
        h = jax.nn.relu(self.mlp_layers[0](h))
        return self.head(h), z
