"""ANCDE, EXIT, LEAP, NeuralRDE — the diff-module long tail.

Rebuilds:
  * ANCDE (/root/reference/torch-ists/torch_ists/diff_module/ANCDE/
    ancde_model.py:70-242 + controldiffeq/cdeint_module.py): two-phase
    attentive CDE — a bottom CDE produces a per-step attention path, a
    hard-sigmoid straight-through binarizer (or soft sigmoid) gates the
    control, and a top CDE runs over the attention-modulated path.
    TPU-first redesign: instead of the reference's product-rule stepping
    with an on-disk latent cache (`np.load(self.file)` inside forward!),
    the gated path Y(t)=a(t)⊙X(t) is re-fit with differentiable hermite
    coefficients and integrated as an ordinary CDE — same semantics, one
    compiled graph, no filesystem side channel.
  * EXIT (/root/reference/torch-ists/torch_ists/diff_module/EXIT/
    exit_model.py:15-178 + kinetic_wrapper_class.py): encoder CDE -> h0,
    then a coupled ODE-CDE — dx̂ = f_ode(x̂)dt, dh = g(h) dx̂ — with
    kinetic-energy and Jacobian-Frobenius (Hutchinson) regularization
    accumulated in augmented state channels.
  * LEAP (/root/reference/benchmark_forecasting/models/metamodel.py:252-593
    — the only surviving implementation; the torch-ists module dir is
    missing from the snapshot, SURVEY.md §2.8): learnable-path CDE — a
    mapping MLP transforms the control path, the CDE runs over the learned
    path, and a Hutchinson divergence estimate of the mapping is returned
    as an auxiliary loss.
  * NeuralRDE (torch-ists/_layer.py:214: logsig_windows depth 1-3, window
    4): CDE over the log-signature feature path (ops.logsig).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import Module, module, static_field
from ..nn.layers import Linear
from ..ops.interp import CubicPath, hermite_cubic_coeffs
from ..ops.logsig import logsig_windows, logsignature_channels
from ..ops.solve import odeint
from .neuralcde import FinalTanh, cde_solve_dispatch
from .neuralsde import resolve_dt

__all__ = ["ANCDE", "EXIT", "LEAP", "NeuralRDE", "hard_sigmoid_ste"]


def hard_sigmoid_ste(x):
    """Hard sigmoid with straight-through rounding: forward = round(
    clip(0.2x+0.5)), backward = identity through the soft surrogate
    (reference Hardsigmoid + RoundFunctionST, ancde_model.py:15-40)."""
    soft = jnp.clip(0.2 * x + 0.5, 0.0, 1.0)
    hard = jnp.round(soft)
    return soft + jax.lax.stop_gradient(hard - soft)


@module
class ANCDE(Module):
    func_f: Module            # bottom vector field (input-dim state)
    func_g: Module            # top vector field (hidden state)
    initial_network: Linear
    feature_extractor: Linear
    linear: Linear
    time_attention: Linear
    soft: bool = static_field(default=True)
    timewise: bool = static_field(default=True)
    method: str = static_field(default="rk4")

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               attention_channel=None, soft=True, timewise=True,
               hidden_hidden=None, num_hidden_layers=1, method="rk4",
               dtype=jnp.float32):
        hh = hidden_hidden or hidden_channels
        ks = jax.random.split(key, 6)
        func_f = FinalTanh.create(ks[0], input_channels, input_channels,
                                  hh, num_hidden_layers, dtype)
        func_g = FinalTanh.create(ks[1], input_channels, hidden_channels,
                                  hh, num_hidden_layers, dtype)
        return ANCDE(
            func_f=func_f,
            func_g=func_g,
            initial_network=Linear.create(ks[2], input_channels,
                                          input_channels, dtype=dtype),
            feature_extractor=Linear.create(ks[3], input_channels,
                                            hidden_channels, dtype=dtype),
            linear=Linear.create(ks[4], hidden_channels, output_channels,
                                 dtype=dtype),
            time_attention=Linear.create(ks[5], input_channels, 1,
                                         dtype=dtype),
            soft=soft,
            timewise=timewise,
            method=method,
        )

    def attention_path(self, times, coeffs, *, slope=None):
        """The bottom-CDE attention gate a(t) in (0,1) (soft) or {0,1}
        (hard STE) — [B, L, 1] (timewise) or [B, L, C]. Exposed for
        inspection, mirroring the reference's attention visualization."""
        path = CubicPath(coeffs, times)
        t_arr = jnp.asarray(times)
        z0 = self.initial_network(path.evaluate(t_arr[0]))
        dt = resolve_dt(times, floor=0.0)
        a_stream = cde_solve_dispatch(path, self.func_f, z0, times,
                                      dt=dt, method=self.method)  # [L,B,C]
        a_stream = jnp.moveaxis(a_stream, 0, 1)          # [B, L, C]
        if self.timewise:
            att = self.time_attention(a_stream)          # [B, L, 1]
        else:
            att = a_stream                               # [B, L, C]
        if self.soft:
            return jax.nn.sigmoid(att)
        s = 1.0 if slope is None else slope
        return hard_sigmoid_ste(s * att)

    def __call__(self, times, coeffs, final_index=None, *, slope=None,
                 key=None, **kw):
        path = CubicPath(coeffs, times)
        t_arr = jnp.asarray(times)
        dt = resolve_dt(times, floor=0.0)
        att = self.attention_path(times, coeffs, slope=slope)

        # top CDE over the attention-gated path Y(t) = a(t) ⊙ X(t)
        X_grid = jnp.moveaxis(jax.vmap(path.evaluate)(t_arr), 0, 1)
        Y = att * X_grid                                 # [B, L, C]
        y_coeffs = hermite_cubic_coeffs(t_arr, Y)
        Y_path = CubicPath(y_coeffs, times)
        y0 = self.feature_extractor(Y[:, 0])
        z_t = cde_solve_dispatch(Y_path, self.func_g, y0, times, dt=dt,
                                 method=self.method)
        hn = jnp.moveaxis(z_t, 0, 1)
        return self.linear(hn), hn


@module
class EXIT(Module):
    """Encoder CDE -> h0; coupled ODE-CDE with kinetic/Jacobian
    regularization. Returns (out_stream, hidden_stream); the regularizer is
    exposed as `.last_reg` aux when called with return_reg=True."""

    enc_func: Module
    ode_f1: Linear
    ode_f2: Linear
    dec_func: Module
    initial_network: Linear
    embed_x: Linear
    linear: Linear
    method: str = static_field(default="rk4")

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               hidden_hidden=None, num_hidden_layers=1, method="rk4",
               dtype=jnp.float32):
        hh = hidden_hidden or hidden_channels
        ks = jax.random.split(key, 7)
        return EXIT(
            enc_func=FinalTanh.create(ks[0], input_channels,
                                      hidden_channels, hh,
                                      num_hidden_layers, dtype),
            ode_f1=Linear.create(ks[1], input_channels, hh, dtype=dtype),
            ode_f2=Linear.create(ks[2], hh, input_channels, dtype=dtype),
            dec_func=FinalTanh.create(ks[3], input_channels,
                                      hidden_channels, hh,
                                      num_hidden_layers, dtype),
            initial_network=Linear.create(ks[4], input_channels,
                                          hidden_channels, dtype=dtype),
            embed_x=Linear.create(ks[5], hidden_channels, input_channels,
                                  dtype=dtype),
            linear=Linear.create(ks[6], hidden_channels, output_channels,
                                 dtype=dtype),
            method=method,
        )

    def _f_ode(self, x):
        return self.ode_f2(jnp.tanh(self.ode_f1(x)))

    def __call__(self, times, coeffs, final_index=None, *, key=None,
                 return_reg: bool = False, **kw):
        path = CubicPath(coeffs, times)
        t_arr = jnp.asarray(times)
        dt = resolve_dt(times, floor=0.0)

        # encoder CDE over the raw control
        z0 = self.initial_network(path.evaluate(t_arr[0]))
        enc = cde_solve_dispatch(path, self.enc_func, z0, times, dt=dt,
                                 method=self.method)
        h0 = enc[-1]                                  # [B, H]

        # coupled ODE-CDE with regularizer accumulators:
        # state = [x_hat (C) | h (H) | kinetic (1) | jac (1)]
        x0 = self.embed_x(h0)
        B = x0.shape[0]
        C = x0.shape[-1]
        if key is None:
            key = jax.random.PRNGKey(0)
        eps = jax.random.normal(key, x0.shape, x0.dtype)  # Hutchinson probe

        def joint_f(t, state):
            x_hat = state[..., :C]
            h = state[..., C:-2]
            dx = self._f_ode(x_hat)
            gh = self.dec_func(t, h)                  # [B, H, C]
            dh = jnp.einsum("...hc,...c->...h", gh, dx)
            kinetic = jnp.sum(dx * dx, axis=-1, keepdims=True)
            _, jvp_out = jax.jvp(self._f_ode, (x_hat,), (eps,))
            jac = jnp.sum(jvp_out * jvp_out, axis=-1, keepdims=True)
            return jnp.concatenate([dx, dh, kinetic, jac], axis=-1)

        state0 = jnp.concatenate(
            [x0, h0, jnp.zeros((B, 2), x0.dtype)], axis=-1
        )
        zs = odeint(joint_f, state0, times, dt=dt, method=self.method)
        hn = jnp.moveaxis(zs[..., C:-2], 0, 1)        # [B, L, H]
        reg = jnp.mean(zs[-1, :, -2] + zs[-1, :, -1])
        out = self.linear(hn)
        if return_reg:
            return out, hn, reg
        return out, hn


@module
class LEAP(Module):
    """Learnable-path CDE with Hutchinson divergence regularizer."""

    mapping1: Linear
    mapping2: Linear
    func: Module
    initial_network: Linear
    linear: Linear
    method: str = static_field(default="rk4")

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               hidden_hidden=None, num_hidden_layers=1, method="rk4",
               dtype=jnp.float32):
        hh = hidden_hidden or hidden_channels
        ks = jax.random.split(key, 5)
        return LEAP(
            mapping1=Linear.create(ks[0], input_channels, hh, dtype=dtype),
            mapping2=Linear.create(ks[1], hh, input_channels, dtype=dtype),
            func=FinalTanh.create(ks[2], input_channels, hidden_channels,
                                  hh, num_hidden_layers, dtype),
            initial_network=Linear.create(ks[3], input_channels,
                                          hidden_channels, dtype=dtype),
            linear=Linear.create(ks[4], hidden_channels, output_channels,
                                 dtype=dtype),
            method=method,
        )

    def _map(self, x):
        return x + self.mapping2(jnp.tanh(self.mapping1(x)))

    def __call__(self, times, coeffs, final_index=None, *, key=None, **kw):
        path = CubicPath(coeffs, times)
        t_arr = jnp.asarray(times)
        X_grid = jnp.moveaxis(jax.vmap(path.evaluate)(t_arr), 0, 1)
        Z = self._map(X_grid)                          # learned path
        z_coeffs = hermite_cubic_coeffs(t_arr, Z)
        Z_path = CubicPath(z_coeffs, times)
        z0 = self.initial_network(Z[:, 0])
        dt = resolve_dt(times, floor=0.0)
        zs = cde_solve_dispatch(Z_path, self.func, z0, times, dt=dt,
                                method=self.method)
        hn = jnp.moveaxis(zs, 0, 1)

        # Hutchinson divergence estimate of the mapping (regularizer)
        if key is None:
            key = jax.random.PRNGKey(0)
        eps = jax.random.normal(key, X_grid.shape, X_grid.dtype)
        _, jvp_out = jax.jvp(self._map, (X_grid,), (eps,))
        div_est = jnp.mean(jnp.sum(jvp_out * eps, axis=-1))
        loss = div_est**2
        return self.linear(hn), hn, loss


@module
class NeuralRDE(Module):
    """Neural RDE: CDE over log-signature windows (depth 1-3, window 4)."""

    func: Module
    initial_network: Linear
    linear: Linear
    depth: int = static_field(default=2)
    window: int = static_field(default=4)
    method: str = static_field(default="rk4")

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               depth=2, window=4, hidden_hidden=None, num_hidden_layers=1,
               method="rk4", dtype=jnp.float32):
        hh = hidden_hidden or hidden_channels
        sig_ch = logsignature_channels(input_channels, depth)
        ks = jax.random.split(key, 3)
        return NeuralRDE(
            func=FinalTanh.create(ks[0], sig_ch, hidden_channels, hh,
                                  num_hidden_layers, dtype),
            initial_network=Linear.create(ks[1], sig_ch, hidden_channels,
                                          dtype=dtype),
            linear=Linear.create(ks[2], hidden_channels, output_channels,
                                 dtype=dtype),
            depth=depth,
            window=window,
            method=method,
        )

    def __call__(self, x_values, times, final_index=None, *, key=None,
                 **kw):
        """x_values: the raw [B, L, C] stream (the logsig transform happens
        here, matching torchcde.logsig_windows usage)."""
        new_times, feats = logsig_windows(x_values, self.depth, self.window,
                                          times=times)
        t_np = np.asarray(jax.device_get(new_times), np.float32)
        coeffs = hermite_cubic_coeffs(jnp.asarray(new_times), feats)
        path = CubicPath(coeffs, new_times)
        z0 = self.initial_network(feats[:, 0])
        dt = resolve_dt(t_np, floor=0.0)
        zs = cde_solve_dispatch(path, self.func, z0, t_np, dt=dt,
                                method=self.method)
        hn = jnp.moveaxis(zs, 0, 1)                    # [B, n_w+1, H]
        return self.linear(hn), hn
