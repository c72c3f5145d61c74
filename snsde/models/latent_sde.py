"""Latent SDE with Girsanov KL (variational SDE).

Rebuilds /root/reference/torch-ists/torch_ists/diff_module/NSDE/latent_sde.py:31-155:
posterior drift f (sin/cos-t MLP), shared constant diffusion g = sigma,
OU prior drift h = theta*(mu - y); the KL-rate channel is accumulated inside
the same solver scan via the augmented system
    f_aug = [f, 0.5*||(f - h)/g||^2],   g_aug = [g, 0]
and the total KL is KL(q(y0)||p(y0)) + logqp_path. Returns
(out, latent, logqp) like the reference forward (latent_sde.py:91-147).

TPU-native notes: no sdeint_adjoint — the scan is differentiated directly
(discretize-then-optimize with remat); the augmented state keeps everything
in one fused solver loop.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Buffer, Module, buffer, module, static_field
from ..nn.layers import Linear
from ..ops.interp import CubicPath
from ..ops.solve import sdeint
from .neuralsde import resolve_dt

__all__ = ["LatentSDE"]


def _stable_division(a, b, eps: float = 1e-7):
    b = jnp.where(jnp.abs(b) > eps, b, jnp.sign(b) * eps + (b == 0) * eps)
    return a / b


@module
class LatentSDE(Module):
    theta: Buffer
    mu: Buffer
    sigma: Buffer
    py0_mean: Buffer
    py0_logvar: Buffer
    qy0_mean: jnp.ndarray
    qy0_logvar: jnp.ndarray
    initial_network: Linear
    linear_in: Linear
    linears: Tuple[Linear, ...]
    linear_out: Linear
    embedding: Linear
    method: str = static_field(default="srk")

    @staticmethod
    def create(key, input_channels: int, hidden_channels: int,
               hidden_hidden_channels: int, num_hidden_layers: int,
               theta: float = 1.0, mu: float = 0.0, sigma: float = 0.5,
               method: str = "srk", dtype=jnp.float32) -> "LatentSDE":
        logvar = math.log(sigma**2 / (2.0 * theta))
        ks = jax.random.split(key, num_hidden_layers + 4)
        H = hidden_channels
        return LatentSDE(
            theta=buffer(jnp.full((1, 1), theta, dtype)),
            mu=buffer(jnp.full((1, 1), mu, dtype)),
            sigma=buffer(jnp.full((1, 1), sigma, dtype)),
            py0_mean=buffer(jnp.full((1, 1), mu, dtype)),
            py0_logvar=buffer(jnp.full((1, 1), logvar, dtype)),
            qy0_mean=jnp.full((1, 1), mu, dtype),
            qy0_logvar=jnp.full((1, 1), logvar, dtype),
            initial_network=Linear.create(ks[0], input_channels, H - 1,
                                          dtype=dtype),
            linear_in=Linear.create(ks[1], (H - 1) + 2,
                                    hidden_hidden_channels, dtype=dtype),
            linears=tuple(
                Linear.create(ks[2 + i], hidden_hidden_channels,
                              hidden_hidden_channels, dtype=dtype)
                for i in range(num_hidden_layers - 1)
            ),
            linear_out=Linear.create(ks[num_hidden_layers + 1],
                                     hidden_hidden_channels, H - 1,
                                     dtype=dtype),
            embedding=Linear.create(ks[num_hidden_layers + 2], H - 1, H,
                                    dtype=dtype),
            method=method,
        )

    # posterior drift
    def f(self, t, y):
        t = jnp.broadcast_to(jnp.asarray(t), y.shape[:-1] + (1,)).astype(
            y.dtype
        )
        z = self.linear_in(
            jnp.concatenate([jnp.sin(t), jnp.cos(t), y], axis=-1)
        )
        z = jax.nn.relu(z)
        for lin in self.linears:
            z = jax.nn.relu(lin(z))
        return self.linear_out(z)

    # shared diffusion
    def g(self, t, y):
        return jnp.broadcast_to(self.sigma.value[0, 0], y.shape)

    # prior drift (OU)
    def h(self, t, y):
        return self.theta.value[0, 0] * (self.mu.value[0, 0] - y)

    # augmented system: last channel accumulates the KL rate
    def f_aug(self, t, y):
        state = y[..., :-1]
        f = self.f(t, state)
        g = self.g(t, state)
        h = self.h(t, state)
        u = _stable_division(f - h, g)
        kl_rate = 0.5 * jnp.sum(u * u, axis=-1, keepdims=True)
        return jnp.concatenate([f, kl_rate], axis=-1)

    def g_aug(self, t, y):
        state = y[..., :-1]
        g = self.g(t, state)
        zero = jnp.zeros(state.shape[:-1] + (1,), state.dtype)
        return jnp.concatenate([g, zero], axis=-1)

    @property
    def qy0_std(self):
        return jnp.exp(0.5 * self.qy0_logvar)

    @property
    def py0_std(self):
        return jnp.exp(0.5 * self.py0_logvar.value)

    def kl_initial(self):
        """KL(q(y0) || p(y0)) for scalar Gaussians."""
        q_m, q_lv = self.qy0_mean[0, 0], self.qy0_logvar[0, 0]
        p_m = self.py0_mean.value[0, 0]
        p_lv = self.py0_logvar.value[0, 0]
        return 0.5 * (
            p_lv - q_lv
            + (jnp.exp(q_lv) + (q_m - p_m) ** 2) / jnp.exp(p_lv)
            - 1.0
        )

    def __call__(self, coeffs, times, *, key, dt=None, method=None, bm=None):
        """Returns (out [B,L,H], latent [B,L,H-1], logqp scalar)."""
        import os

        path = CubicPath(coeffs, times)
        y0 = path.evaluate(jnp.asarray(times)[0])        # [B, C]
        aug0 = self.initial_network(y0)
        B = aug0.shape[0]
        aug0 = jnp.concatenate(
            [aug0, jnp.zeros((B, 1), aug0.dtype)], axis=-1
        )
        dt = resolve_dt(times) if dt is None else dt
        method = method or self.method
        ys = None
        if (method == "euler" and bm is None
                and os.environ.get("SNSDE_NO_FUSED", "0") != "1"
                and os.environ.get("SNSDE_FUSED_LATENT", "0") == "1"
                and jax.default_backend() == "tpu"):
            # the fused EM kernel's latent mode runs the augmented system
            # (drift MLP + OU prior + KL rate) entirely on-chip. Parity
            # is green on hardware after the round-4 exact-f32 dot pin
            # (KL-lane divergence <= 4.9e-4 abs vs the scan path), but
            # the kernel LOSES to XLA's scan at every measured shape
            # (BENCH_GATE.json: 0.85x at H=64, 0.78x at H=32 — the
            # augmented system's small per-lane scalar rows starve the
            # MXU), so dispatch is opt-in: SNSDE_FUSED_LATENT=1. The
            # lane-PACKED latent path (pack_latent_models), which
            # amortizes those rows across members, is unaffected.
            from ..kernels.fused_em import fused_latent_em_solve, is_batched

            if not is_batched(self, coeffs, key):
                ys = fused_latent_em_solve(self, times, aug0, key, dt=dt)
        if ys is None:
            ys = sdeint(self.f_aug, self.g_aug, aug0, times, key=key,
                        dt=dt, method=method, bm=bm)      # [L, B, H]
        ys = jnp.moveaxis(ys, 0, 1)                       # [B, L, H]
        latent = ys[..., :-1]
        logqp_path = ys[:, -1, -1]                        # final accumulator
        logqp = jnp.mean(self.kl_initial() + logqp_path)
        out = self.embedding(latent)
        return out, latent, logqp
