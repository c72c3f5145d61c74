"""Drift/diffusion vector fields.

`DiffusionField` is the TPU-native equivalent of the reference's single
parameterized `Diffusion_model` realizing the whole proposed-model family via
the (input_option 0–6) × (noise_option 0–19) grid
(/root/reference/benchmark_classification/models_sde/neuralsde.py:123-307).
Both options are *static* fields: Python-level dispatch at trace time folds
each configuration into one fused XLA graph — no runtime branching.

Canonical bindings (contract preserved, asserted by tests):
    staticsde=(1,0)  naivesde=(1,18)
    neurallsde=(2,16)  neurallnsde=(4,17)  neuralgsde=(6,17)
(reference common_sde.py:303-342; contract dict neuralsde.py:23-27).

The "pure" tutorial formulations (LipSwish MLPs, no tanh clipping —
reference tutorial notebooks) live here too as `NeuralSDEFunc`,
`NeuralLSDEFunc`, `NeuralLNSDEFunc`, `NeuralGSDEFunc`; the tutorial README
deliberately distinguishes them from the runtime-stabilized benchmark
parameterization.

Unlike the reference (which mutates `self.X` via `set_X`), the control path
is *bound functionally*: `field.bind(path)` returns a new field carrying the
path as a pytree leaf — jit/vmap/scan-safe by construction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .nn.core import Module, module, static_field
from .nn.layers import MLP, Linear
from .ops.interp import CubicPath

__all__ = [
    "DiffusionField",
    "NeuralSDEFunc",
    "NeuralLSDEFunc",
    "NeuralLNSDEFunc",
    "NeuralGSDEFunc",
    "PROPOSAL_METHOD_CONTRACT",
    "MODEL_NAME_GRID",
]

# LSDE/LNSDE/GSDE option contract — must match the reference
# (benchmark_classification/models_sde/neuralsde.py:23-27).
PROPOSAL_METHOD_CONTRACT = {
    "lsde": (2, 16),
    "lnsde": (4, 17),
    "gsde": (6, 17),
}

# Named aliases used across the reference harnesses
# (common_sde.py:303-342; README.md:31-35).
MODEL_NAME_GRID = {
    "staticsde": (1, 0),
    "naivesde": (1, 18),
    "neuralsde": (3, 18),
    "neurallsde": (2, 16),
    "neurallnsde": (4, 17),
    "neuralgsde": (6, 17),
}


def _time_column(t, y):
    """Broadcast scalar t to a [..., 1] column matching y's batch dims."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        return jnp.broadcast_to(t, y.shape[:-1] + (1,)).astype(y.dtype)
    if t.shape[-1:] != (1,):
        t = t[..., None]
    return t.astype(y.dtype)


@module
class DiffusionField(Module):
    """The input_option × noise_option drift/diffusion grid.

    f(t,y): spline-evaluate X(t) -> initial_network -> drift-input build
            (per input_option) -> shared ReLU MLP -> optional geometric
            z*tanh(y) -> tanh clip.
    g(t,y): noise dispatch (per noise_option) -> sigmoid(theta) *
            nan_to_num -> tanh clip. Diagonal noise.
    """

    initial_network: Linear
    linear_in: Linear
    linears: Tuple[Linear, ...]
    linear_out: Linear
    emb: Optional[Linear]
    theta: jnp.ndarray
    sigma: Optional[jnp.ndarray]
    sigma_diag: Optional[jnp.ndarray]
    noise_t: Optional[Tuple[Linear, ...]]
    noise_y: Optional[Tuple[Linear, ...]]
    path: Optional[CubicPath]
    input_option: int = static_field(default=0)
    noise_option: int = static_field(default=0)

    noise_type: str = static_field(default="diagonal")
    sde_type: str = static_field(default="ito")

    @staticmethod
    def create(
        key,
        input_channels: int,
        hidden_channels: int,
        hidden_hidden_channels: int,
        num_hidden_layers: int,
        theta: float = 1.0,
        sigma: float = 1.0,
        input_option: int = 0,
        noise_option: int = 0,
        dtype=jnp.float32,
    ) -> "DiffusionField":
        keys = jax.random.split(key, 8 + num_hidden_layers)
        time_emb = input_option in (3, 4, 5, 6)
        ctrl_emb = input_option in (2, 4, 6)
        if ctrl_emb and hidden_hidden_channels != hidden_channels:
            # the control-embedding layer concatenates [linear_in(y), X_t]
            # with widths (hidden_hidden, hidden) into a 2*hidden input —
            # consistent only when they match. The reference has the same
            # implicit constraint (emb = Linear(hidden*2, hidden) vs
            # hidden_hidden-wide yy, neuralsde.py:149-154) but fails with
            # an opaque shape error instead.
            raise ValueError(
                f"input_option {input_option} requires hidden_channels == "
                f"hidden_hidden_channels (got {hidden_channels} vs "
                f"{hidden_hidden_channels})"
            )
        if input_option == 0 and hidden_hidden_channels != hidden_channels:
            raise ValueError(
                "input_option 0 feeds X_t (hidden_channels wide) straight "
                "into the hidden MLP — hidden_channels must equal "
                "hidden_hidden_channels"
            )

        initial_network = Linear.create(
            keys[0], input_channels, hidden_channels, dtype=dtype
        )
        linear_in = Linear.create(
            keys[1],
            hidden_channels + 2 if time_emb else hidden_channels,
            hidden_hidden_channels,
            dtype=dtype,
        )
        emb = (
            Linear.create(keys[2], hidden_channels * 2, hidden_channels,
                          dtype=dtype)
            if ctrl_emb
            else None
        )
        linears = tuple(
            Linear.create(keys[3 + i], hidden_hidden_channels,
                          hidden_hidden_channels, dtype=dtype)
            for i in range(num_hidden_layers - 1)
        )
        linear_out = Linear.create(
            keys[3 + num_hidden_layers], hidden_hidden_channels,
            hidden_channels, dtype=dtype
        )

        theta_p = jnp.full((1, 1), theta, dtype)
        sigma_p = (
            jnp.full((1,), sigma, dtype) if noise_option in (1, 2, 3) else None
        )
        sigma_diag = (
            jnp.full((hidden_channels,), sigma, dtype)
            if noise_option in (4, 5, 6)
            else None
        )

        k_n1, k_n2 = (
            keys[4 + num_hidden_layers],
            keys[5 + num_hidden_layers],
        )
        noise_t = None
        noise_y = None
        if noise_option in (12, 13):
            noise_t = (Linear.create(k_n1, 2, hidden_channels, dtype=dtype),)
        if noise_option in (14, 15):
            noise_y = (
                Linear.create(k_n1, hidden_channels + 2, hidden_channels,
                              dtype=dtype),
            )
        if noise_option in (16, 17):
            noise_t = (
                Linear.create(k_n1, 2, hidden_channels, dtype=dtype),
                Linear.create(k_n2, hidden_channels, hidden_channels,
                              dtype=dtype),
            )
        if noise_option in (18, 19):
            noise_y = (
                Linear.create(k_n1, hidden_channels + 2, hidden_channels,
                              dtype=dtype),
                Linear.create(k_n2, hidden_channels, hidden_channels,
                              dtype=dtype),
            )

        return DiffusionField(
            initial_network=initial_network,
            linear_in=linear_in,
            linears=linears,
            linear_out=linear_out,
            emb=emb,
            theta=theta_p,
            sigma=sigma_p,
            sigma_diag=sigma_diag,
            noise_t=noise_t,
            noise_y=noise_y,
            path=None,
            input_option=input_option,
            noise_option=noise_option,
        )

    # -- control path binding (functional set_X) ---------------------------

    def bind(self, path: CubicPath) -> "DiffusionField":
        """Functional equivalent of the reference's set_X (neuralsde.py:181)."""
        return self.replace(path=path)

    @property
    def hidden_channels(self):
        return self.linear_out.out_features

    # -- drift --------------------------------------------------------------

    def _time_features(self, t, y):
        tcol = _time_column(t, y)
        return tcol, jnp.concatenate([jnp.sin(tcol), jnp.cos(tcol)], axis=-1)

    def _mlp(self, z):
        z = jax.nn.relu(z)
        for lin in self.linears:
            z = jax.nn.relu(lin(z))
        return self.linear_out(z)

    def f(self, t, y):
        Xt = self.path.evaluate(t)
        Xt = self.initial_network(Xt)

        if self.input_option in (3, 4, 5, 6):
            _, tf = self._time_features(t, y)
            yy = self.linear_in(jnp.concatenate([tf, y], axis=-1))
        else:
            yy = self.linear_in(y)

        if self.input_option == 0:
            z = Xt
        elif self.input_option in (1, 3, 5):
            z = yy
        else:
            z = self.emb(jnp.concatenate([yy, Xt], axis=-1))

        z = self._mlp(z)
        if self.input_option in (5, 6):
            z = z * jnp.tanh(y)          # geometric interaction
        return jnp.tanh(z)               # runtime drift clip

    # -- diffusion ------------------------------------------------------------

    def _raw_diffusion(self, t, y):
        no = self.noise_option
        tcol, tf = self._time_features(t, y)

        if no == 0:
            return jnp.zeros_like(y)
        if no == 1:
            return jnp.broadcast_to(jnp.exp(self.sigma), y.shape)
        if no == 2:
            return jnp.broadcast_to(jnp.exp(self.sigma), y.shape) * tcol
        if no == 3:
            return jnp.exp(self.sigma) * y
        if no == 4:
            return jnp.broadcast_to(jnp.exp(self.sigma_diag), y.shape)
        if no == 5:
            return jnp.broadcast_to(jnp.exp(self.sigma_diag), y.shape) * tcol
        if no == 6:
            return jnp.exp(self.sigma_diag) * y
        if no == 7:
            return jnp.sqrt(y)
        if no == 8:
            return y ** 3
        if no == 9:
            return jax.nn.sigmoid(y)
        if no == 10:
            return jax.nn.relu(y)
        if no == 11:
            return tcol * y

        def two_layer(net, x):
            h = jax.nn.relu(net[0](x))
            return net[1](h)

        if no == 12:
            return self.noise_t[0](tf)
        if no == 13:
            return self.noise_t[0](tf) * y
        if no == 14:
            return self.noise_y[0](jnp.concatenate([tf, y], axis=-1))
        if no == 15:
            return self.noise_y[0](jnp.concatenate([tf, y], axis=-1)) * y
        if no == 16:
            return jax.nn.relu(two_layer(self.noise_t, tf))
        if no == 17:
            return jax.nn.relu(two_layer(self.noise_t, tf)) * y
        if no == 18:
            return jax.nn.relu(
                two_layer(self.noise_y, jnp.concatenate([tf, y], axis=-1))
            )
        if no == 19:
            return (
                jax.nn.relu(
                    two_layer(self.noise_y, jnp.concatenate([tf, y], axis=-1))
                )
                * y
            )
        raise ValueError(f"unknown noise_option {no}")

    def g(self, t, y):
        noise = self._raw_diffusion(t, y)
        noise = jax.nn.sigmoid(self.theta[0, 0]) * jnp.nan_to_num(noise)
        return jnp.tanh(noise)


# ---------------------------------------------------------------------------
# Tutorial ("pure") formulations — LipSwish MLPs, no tanh clipping.
# Reference: tutorial notebooks cell 7 of each model notebook.
# ---------------------------------------------------------------------------


@module
class NeuralSDEFunc(Module):
    """Generic Neural SDE: f = MLP([t, y]); g = MLP([t, y])."""

    linear_in: Linear
    f_net: MLP
    linear_out: Linear
    noise_in: Linear
    g_net: MLP
    path: Optional[CubicPath]
    noise_type: str = static_field(default="diagonal")
    sde_type: str = static_field(default="ito")

    @staticmethod
    def create(key, input_dim, hidden_dim, hidden_hidden_dim, num_layers,
               activation="lipswish", dtype=jnp.float32):
        ks = jax.random.split(key, 5)
        return NeuralSDEFunc(
            linear_in=Linear.create(ks[0], hidden_dim + 1, hidden_dim, dtype=dtype),
            f_net=MLP.create(ks[1], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            linear_out=Linear.create(ks[2], hidden_dim, hidden_dim, dtype=dtype),
            noise_in=Linear.create(ks[3], hidden_dim + 1, hidden_dim, dtype=dtype),
            g_net=MLP.create(ks[4], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            path=None,
        )

    def bind(self, path):
        return self.replace(path=path)

    def f(self, t, y):
        tcol = _time_column(t, y)
        return self.f_net(self.linear_in(jnp.concatenate([tcol, y], axis=-1)))

    def g(self, t, y):
        tcol = _time_column(t, y)
        return self.g_net(self.noise_in(jnp.concatenate([tcol, y], axis=-1)))


@module
class NeuralLSDEFunc(Module):
    """Langevin-type SDE: f = MLP(emb([y, X(t)])); g = MLP(NN(t)) —
    state-independent (additive) diffusion."""

    linear_X: Linear
    emb: Linear
    f_net: MLP
    linear_out: Linear
    noise_in: Linear
    g_net: MLP
    path: Optional[CubicPath]
    noise_type: str = static_field(default="diagonal")
    sde_type: str = static_field(default="ito")

    @staticmethod
    def create(key, input_dim, hidden_dim, hidden_hidden_dim, num_layers,
               activation="lipswish", dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        return NeuralLSDEFunc(
            linear_X=Linear.create(ks[0], input_dim, hidden_dim, dtype=dtype),
            emb=Linear.create(ks[1], hidden_dim * 2, hidden_dim, dtype=dtype),
            f_net=MLP.create(ks[2], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            linear_out=Linear.create(ks[3], hidden_dim, hidden_dim, dtype=dtype),
            noise_in=Linear.create(ks[4], 1, hidden_dim, dtype=dtype),
            g_net=MLP.create(ks[5], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            path=None,
        )

    def bind(self, path):
        return self.replace(path=path)

    def f(self, t, y):
        Xt = self.linear_X(self.path.evaluate(t))
        z = self.emb(jnp.concatenate([y, Xt], axis=-1))
        return self.linear_out(self.f_net(z))

    def g(self, t, y):
        tcol = _time_column(t, y)
        return self.g_net(self.noise_in(tcol))


@module
class NeuralLNSDEFunc(Module):
    """Linear-noise SDE: f = MLP(emb([t-feat, y, X(t)])); g = NN(t) * y."""

    linear_X: Linear
    emb: Linear
    f_net: MLP
    linear_out: Linear
    noise_in: Linear
    g_net: MLP
    path: Optional[CubicPath]
    noise_type: str = static_field(default="diagonal")
    sde_type: str = static_field(default="ito")

    @staticmethod
    def create(key, input_dim, hidden_dim, hidden_hidden_dim, num_layers,
               activation="lipswish", dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        return NeuralLNSDEFunc(
            linear_X=Linear.create(ks[0], input_dim, hidden_dim, dtype=dtype),
            emb=Linear.create(ks[1], hidden_dim * 2 + 1, hidden_dim, dtype=dtype),
            f_net=MLP.create(ks[2], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            linear_out=Linear.create(ks[3], hidden_dim, hidden_dim, dtype=dtype),
            noise_in=Linear.create(ks[4], 1, hidden_dim, dtype=dtype),
            g_net=MLP.create(ks[5], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            path=None,
        )

    def bind(self, path):
        return self.replace(path=path)

    def f(self, t, y):
        tcol = _time_column(t, y)
        Xt = self.linear_X(self.path.evaluate(t))
        z = self.emb(jnp.concatenate([tcol, y, Xt], axis=-1))
        return self.linear_out(self.f_net(z))

    def g(self, t, y):
        tcol = _time_column(t, y)
        return self.g_net(self.noise_in(tcol)) * y


@module
class NeuralGSDEFunc(Module):
    """Geometric SDE: drift and diffusion both scale multiplicatively with y
    (positivity-oriented geometric structure)."""

    linear_X: Linear
    emb: Linear
    f_net: MLP
    linear_out: Linear
    noise_in: Linear
    g_net: MLP
    path: Optional[CubicPath]
    noise_type: str = static_field(default="diagonal")
    sde_type: str = static_field(default="ito")

    @staticmethod
    def create(key, input_dim, hidden_dim, hidden_hidden_dim, num_layers,
               activation="lipswish", dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        return NeuralGSDEFunc(
            linear_X=Linear.create(ks[0], input_dim, hidden_dim, dtype=dtype),
            emb=Linear.create(ks[1], hidden_dim * 2 + 1, hidden_dim, dtype=dtype),
            f_net=MLP.create(ks[2], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            linear_out=Linear.create(ks[3], hidden_dim, hidden_dim, dtype=dtype),
            noise_in=Linear.create(ks[4], 1, hidden_dim, dtype=dtype),
            g_net=MLP.create(ks[5], hidden_dim, hidden_dim, hidden_hidden_dim,
                             num_layers, activation, dtype=dtype),
            path=None,
        )

    def bind(self, path):
        return self.replace(path=path)

    def f(self, t, y):
        tcol = _time_column(t, y)
        Xt = self.linear_X(self.path.evaluate(t))
        z = self.emb(jnp.concatenate([tcol, y, Xt], axis=-1))
        return self.linear_out(self.f_net(z)) * y

    def g(self, t, y):
        tcol = _time_column(t, y)
        return self.g_net(self.noise_in(tcol)) * y
