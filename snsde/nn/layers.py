"""Core layers. Initialization follows torch.nn defaults (Kaiming-uniform
with a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for Linear weight and
bias) so that training dynamics are comparable with the reference
(cf. /root/reference/benchmark_classification/models_sde/neuralsde.py which
relies on torch defaults throughout).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core import Buffer, Module, buffer, module, static_field

__all__ = [
    "Linear",
    "MLP",
    "BatchNorm",
    "Dropout",
    "GRUCell",
    "RNNCell",
    "LSTMCell",
    "lipswish",
    "init_linear",
]


def init_linear(key, in_features: int, out_features: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-k, k), k = 1/sqrt(fan_in)."""
    wkey, bkey = jax.random.split(key)
    k = 1.0 / jnp.sqrt(jnp.maximum(in_features, 1))
    w = jax.random.uniform(
        wkey, (in_features, out_features), dtype, minval=-k, maxval=k
    )
    b = jax.random.uniform(bkey, (out_features,), dtype, minval=-k, maxval=k)
    return w, b


@module
class Linear(Module):
    weight: jnp.ndarray  # [in, out] — stored transposed vs torch for x @ W
    bias: Optional[jnp.ndarray]

    @staticmethod
    def create(key, in_features: int, out_features: int, use_bias: bool = True,
               dtype=jnp.float32) -> "Linear":
        w, b = init_linear(key, in_features, out_features, dtype)
        return Linear(weight=w, bias=b if use_bias else None)

    @property
    def in_features(self):
        return self.weight.shape[0]

    @property
    def out_features(self):
        return self.weight.shape[1]

    def __call__(self, x):
        y = x @ self.weight
        if self.bias is not None:
            y = y + self.bias
        return y


def lipswish(x):
    """0.909 * silu(x) — Lipschitz-constrained swish used by the tutorial
    formulations (reference tutorial notebooks, MLP activation)."""
    return 0.909 * jax.nn.silu(x)


_ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "lipswish": lipswish,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


@module
class MLP(Module):
    """in -> hidden -> ... -> out with an activation between layers.

    Matches the tutorial MLP (reference tutorial notebooks cell 7): Linear,
    act, [Linear, act] * (num_layers-1), Linear, optional final tanh.
    """

    layers: Tuple[Linear, ...]
    activation: str = static_field(default="relu")
    final_tanh: bool = static_field(default=False)

    @staticmethod
    def create(key, in_size: int, out_size: int, hidden_dim: int,
               num_layers: int, activation: str = "lipswish",
               final_tanh: bool = False, dtype=jnp.float32) -> "MLP":
        keys = jax.random.split(key, num_layers + 1)
        layers = [Linear.create(keys[0], in_size, hidden_dim, dtype=dtype)]
        for i in range(num_layers - 1):
            layers.append(
                Linear.create(keys[i + 1], hidden_dim, hidden_dim, dtype=dtype)
            )
        layers.append(Linear.create(keys[-1], hidden_dim, out_size, dtype=dtype))
        return MLP(layers=tuple(layers), activation=activation,
                   final_tanh=final_tanh)

    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        for layer in self.layers[:-1]:
            x = act(layer(x))
        x = self.layers[-1](x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x


@module
class BatchNorm(Module):
    """BatchNorm1d over the last axis with functional running statistics.

    Call returns (y, new_self): at train time batch statistics normalize and
    running stats are EMA-updated (momentum 0.1, matching torch defaults);
    at eval time running stats normalize and self is returned unchanged.
    Running stats are Buffers — excluded from gradients by partition().
    """

    scale: jnp.ndarray
    offset: jnp.ndarray
    running_mean: Buffer
    running_var: Buffer
    eps: float = static_field(default=1e-5)
    momentum: float = static_field(default=0.1)

    @staticmethod
    def create(num_features: int, eps: float = 1e-5, momentum: float = 0.1,
               dtype=jnp.float32) -> "BatchNorm":
        return BatchNorm(
            scale=jnp.ones((num_features,), dtype),
            offset=jnp.zeros((num_features,), dtype),
            running_mean=buffer(jnp.zeros((num_features,), dtype)),
            running_var=buffer(jnp.ones((num_features,), dtype)),
            eps=eps,
            momentum=momentum,
        )

    def __call__(self, x, train: bool = False):
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            n = x.size // x.shape[-1]
            # torch tracks the unbiased variance in running stats.
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            new_self = self.replace(
                running_mean=Buffer(
                    (1 - m) * self.running_mean.value + m * mean
                ),
                running_var=Buffer(
                    (1 - m) * self.running_var.value + m * unbiased
                ),
            )
        else:
            mean = self.running_mean.value
            var = self.running_var.value
            new_self = self
        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean) * inv * self.scale + self.offset
        return y, new_self


@module
class Dropout(Module):
    rate: float = static_field(default=0.1)

    def __call__(self, x, *, key=None, train: bool = False):
        if not train or self.rate == 0.0 or key is None:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


@module
class RNNCell(Module):
    """Vanilla tanh Elman cell, torch nn.RNN parameterization:
    h' = tanh(x @ w_ih + b_ih + h @ w_hh + b_hh). The reference's `rnn`
    baseline is exactly this (torch-ists _layer.py:135-137)."""

    w_ih: jnp.ndarray  # [in, H]
    w_hh: jnp.ndarray  # [H, H]
    b_ih: jnp.ndarray
    b_hh: jnp.ndarray

    @staticmethod
    def create(key, input_size: int, hidden_size: int, dtype=jnp.float32):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        k = 1.0 / jnp.sqrt(hidden_size)
        u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
        return RNNCell(
            w_ih=u(k1, (input_size, hidden_size)),
            w_hh=u(k2, (hidden_size, hidden_size)),
            b_ih=u(k3, (hidden_size,)),
            b_hh=u(k4, (hidden_size,)),
        )

    @property
    def hidden_size(self):
        return self.w_hh.shape[0]

    def __call__(self, x, h):
        return jnp.tanh(x @ self.w_ih + self.b_ih + h @ self.w_hh
                        + self.b_hh)


@module
class GRUCell(Module):
    """GRU cell with torch gate ordering (r, z, n)."""

    w_ih: jnp.ndarray  # [in, 3H]
    w_hh: jnp.ndarray  # [H, 3H]
    b_ih: jnp.ndarray
    b_hh: jnp.ndarray

    @staticmethod
    def create(key, input_size: int, hidden_size: int, dtype=jnp.float32):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        k = 1.0 / jnp.sqrt(hidden_size)
        u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
        return GRUCell(
            w_ih=u(k1, (input_size, 3 * hidden_size)),
            w_hh=u(k2, (hidden_size, 3 * hidden_size)),
            b_ih=u(k3, (3 * hidden_size,)),
            b_hh=u(k4, (3 * hidden_size,)),
        )

    @property
    def hidden_size(self):
        return self.w_hh.shape[0]

    def __call__(self, x, h):
        gi = x @ self.w_ih + self.b_ih
        gh = h @ self.w_hh + self.b_hh
        H = self.hidden_size
        i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
        h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h


@module
class LSTMCell(Module):
    """LSTM cell with torch gate ordering (i, f, g, o)."""

    w_ih: jnp.ndarray  # [in, 4H]
    w_hh: jnp.ndarray  # [H, 4H]
    b_ih: jnp.ndarray
    b_hh: jnp.ndarray

    @staticmethod
    def create(key, input_size: int, hidden_size: int, dtype=jnp.float32):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        k = 1.0 / jnp.sqrt(hidden_size)
        u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
        return LSTMCell(
            w_ih=u(k1, (input_size, 4 * hidden_size)),
            w_hh=u(k2, (hidden_size, 4 * hidden_size)),
            b_ih=u(k3, (4 * hidden_size,)),
            b_hh=u(k4, (4 * hidden_size,)),
        )

    @property
    def hidden_size(self):
        return self.w_hh.shape[0]

    def __call__(self, x, state):
        h, c = state
        g = x @ self.w_ih + self.b_ih + h @ self.w_hh + self.b_hh
        H = self.hidden_size
        i = jax.nn.sigmoid(g[..., :H])
        f = jax.nn.sigmoid(g[..., H:2 * H])
        gg = jnp.tanh(g[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(g[..., 3 * H:])
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        return h, (h, c)
