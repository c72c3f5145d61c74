"""SAnD and MIAM attention models.

Rebuilds:
  * SAnD (/root/reference/torch-ists/torch_ists/attn_module/SAnD_model.py
    + SAnD_modules.py): 1x1-conv embedding -> positional encoding ->
    transformer blocks -> dense interpolation to `factor` pseudo-points ->
    flatten -> classification vector; the `_layer` variant repeats that
    vector over the sequence and adds a linear embedding to emit a stream
    (SAnD_model.py:63-85).
  * MIAM (/root/reference/torch-ists/torch_ists/attn_module/
    MIAM_models.py:19-380): missingness-aware embedding of
    (values, mask, delta) with a time-descriptor positional encoding,
    stacked self-attention blocks run at multiple temporal durations
    (strided subsampling), residually combined, with a classifier head.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import Module, module, static_field
from ..nn.layers import Linear
from .rnn import SeqTransformer

__all__ = ["SAnDLayer", "MIAMLayer", "dense_interpolation"]


def dense_interpolation(x, factor: int):
    """SAnD dense interpolation: [B, L, H] -> [B, M, H] with
    w[t, m] = (1 - |s_t - m|/M)^2, s_t = M * t / L (SAnD_modules.py)."""
    B, L, H = x.shape
    t = np.arange(1, L + 1, dtype=np.float32)
    m = np.arange(1, factor + 1, dtype=np.float32)
    s = factor * t / L                                   # [L]
    w = (1.0 - np.abs(s[:, None] - m[None, :]) / factor) ** 2  # [L, M]
    w = jnp.asarray(w)
    return jnp.einsum("blh,lm->bmh", x, w)


@module
class SAnDLayer(Module):
    encoder: SeqTransformer
    clf: Linear                  # flatten(M*H) -> n_class
    embedding: Linear            # n_class -> n_class (stream head)
    factor: int = static_field(default=16)
    seq_len: int = static_field(default=10)

    @staticmethod
    def create(key, input_features: int, seq_len: int, hidden: int,
               n_heads: int = 4, factor: int = 16, n_layers: int = 1,
               dtype=jnp.float32):
        factor = min(factor, seq_len)
        k1, k2, k3 = jax.random.split(key, 3)
        nh = n_heads if hidden % n_heads == 0 else 1
        return SAnDLayer(
            encoder=SeqTransformer.create(k1, input_features, hidden,
                                          hidden, num_heads=nh,
                                          num_layers=n_layers, dtype=dtype),
            clf=Linear.create(k2, factor * hidden, hidden, dtype=dtype),
            embedding=Linear.create(k3, hidden, hidden, dtype=dtype),
            factor=factor,
            seq_len=seq_len,
        )

    def __call__(self, x, *, key=None, train: bool = False):
        _, stream = self.encoder(x)                      # [B, L, H]
        u = dense_interpolation(stream, self.factor)     # [B, M, H]
        v = self.clf(u.reshape(u.shape[0], -1))          # [B, H]
        hn = jnp.broadcast_to(v[:, None, :],
                              (v.shape[0], self.seq_len, v.shape[-1]))
        out = self.embedding(hn)
        return out, hn


@module
class MIAMLayer(Module):
    embed_x: Linear
    embed_m: Linear
    embed_d: Linear
    time_w: Linear
    blocks: Tuple[SeqTransformer, ...]
    combine: Linear
    head: Linear
    durations: Tuple[int, ...] = static_field(default=(1, 2, 4))

    @staticmethod
    def create(key, input_dim: int, hidden: int, seq_len: int,
               n_layers: int = 1, durations=(1, 2, 4), dtype=jnp.float32):
        durations = tuple(d for d in durations if d < max(seq_len, 2))
        ks = jax.random.split(key, 6 + len(durations))
        nh = 4 if hidden % 4 == 0 else 1
        return MIAMLayer(
            embed_x=Linear.create(ks[0], input_dim, hidden, dtype=dtype),
            embed_m=Linear.create(ks[1], input_dim, hidden, dtype=dtype),
            embed_d=Linear.create(ks[2], input_dim, hidden, dtype=dtype),
            time_w=Linear.create(ks[3], 1, hidden, dtype=dtype),
            blocks=tuple(
                SeqTransformer.create(ks[4 + i], hidden, hidden, hidden,
                                      num_heads=nh, num_layers=n_layers,
                                      dtype=dtype)
                for i in range(len(durations))
            ),
            combine=Linear.create(ks[-2], hidden * len(durations), hidden,
                                  dtype=dtype),
            head=Linear.create(ks[-1], hidden, hidden, dtype=dtype),
            durations=durations,
        )

    def __call__(self, x, mask, delta, seq_ts, *, key=None,
                 train: bool = False):
        """x/mask/delta [B, L, D], seq_ts [B, L] -> (out, hn) streams."""
        B, L, D = x.shape
        # missingness-aware embedding + time descriptor
        h = (
            self.embed_x(x)
            + self.embed_m(mask)
            + self.embed_d(delta)
            + jnp.tanh(self.time_w(seq_ts[..., None]))
        )
        outs = []
        for dur, block in zip(self.durations, self.blocks):
            sub = h[:, ::dur, :]                        # strided duration
            _, enc = block(sub)
            # upsample back to L by repetition
            rep = jnp.repeat(enc, dur, axis=1)[:, :L, :]
            if rep.shape[1] < L:
                pad = jnp.repeat(rep[:, -1:, :], L - rep.shape[1], axis=1)
                rep = jnp.concatenate([rep, pad], axis=1)
            outs.append(rep)
        combined = self.combine(jnp.concatenate(outs, axis=-1))
        hn = combined + h                                # residual
        return self.head(hn), hn
