"""mTAN: multi-time attention encoder/decoder for irregular series.

Rebuilds /root/reference/torch-ists/torch_ists/attn_module/mTAN_models.py
(`multiTimeAttention` :32-76, `enc_mtan_rnn` :79-129, `dec_mtan_rnn`
:132-183) and the `dec_rnn3` decoder from
/root/reference/benchmark_interpolation/models.py.

Key semantics kept exactly:
  * attention scores are computed from *time embeddings only* (queries =
    reference-grid times, keys = observation times);
  * the per-channel observation mask is applied per value dimension, so
    attention weights are channel-specific;
  * fixed sinusoidal time embedding uses position = 48 t and
    div = exp(arange(0,d,2) * -(ln 10)/d).

One fused attention (einsum + masked softmax) per call — at L<=128 this is
an ordinary fused kernel on TPU (SURVEY.md §5, long-context note).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.core import Module, module, static_field
from ..nn.layers import GRUCell, Linear

__all__ = ["TimeEmbedding", "MultiTimeAttention", "MTANEncoder",
           "MTANDecoder", "DecRNN3", "MTANClassifier", "LatentClassifier"]


@module
class TimeEmbedding(Module):
    """Learnable (linear + sin(periodic)) or fixed sinusoidal embedding."""

    periodic: Optional[Linear]
    linear: Optional[Linear]
    embed_time: int = static_field(default=16)
    learn_emb: bool = static_field(default=True)
    freq: float = static_field(default=10.0)

    @staticmethod
    def create(key, embed_time: int, learn_emb: bool = True,
               freq: float = 10.0, dtype=jnp.float32):
        if learn_emb:
            k1, k2 = jax.random.split(key)
            return TimeEmbedding(
                periodic=Linear.create(k1, 1, embed_time - 1, dtype=dtype),
                linear=Linear.create(k2, 1, 1, dtype=dtype),
                embed_time=embed_time, learn_emb=True, freq=freq,
            )
        return TimeEmbedding(periodic=None, linear=None,
                             embed_time=embed_time, learn_emb=False,
                             freq=freq)

    def __call__(self, tt):
        """tt [..., L] -> [..., L, embed_time]."""
        tt = jnp.asarray(tt)[..., None]
        if self.learn_emb:
            out1 = self.linear(tt)
            out2 = jnp.sin(self.periodic(tt))
            return jnp.concatenate([out1, out2], axis=-1)
        d = self.embed_time
        position = 48.0 * tt                             # [..., L, 1]
        div = jnp.exp(
            jnp.arange(0, d, 2, dtype=tt.dtype) * -(math.log(self.freq) / d)
        )
        angles = position * div                           # [..., L, d/2]
        pe = jnp.zeros(tt.shape[:-1] + (d,), tt.dtype)
        pe = pe.at[..., 0::2].set(jnp.sin(angles))
        pe = pe.at[..., 1::2].set(jnp.cos(angles[..., : (d + 1) // 2]))
        return pe


@module
class MultiTimeAttention(Module):
    """Time-embedding attention with per-channel masking."""

    wq: Linear
    wk: Linear
    wo: Linear
    num_heads: int = static_field(default=1)
    embed_time: int = static_field(default=16)

    @staticmethod
    def create(key, input_dim: int, nhidden: int = 16, embed_time: int = 16,
               num_heads: int = 1, dtype=jnp.float32):
        assert embed_time % num_heads == 0
        k1, k2, k3 = jax.random.split(key, 3)
        return MultiTimeAttention(
            wq=Linear.create(k1, embed_time, embed_time, dtype=dtype),
            wk=Linear.create(k2, embed_time, embed_time, dtype=dtype),
            wo=Linear.create(k3, input_dim * num_heads, nhidden, dtype=dtype),
            num_heads=num_heads,
            embed_time=embed_time,
        )

    def attention_weights(self, query, key, mask=None):
        """The attention distributions __call__ actually uses. Without a
        mask: [B, h, Lq, Lk], rows sum to 1 over key positions. With a
        mask [B, Lk, D]: [B, h, Lq, Lk, D] — one masked softmax PER VALUE
        CHANNEL, exactly mirroring __call__'s per-channel masking (a key
        position can be observed in some channels and missing in others).
        Exposed for inspection/testing."""
        h = self.num_heads
        dk = self.embed_time // h
        q = self.wq(query).reshape(query.shape[:-1] + (h, dk))
        k = self.wk(key).reshape(key.shape[:-1] + (h, dk))
        if q.ndim == 3:
            q = jnp.broadcast_to(q[None], (key.shape[0],) + q.shape)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dk)
        if mask is None:
            return jax.nn.softmax(scores, axis=-1)
        scores = scores[..., None]                       # [B,h,Lq,Lk,1]
        m = mask[:, None, None, :, :]                    # [B,1,1,Lk,D]
        scores = jnp.where(m == 0, -1e9, scores)
        return jax.nn.softmax(scores, axis=-2)           # over keys

    def __call__(self, query, key, value, mask=None):
        """query [Bq?, Lq, E], key [B, Lk, E], value [B, Lk, D],
        mask [B, Lk, D] (1 = observed) -> [B, Lq, nhidden]."""
        B, Lk, D = value.shape
        h = self.num_heads
        dk = self.embed_time // h

        q = self.wq(query).reshape(query.shape[:-1] + (h, dk))
        k = self.wk(key).reshape(key.shape[:-1] + (h, dk))
        if q.ndim == 3:  # unbatched query grid -> broadcast over batch
            q = jnp.broadcast_to(q[None], (B,) + q.shape)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dk)
        scores = scores[..., None]                       # [B,h,Lq,Lk,1]
        if mask is not None:
            m = mask[:, None, None, :, :]                # [B,1,1,Lk,D]
            scores = jnp.where(m == 0, -1e9, scores)
        else:
            scores = jnp.broadcast_to(
                scores, scores.shape[:-1] + (D,)
            )
        p = jax.nn.softmax(scores, axis=-2)              # over keys
        out = jnp.sum(p * value[:, None, None, :, :], axis=-2)  # [B,h,Lq,D]
        out = jnp.moveaxis(out, 1, 2).reshape(B, -1, h * D)
        return self.wo(out)


def _bigru(cell_f: GRUCell, cell_b: GRUCell, xs):
    """xs [L, B, C] -> [L, B, 2H]. On TPU the recurrences run through the
    fused GRU kernel (kernels/fused_rnn.py, whole loop on-chip);
    SNSDE_NO_FUSED=1 forces the scan path; the H-width perf gate is
    shared with the other recurrent dispatch sites
    (rnn._fused_rnn_enabled)."""
    B = xs.shape[1]
    H = cell_f.hidden_size

    from .rnn import _fused_rnn_enabled

    if _fused_rnn_enabled(H):
        from ..kernels.fused_em import is_batched
        from ..kernels.fused_rnn import fused_gru_scan, supports_fused_gru

        if (supports_fused_gru(cell_f)
                and not is_batched(cell_f, cell_b, xs)):
            return jnp.concatenate(
                [fused_gru_scan(cell_f, xs),
                 fused_gru_scan(cell_b, xs, reverse=True)], axis=-1)

    def run(cell, reverse):
        def step(hh, x):
            h2 = cell(x, hh)
            return h2, h2

        _, hs = jax.lax.scan(step, jnp.zeros((B, H), xs.dtype), xs,
                             reverse=reverse)
        return hs

    return jnp.concatenate([run(cell_f, False), run(cell_b, True)], axis=-1)


@module
class MTANEncoder(Module):
    """enc_mtan_rnn: attention(obs times -> ref grid) -> BiGRU -> MLP ->
    (mu, logvar) per reference point."""

    time_emb: TimeEmbedding
    att: MultiTimeAttention
    gru_f: GRUCell
    gru_b: GRUCell
    out1: Linear
    out2: Linear
    query: jnp.ndarray               # reference time grid [Lq]
    input_dim: int = static_field(default=1)
    latent_dim: int = static_field(default=2)

    @staticmethod
    def create(key, input_dim: int, query, latent_dim: int = 2,
               nhidden: int = 16, embed_time: int = 16, num_heads: int = 1,
               learn_emb: bool = False, dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        return MTANEncoder(
            time_emb=TimeEmbedding.create(ks[0], embed_time, learn_emb),
            att=MultiTimeAttention.create(ks[1], 2 * input_dim, nhidden,
                                          embed_time, num_heads, dtype),
            gru_f=GRUCell.create(ks[2], nhidden, nhidden, dtype),
            gru_b=GRUCell.create(ks[3], nhidden, nhidden, dtype),
            out1=Linear.create(ks[4], 2 * nhidden, 50, dtype=dtype),
            out2=Linear.create(ks[5], 50, latent_dim * 2, dtype=dtype),
            query=jnp.asarray(query),
            input_dim=input_dim,
            latent_dim=latent_dim,
        )

    def __call__(self, x, time_steps):
        """x [B, L, 2D] (values ‖ mask), time_steps [B, L] ->
        [B, Lq, 2*latent]."""
        D = self.input_dim
        mask = x[:, :, D:]
        mask2 = jnp.concatenate([mask, mask], axis=2)
        key_emb = self.time_emb(time_steps)               # [B, L, E]
        query_emb = self.time_emb(self.query)             # [Lq, E]
        out = self.att(query_emb, key_emb, x, mask2)      # [B, Lq, nh]
        hs = _bigru(self.gru_f, self.gru_b, jnp.moveaxis(out, 1, 0))
        out = jnp.moveaxis(hs, 0, 1)                      # [B, Lq, 2nh]
        return self.out2(jax.nn.relu(self.out1(out)))


@module
class MTANDecoder(Module):
    """dec_mtan_rnn: z on ref grid -> BiGRU -> attention(ref -> obs times)
    -> MLP -> predictions at observation times."""

    time_emb: TimeEmbedding
    att: MultiTimeAttention
    gru_f: GRUCell
    gru_b: GRUCell
    out1: Linear
    out2: Linear
    query: jnp.ndarray
    input_dim: int = static_field(default=1)

    @staticmethod
    def create(key, input_dim: int, query, latent_dim: int = 2,
               nhidden: int = 16, embed_time: int = 16, num_heads: int = 1,
               learn_emb: bool = False, dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        return MTANDecoder(
            time_emb=TimeEmbedding.create(ks[0], embed_time, learn_emb),
            att=MultiTimeAttention.create(ks[1], 2 * nhidden, 2 * nhidden,
                                          embed_time, num_heads, dtype),
            gru_f=GRUCell.create(ks[2], latent_dim, nhidden, dtype),
            gru_b=GRUCell.create(ks[3], latent_dim, nhidden, dtype),
            out1=Linear.create(ks[4], 2 * nhidden, 50, dtype=dtype),
            out2=Linear.create(ks[5], 50, input_dim, dtype=dtype),
            query=jnp.asarray(query),
            input_dim=input_dim,
        )

    def __call__(self, z, time_steps):
        """z [B, Lq, latent], time_steps [B, L] -> [B, L, D]."""
        hs = _bigru(self.gru_f, self.gru_b, jnp.moveaxis(z, 1, 0))
        out = jnp.moveaxis(hs, 0, 1)                      # [B, Lq, 2nh]
        query_emb = self.time_emb(time_steps)             # [B, L, E]
        key_emb = self.time_emb(self.query)               # [Lq, E]
        key_emb = jnp.broadcast_to(
            key_emb[None], (z.shape[0],) + key_emb.shape
        )
        out = self.att(query_emb, key_emb, out, None)     # [B, L, 2nh]
        return self.out2(jax.nn.relu(self.out1(out)))


@module
class DecRNN3(Module):
    """dec_rnn3: GRU over the latent grid, then per-target-time readout by
    nearest-reference lookup (attention-free decoder baseline,
    reference benchmark_interpolation/models.py)."""

    gru_f: GRUCell
    gru_b: GRUCell
    out1: Linear
    out2: Linear
    query: jnp.ndarray
    input_dim: int = static_field(default=1)

    @staticmethod
    def create(key, input_dim: int, query, latent_dim: int = 2,
               nhidden: int = 16, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        return DecRNN3(
            gru_f=GRUCell.create(ks[0], latent_dim, nhidden, dtype),
            gru_b=GRUCell.create(ks[1], latent_dim, nhidden, dtype),
            out1=Linear.create(ks[2], 2 * nhidden, 50, dtype=dtype),
            out2=Linear.create(ks[3], 50, input_dim, dtype=dtype),
            query=jnp.asarray(query),
            input_dim=input_dim,
        )

    def __call__(self, z, time_steps):
        hs = _bigru(self.gru_f, self.gru_b, jnp.moveaxis(z, 1, 0))
        out = jnp.moveaxis(hs, 0, 1)                      # [B, Lq, 2nh]
        # nearest reference index for each target time
        idx = jnp.searchsorted(self.query, time_steps, side="left")
        idx = jnp.clip(idx, 0, self.query.shape[0] - 1)   # [B, L]
        gathered = jnp.take_along_axis(out, idx[..., None], axis=1)
        return self.out2(jax.nn.relu(self.out1(gathered)))


@module
class MTANClassifier(Module):
    """enc_mtan_classif: attention over a learned ref grid -> GRU -> 300-300
    MLP head (reference mTAN_models.py:186-246)."""

    time_emb: TimeEmbedding
    att: MultiTimeAttention
    gru: GRUCell
    fc1: Linear
    fc2: Linear
    fc3: Linear
    query: jnp.ndarray
    input_dim: int = static_field(default=1)

    @staticmethod
    def create(key, input_dim: int, query, nhidden: int = 16,
               embed_time: int = 16, num_heads: int = 1,
               num_classes: int = 2, learn_emb: bool = True,
               freq: float = 10.0, dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        return MTANClassifier(
            time_emb=TimeEmbedding.create(ks[0], embed_time, learn_emb,
                                          freq),
            att=MultiTimeAttention.create(ks[1], 2 * input_dim, nhidden,
                                          embed_time, num_heads, dtype),
            gru=GRUCell.create(ks[2], nhidden, nhidden, dtype),
            fc1=Linear.create(ks[3], nhidden, 300, dtype=dtype),
            fc2=Linear.create(ks[4], 300, 300, dtype=dtype),
            fc3=Linear.create(ks[5], 300, num_classes, dtype=dtype),
            query=jnp.asarray(query),
            input_dim=input_dim,
        )

    def __call__(self, x, time_steps):
        """x [B, L, 2D] (values ‖ mask), time_steps [B, L] -> logits."""
        D = self.input_dim
        mask = jnp.concatenate([x[:, :, D:], x[:, :, D:]], axis=2)
        key_emb = self.time_emb(time_steps)
        query_emb = self.time_emb(self.query)
        out = self.att(query_emb, key_emb, x, mask)      # [B, Lq, nh]
        B = out.shape[0]
        H = self.gru.hidden_size

        def step(h, xt):
            h2 = self.gru(xt, h)
            return h2, h2

        h_final, _ = jax.lax.scan(step, jnp.zeros((B, H), out.dtype),
                                  jnp.moveaxis(out, 1, 0))
        h = jax.nn.relu(self.fc1(h_final))
        h = jax.nn.relu(self.fc2(h))
        return self.fc3(h)


@module
class LatentClassifier(Module):
    """create_classifier: GRU over the latent grid -> 300-300 MLP
    (reference mTAN_models.py:15-29)."""

    gru: GRUCell
    fc1: Linear
    fc2: Linear
    fc3: Linear

    @staticmethod
    def create(key, latent_dim: int, nhidden: int = 16,
               num_classes: int = 2, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        return LatentClassifier(
            gru=GRUCell.create(ks[0], latent_dim, nhidden, dtype),
            fc1=Linear.create(ks[1], nhidden, 300, dtype=dtype),
            fc2=Linear.create(ks[2], 300, 300, dtype=dtype),
            fc3=Linear.create(ks[3], 300, num_classes, dtype=dtype),
        )

    def __call__(self, z):
        """z [B, L, latent] -> logits [B, num_classes]."""
        B = z.shape[0]
        H = self.gru.hidden_size

        def step(h, xt):
            h2 = self.gru(xt, h)
            return h2, h2

        h_final, _ = jax.lax.scan(step, jnp.zeros((B, H), z.dtype),
                                  jnp.moveaxis(z, 1, 0))
        h = jax.nn.relu(self.fc1(h_final))
        h = jax.nn.relu(self.fc2(h))
        return self.fc3(h)
