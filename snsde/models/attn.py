"""SAnD and MIAM attention models (reference-fidelity rebuilds).

Rebuilds, architecture-for-architecture:
  * SAnD (/root/reference/torch-ists/torch_ists/attn_module/SAnD_model.py
    + SAnD_modules.py:14-149): 1x1-conv input embedding -> SAnD positional
    encoding (sqrt(d)-scaled, per-pair sinusoid) -> n post-norm residual
    encoder blocks (MultiheadAttention + position-wise conv FFN d->2d->d)
    -> dense interpolation onto `factor` pseudo-points -> flatten ->
    classification linear; the `SAnD_layer` variant (SAnD_model.py:63-85)
    repeats that vector over the sequence and adds a dropout+linear
    embedding to emit a stream.
  * MIAM (/root/reference/torch-ists/torch_ists/attn_module/
    MIAM_models.py:19-380): `Multi_Duration_Pipeline_Residual` —
    obs/mask/delta linear embeddings, time-descriptor positional encoding
    from the *actual* observation times, five weight-shared encoding blocks
    (obs / mask / delta / comb / missing-comb) of cross-attention
    EncoderLayers, the attention-distillation loop, the imputation branch
    with a decoder tied at init to the observation embedding, and the
    (mean-pooled, BatchNorm'd) classification head. The torch-ists wrapper
    `MIAM_layer` (:332-380) consumes only the reconstruction `x_dd`
    (the sigmoid classification output is discarded), mapping it through
    hidden+dropout+embedding linears to the (out, hn) stream contract.

Dropout rates follow the reference defaults: MIAM attention-score dropout
0.2, feed-forward 0.1, EncoderLayer residual dropouts 0 (the reference's
constructor default); SAnD residual dropout = the registry's 0.1.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import Module, module, static_field
from ..nn.layers import BatchNorm, Linear

__all__ = ["SAnDLayer", "MIAMLayer", "MIAMPipeline", "dense_interpolation"]


def _dropout(x, rate: float, key, train: bool):
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    m = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(m, x / keep, 0.0)


# ---------------------------------------------------------------------------
# SAnD
# ---------------------------------------------------------------------------

def sand_positional_encoding(seq_len: int, d_model: int):
    """SAnD's sinusoid table (SAnD_modules.py:14-33): for even i,
    pe[pos, i] = sin(pos / 10000^(2i/d)), pe[pos, i+1] =
    cos(pos / 10000^(2(i+1)/d)) — note the per-pair exponents differ from
    the vanilla transformer table."""
    pe = np.zeros((seq_len, d_model), np.float32)
    pos = np.arange(seq_len, dtype=np.float32)[:, None]
    for i in range(0, d_model - 1, 2):
        pe[:, i] = np.sin(pos / (10000 ** ((2 * i) / d_model)))[:, 0]
        pe[:, i + 1] = np.cos(pos / (10000 ** ((2 * (i + 1)) / d_model)))[:, 0]
    if d_model % 2 == 1:
        pe[:, -1] = np.sin(pos / (10000 ** ((2 * (d_model - 1)) / d_model)))[:, 0]
    return jnp.asarray(pe)


def dense_interpolation(x, factor: int):
    """SAnD dense interpolation (SAnD_modules.py:96-121):
    [B, L, H] -> [B, M, H] with w[m, t] = (1 - |s_t - (1+m)|/M)^2,
    s_t = M * (t+1) / L."""
    B, L, H = x.shape
    t = np.arange(1, L + 1, dtype=np.float32)
    m = np.arange(1, factor + 1, dtype=np.float32)
    s = factor * t / L                                   # [L]
    w = (1.0 - np.abs(s[:, None] - m[None, :]) / factor) ** 2  # [L, M]
    w = jnp.asarray(w)
    return jnp.einsum("blh,lm->bmh", x, w)


@module
class _LayerNorm(Module):
    """torch.nn.LayerNorm: (x - mean) / sqrt(biased var + eps), affine."""

    gamma: jnp.ndarray
    beta: jnp.ndarray

    @staticmethod
    def create(dim: int, dtype=jnp.float32):
        return _LayerNorm(gamma=jnp.ones((dim,), dtype),
                          beta=jnp.zeros((dim,), dtype))

    def __call__(self, x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return self.gamma * (x - mu) * jax.lax.rsqrt(var + 1e-5) + self.beta


@module
class _MHA(Module):
    """Multi-head attention with q/k/v/out projections and optional
    key-position masking (torch nn.MultiheadAttention semantics for SAnD;
    MIAM's hand-rolled MultiHeadAttention, MIAM_models.py:240-289)."""

    wq: Linear
    wk: Linear
    wv: Linear
    wo: Linear
    num_heads: int = static_field(default=1)
    attn_dropout: float = static_field(default=0.0)

    @staticmethod
    def create(key, d_model: int, num_heads: int, attn_dropout: float = 0.0,
               dtype=jnp.float32):
        if d_model % num_heads != 0:
            num_heads = 1
        ks = jax.random.split(key, 4)
        mk = lambda i: Linear.create(ks[i], d_model, d_model, dtype=dtype)
        return _MHA(wq=mk(0), wk=mk(1), wv=mk(2), wo=mk(3),
                    num_heads=num_heads, attn_dropout=attn_dropout)

    def __call__(self, q, k, v, mask=None, *, key=None, train: bool = False):
        B, Lq, H = q.shape
        Lk = k.shape[1]
        nh = self.num_heads
        hd = H // nh
        qh = self.wq(q).reshape(B, Lq, nh, hd).transpose(0, 2, 1, 3)
        kh = self.wk(k).reshape(B, Lk, nh, hd).transpose(0, 2, 1, 3)
        vh = self.wv(v).reshape(B, Lk, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd)
        if mask is not None:
            # mask True = blocked (masked_fill(mask, -1e9))
            scores = jnp.where(mask[:, None, :, :], -1e9, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = _dropout(attn, self.attn_dropout, key, train)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H)
        return self.wo(out)


@module
class _SAnDBlock(Module):
    """EncoderBlock (SAnD_modules.py:81-94): two post-norm residual
    sublayers — MultiheadAttention, then the position-wise conv FFN
    (Conv1d(d, 2d, 1) -> ReLU -> Conv1d(2d, d, 1))."""

    attn: _MHA
    norm1: _LayerNorm
    conv1: Linear                 # 1x1 conv == per-step linear
    conv2: Linear
    norm2: _LayerNorm
    rate: float = static_field(default=0.1)

    @staticmethod
    def create(key, d_model: int, num_heads: int, rate: float = 0.1,
               dtype=jnp.float32):
        ks = jax.random.split(key, 3)
        return _SAnDBlock(
            attn=_MHA.create(ks[0], d_model, num_heads, dtype=dtype),
            norm1=_LayerNorm.create(d_model, dtype),
            conv1=Linear.create(ks[1], d_model, 2 * d_model, dtype=dtype),
            conv2=Linear.create(ks[2], 2 * d_model, d_model, dtype=dtype),
            norm2=_LayerNorm.create(d_model, dtype),
            rate=rate,
        )

    def __call__(self, x, *, key=None, train: bool = False):
        k1, k2, k3 = (jax.random.split(key, 3) if key is not None
                      else (None, None, None))
        a = self.attn(x, x, x, key=k1, train=train)
        x = self.norm1(x + _dropout(a, self.rate, k2, train))
        f = self.conv2(jax.nn.relu(self.conv1(x)))
        x = self.norm2(x + _dropout(f, self.rate, k3, train))
        return x


@module
class SAnDLayer(Module):
    """SAnD_layer (SAnD_model.py:63-85): encoder -> dense interpolation ->
    flatten -> classification linear (= `hn` vector), then the stream head
    hn-repeated-over-L -> dropout -> linear embedding -> `out`."""

    input_embedding: Linear
    blocks: Tuple[_SAnDBlock, ...]
    clf: Linear                  # flatten(M*H) -> n_class (= hidden)
    embedding: Linear            # n_class -> n_class (stream head)
    factor: int = static_field(default=16)
    seq_len: int = static_field(default=10)
    rate: float = static_field(default=0.1)

    @staticmethod
    def create(key, input_features: int, seq_len: int, hidden: int,
               n_heads: int = 4, factor: int = 16, n_layers: int = 1,
               rate: float = 0.1, dtype=jnp.float32):
        factor = min(factor, seq_len)
        ks = jax.random.split(key, 5 + n_layers)
        # ClassificationModule init: weight ~ N(0, 0.02), bias ~ N(0, 1)
        clf = Linear.create(ks[1], factor * hidden, hidden, dtype=dtype)
        clf = clf.replace(
            weight=0.02 * jax.random.normal(ks[3], clf.weight.shape, dtype),
            bias=jax.random.normal(ks[4], clf.bias.shape, dtype),
        )
        return SAnDLayer(
            input_embedding=Linear.create(ks[0], input_features, hidden,
                                          dtype=dtype),
            blocks=tuple(
                _SAnDBlock.create(ks[5 + i], hidden, n_heads, rate,
                                  dtype=dtype)
                for i in range(n_layers)
            ),
            clf=clf,
            embedding=Linear.create(ks[2], hidden, hidden, dtype=dtype),
            factor=factor,
            seq_len=seq_len,
            rate=rate,
        )

    def __call__(self, x, *, key=None, train: bool = False):
        B, L, _ = x.shape
        h = self.input_embedding(x)                      # 1x1 conv embed
        d_model = h.shape[-1]
        h = math.sqrt(d_model) * h + sand_positional_encoding(L, d_model)
        for i, blk in enumerate(self.blocks):
            h = blk(h, key=None if key is None else jax.random.fold_in(key, i),
                    train=train)
        u = dense_interpolation(h, self.factor)          # [B, M, H]
        v = self.clf(u.reshape(B, -1))                   # [B, H]
        hn = jnp.broadcast_to(v[:, None, :], (B, self.seq_len, v.shape[-1]))
        kd = None if key is None else jax.random.fold_in(key, 999)
        out = self.embedding(_dropout(hn, self.rate, kd, train))
        return out, hn


# ---------------------------------------------------------------------------
# MIAM
# ---------------------------------------------------------------------------

@module
class _MIAMNorm(Module):
    """MIAM's Norm (MIAM_models.py:228-239): alpha * (x - mean) /
    (std + eps) + bias with torch's *unbiased* std and eps added to the
    std (not the variance)."""

    alpha: jnp.ndarray
    bias: jnp.ndarray

    @staticmethod
    def create(dim: int, dtype=jnp.float32):
        return _MIAMNorm(alpha=jnp.ones((dim,), dtype),
                         bias=jnp.zeros((dim,), dtype))

    def __call__(self, x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        n = x.shape[-1]
        var = jnp.var(x, axis=-1, keepdims=True) * (n / max(n - 1, 1))
        return self.alpha * (x - mu) / (jnp.sqrt(var) + 1e-6) + self.bias


@module
class _MIAMEncoderLayer(Module):
    """EncoderLayer (MIAM_models.py:321-344): pre-norm cross-attention
    q := q + drop(attn(norm_q(q), norm_k(k), norm_k(k))) followed by
    q := q + drop(ff(norm_q_attn(q))); returns (q, k) so stacks thread the
    key stream unchanged."""

    norm_q: _MIAMNorm
    norm_k: _MIAMNorm
    norm_q_attn: _MIAMNorm
    attn: _MHA
    ff1: Linear
    ff2: Linear
    rate: float = static_field(default=0.0)   # reference default dropout=0
    ff_rate: float = static_field(default=0.1)

    @staticmethod
    def create(key, d_model: int, num_heads: int, d_ff: int,
               dtype=jnp.float32):
        ks = jax.random.split(key, 3)
        return _MIAMEncoderLayer(
            norm_q=_MIAMNorm.create(d_model, dtype),
            norm_k=_MIAMNorm.create(d_model, dtype),
            norm_q_attn=_MIAMNorm.create(d_model, dtype),
            attn=_MHA.create(ks[0], d_model, num_heads, attn_dropout=0.2,
                             dtype=dtype),
            ff1=Linear.create(ks[1], d_model, d_ff, dtype=dtype),
            ff2=Linear.create(ks[2], d_ff, d_model, dtype=dtype),
        )

    def __call__(self, q, k, mask, *, key=None, train: bool = False):
        k1, k2, k3, k4 = (jax.random.split(key, 4) if key is not None
                          else (None,) * 4)
        q2 = self.norm_q(q)
        k2n = self.norm_k(k)
        q = q + _dropout(self.attn(q2, k2n, k2n, mask, key=k1, train=train),
                         self.rate, k2, train)
        q2 = self.norm_q_attn(q)
        ff = self.ff2(_dropout(jax.nn.relu(self.ff1(q2)), self.ff_rate, k3,
                               train))
        q = q + _dropout(ff, self.rate, k4, train)
        return q, k


@module
class _EncodingBlock(Module):
    """Encoding_Block (MIAM_models.py:143-160): num_stack EncoderLayers +
    a final Norm on the query stream."""

    layers: Tuple[_MIAMEncoderLayer, ...]
    norm: _MIAMNorm

    @staticmethod
    def create(key, d_model: int, num_heads: int, d_ff: int,
               num_stack: int = 2, dtype=jnp.float32):
        ks = jax.random.split(key, num_stack)
        return _EncodingBlock(
            layers=tuple(
                _MIAMEncoderLayer.create(ks[i], d_model, num_heads, d_ff,
                                         dtype=dtype)
                for i in range(num_stack)
            ),
            norm=_MIAMNorm.create(d_model, dtype),
        )

    def __call__(self, q, k, mask, *, key=None, train: bool = False):
        for i, layer in enumerate(self.layers):
            q, k = layer(q, k, mask,
                         key=None if key is None else jax.random.fold_in(key, i),
                         train=train)
        return self.norm(q)


def miam_time_descriptor_pe(t, d_model: int, max_seq_len: int):
    """PositionalEncoder_TimeDescriptor (MIAM_models.py:176-220): sinusoid
    table from the actual observation times t [B, L]:
    pe[b, l, i] = sin/cos(t[b,l] / max_seq_len^(2*(i//2)/d_model)),
    sin for even i, cos for odd i."""
    i = np.arange(d_model)
    denom = np.power(float(max_seq_len), 2.0 * (i // 2) / d_model)
    ang = t[..., None] / jnp.asarray(denom, t.dtype)     # [B, L, d]
    even = np.arange(d_model) % 2 == 0
    return jnp.where(jnp.asarray(even), jnp.sin(ang), jnp.cos(ang))


@module
class MIAMPipeline(Module):
    """Multi_Duration_Pipeline_Residual (MIAM_models.py:19-141).

    Weight sharing is structural: the *same* obs_encoding_block instance is
    reused for the initial obs encoding, every distillation iteration, and
    both imputation-branch calls, exactly as the reference reuses its
    module. The reference also constructs a `time_encoding_block` it never
    calls in forward — omitted here (dead parameters).
    """

    obs_embed: Linear
    mask_embed: Linear
    deltas_embed: Linear
    obs_block: _EncodingBlock
    mask_block: _EncodingBlock
    deltas_block: _EncodingBlock
    comb_block: _EncodingBlock
    missing_block: _EncodingBlock
    decoder: Linear              # d_model -> input_dim, no bias (tied init)
    decoder_bias: jnp.ndarray
    clf1: Linear
    clf_norm: BatchNorm
    clf2: Linear
    n_iter: int = static_field(default=1)
    max_seq_len: int = static_field(default=10)

    @staticmethod
    def create(key, input_dim: int, d_model: int, max_length: int,
               d_ff: Optional[int] = None, num_stack: int = 2,
               num_heads: int = 1, n_iter: int = 1, dtype=jnp.float32):
        d_ff = d_ff or d_model
        ks = jax.random.split(key, 11)
        obs_embed = Linear.create(ks[0], input_dim, d_model, dtype=dtype)
        blk = lambda i: _EncodingBlock.create(ks[i], d_model, num_heads,
                                              d_ff, num_stack, dtype=dtype)
        return MIAMPipeline(
            obs_embed=obs_embed,
            mask_embed=Linear.create(ks[1], input_dim, d_model, dtype=dtype),
            deltas_embed=Linear.create(ks[2], input_dim, d_model,
                                       dtype=dtype),
            obs_block=blk(3),
            mask_block=blk(4),
            deltas_block=blk(5),
            comb_block=blk(6),
            missing_block=blk(7),
            # decoder.weight.data = obs_embed.weight.T at init, then trained
            # independently (MIAM_models.py:56-60)
            decoder=Linear(weight=jnp.transpose(obs_embed.weight),
                           bias=None),
            decoder_bias=jnp.zeros((input_dim,), dtype),
            clf1=Linear.create(ks[8], 2 * d_model, d_model, dtype=dtype),
            clf_norm=BatchNorm.create(d_model, dtype=dtype),
            clf2=Linear.create(ks[9], d_model, d_model, dtype=dtype),
            n_iter=n_iter,
            max_seq_len=max_length,
        )

    def __call__(self, data, mask, times, deltas, attn_mask, *, key=None,
                 train: bool = False):
        """data/mask/deltas [B, L, D], times [B, L], attn_mask [B, L] bool
        (True = blocked key position). Returns (x_final, missing_comb_z,
        x_dd): encoded obs stream, missingness stream, reconstruction."""
        B, L, D = data.shape
        amask = jnp.broadcast_to(attn_mask[:, None, :], (B, L, L))
        n_keys = 6 + 3 * self.n_iter + 2
        kit = iter(jax.random.split(key, n_keys)) if key is not None else None
        nk = (lambda: next(kit)) if kit is not None else (lambda: None)

        d_model = self.obs_embed.weight.shape[-1]
        pe = miam_time_descriptor_pe(times, d_model, self.max_seq_len)
        scale = math.sqrt(d_model)

        x_z = self.obs_embed(data) * scale + pe
        m = self.mask_embed(mask) * scale + pe
        d = self.deltas_embed(deltas) * scale + pe

        x_z = self.obs_block(x_z, x_z, amask, key=nk(), train=train)
        m = self.mask_block(m, m, amask, key=nk(), train=train)
        d = self.deltas_block(d, d, amask, key=nk(), train=train)
        missing_comb_z = self.missing_block(d, m, amask, key=nk(),
                                            train=train)

        # attention distillation (MIAM_models.py:103-107)
        for _ in range(self.n_iter):
            comb_z = self.comb_block(missing_comb_z, x_z, amask, key=nk(),
                                     train=train)
            x_z = self.obs_block(comb_z, x_z, amask, key=nk(), train=train)
            missing_comb_z = self.missing_block(
                missing_comb_z, missing_comb_z, amask, key=nk(), train=train
            )

        # imputation branch (MIAM_models.py:109-122)
        x_mskd = self.obs_embed(data) * scale + pe
        x_d = self.obs_block(x_mskd, x_mskd, amask, key=nk(), train=train)
        x_d = self.obs_block(x_z, x_d, amask, key=nk(), train=train)
        x_final = x_d + x_z
        x_dd = self.decoder(x_final) + self.decoder_bias

        return x_final, missing_comb_z, x_dd

    def classify(self, x_final, missing_comb_z, *, train: bool = False):
        """Classification head (MIAM_models.py:124-134): mean-pool both
        streams, concat, Linear -> BatchNorm -> Tanh -> Linear -> sigmoid.
        (The torch-ists wrapper discards this output; exposed for parity.)
        Returns (y, new_self) — BatchNorm state is threaded."""
        x_avg = jnp.mean(x_final, axis=1)
        m_avg = jnp.mean(missing_comb_z, axis=1)
        cat = jnp.concatenate([x_avg, m_avg], axis=-1)
        h = self.clf1(cat)
        h, norm = self.clf_norm(h, train=train)
        y = jax.nn.sigmoid(self.clf2(jnp.tanh(h)))
        return y, self.replace(clf_norm=norm)


@module
class MIAMLayer(Module):
    """MIAM_layer (MIAM_models.py:347-380): runs the pipeline, keeps the
    reconstruction x_dd, and maps it hidden -> dropout -> embedding to the
    (out, hn) stream contract. attn_mask = (delta[..., 0] == 0) with the
    first step always attendable (:366-368)."""

    encoder: MIAMPipeline
    hidden: Linear
    embedding: Linear
    rate: float = static_field(default=0.1)

    @staticmethod
    def create(key, input_dim: int, hidden: int, seq_len: int,
               num_stack: int = 2, num_heads: int = 1, n_iter: int = 1,
               n_layers: int = 1, rate: float = 0.1, dtype=jnp.float32):
        # n_layers accepted for registry-signature compatibility; the
        # reference fixes the stack depth via num_stack (default 2).
        ks = jax.random.split(key, 3)
        return MIAMLayer(
            encoder=MIAMPipeline.create(ks[0], input_dim, hidden, seq_len,
                                        num_stack=num_stack,
                                        num_heads=num_heads, n_iter=n_iter,
                                        dtype=dtype),
            hidden=Linear.create(ks[1], input_dim, hidden, dtype=dtype),
            embedding=Linear.create(ks[2], hidden, hidden, dtype=dtype),
            rate=rate,
        )

    def __call__(self, x, mask, delta, seq_ts, *, key=None,
                 train: bool = False):
        """x/mask/delta [B, L, D], seq_ts [B, L] -> (out, hn) streams."""
        attn_mask = delta[..., 0] == 0.0
        attn_mask = attn_mask.at[:, 0].set(False)
        k1, k2 = (jax.random.split(key) if key is not None else (None, None))
        _, _, x_dd = self.encoder(x, mask, seq_ts, delta, attn_mask,
                                  key=k1, train=train)
        hn = self.hidden(x_dd)
        out = self.embedding(_dropout(hn, self.rate, k2, train))
        return out, hn
