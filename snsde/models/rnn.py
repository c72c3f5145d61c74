"""Discrete-time baselines: observation-gated GRUs (GRU-dt / GRU-D /
ODE-RNN) and plain sequence models (RNN/LSTM/GRU/BiLSTM/CNN/Transformer).

Rebuilds the reference baselines
(/root/reference/torch-ists/torch_ists/module/other.py:14-138 — the
NeuralCDE-repo `_GRU` family — and the discrete models dispatched from
torch-ists/_layer.py:113-153). The Python loop over time becomes one
`lax.scan`; the observation-gating (update h only where a channel was
observed, otherwise accumulate elapsed time) becomes a `jnp.where` mask —
identical semantics, single compiled program.

Input layout (matching the reference's intensity-augmented stream,
other.py:52-60): channel 0 = time, channels 1..1+K = cumulative intensity,
channels 1+K.. = K values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Module, module, static_field
from ..nn.layers import GRUCell, Linear, LSTMCell, RNNCell
from ..ops.interp import CubicPath

__all__ = ["GRUdt", "GRUD", "ODERNN", "SeqRNN", "SeqTransformer", "SeqCNN"]


def _fused_rnn_enabled(hidden=None):
    """Shared gate for the fused recurrent-kernel dispatch sites
    (SeqRNN, the observation-GRU family, mtan._bigru).

    `hidden` adds the measured perf gate: the fused GRU/LSTM kernels only
    beat the XLA scan path once the hidden width reaches MXU-tile scale
    (round-4 v5e gate sweeps, BENCH_GATE.json + BENCH_GATE2.json: H=128
    wins 1.28x GRU / 1.13x LSTM / 1.29x PLSTM; H=64 loses 0.76x GRU /
    0.67x LSTM; H=32 loses 0.51-0.58x). Dispatch defaults to fused at
    H >= SNSDE_FUSED_RNN_MIN_H (default 128 — the only measured winning
    width; the crossover lies in (64, 128)); set it to 0 to force the
    kernel at any width (parity tests call the kernels directly and are
    unaffected)."""
    import os

    if (jax.default_backend() != "tpu"
            or os.environ.get("SNSDE_NO_FUSED", "0") == "1"):
        return False
    if hidden is not None:
        min_h = int(os.environ.get("SNSDE_FUSED_RNN_MIN_H", "128"))
        if hidden < min_h:
            return False
    return True


def last_observation_excl(observed, idx_dtype=None):
    """Exclusive last-observation index along axis 0: out[t] = max index
    s < t with observed[s] (or -1). The data-only closed form (running
    max over masked indices) that lets observation recurrences hoist out
    of the fused kernels — shared by the GRU-dt/GRU-D dt_acc and
    GRUD-full forward-fill precomputes."""
    L = observed.shape[0]
    shape = (L,) + (1,) * (observed.ndim - 1)
    idx = jnp.arange(L).reshape(shape)
    marker = jnp.where(observed, idx, -1)
    last_incl = jax.lax.associative_scan(jnp.maximum, marker, axis=0)
    return jnp.concatenate(
        [jnp.full_like(marker[:1], -1), last_incl[:-1]], axis=0)


def _values_from_spline(times, coeffs):
    """Evaluate the control spline on the grid -> [B, L, C] (the reference
    evaluates the interpolant at every knot, other.py:50-51)."""
    path = CubicPath(coeffs, times)
    ts = jnp.asarray(times)
    vals = jax.vmap(path.evaluate)(ts)       # [L, B, C]
    return jnp.moveaxis(vals, 0, 1)


@module
class _ObservationGRUBase(Module):
    gru: GRUCell
    linear: Linear
    input_channels: int = static_field(default=3)
    use_intensity: bool = static_field(default=False)

    def evolve(self, h, time_diff):
        return h

    def _decay_rows(self, time_diffs):
        """Per-step hidden-decay rows [L, H] for the fused kernel, or None
        when `evolve` is the identity / not row-expressible."""
        return None

    def _fused_path(self, X, time_diffs, z0, K):
        """Run the observation recurrence through the fused GRU kernel
        (TPU; kernels/fused_rnn.py) when the step decomposes into
        data-only precomputes + (decay row, masked GRU update). The
        dt_acc recurrence is data-only, so it closes over an exclusive
        prefix sum + running last-observation max instead of a scan.
        Returns hs [L, B, H] or None (scan fallback)."""
        if not _fused_rnn_enabled(self.gru.hidden_size):
            return None
        if type(self) not in (GRUdt, GRUD, ODERNN):
            return None
        from ..kernels.fused_em import is_batched
        from ..kernels.fused_rnn import fused_gru_scan, supports_fused_gru

        if not supports_fused_gru(self.gru) or is_batched(self, X, z0):
            return None

        xs = jnp.moveaxis(X, 1, 0)                       # [L, B, C]
        observed = (jnp.max(xs[:, :, 1:1 + K], axis=-1) > 0.5)   # [L, B]
        delta = xs[:, :, 0]                              # [L, B]
        # dt_acc before step t = sum of deltas since the last observation
        pcs = jnp.cumsum(delta, axis=0) - delta          # exclusive prefix
        last_excl = last_observation_excl(observed)
        # dt_acc_t = pcs[t] - pcs[last+1]  (pcs[s+1] = sum of deltas up to
        # and INCLUDING the last observed step s; last+1 <= L-1 always
        # since last < t <= L-1, and last = -1 indexes pcs[0] = 0)
        dt_acc = pcs - jnp.take_along_axis(pcs, last_excl + 1, axis=0)
        inp = xs if self.use_intensity else xs[:, :, 1 + K:]
        inp = jnp.concatenate(
            [inp[:, :, :1] + dt_acc[:, :, None], inp[:, :, 1:]], axis=-1)
        hdec = self._decay_rows(time_diffs)              # [L, H] | None
        ode_layers = tdif = None
        ode_steps = 1
        if isinstance(self, ODERNN):
            # euler-evolve by the MLP field IN-kernel (n layers, tanh
            # inners + linear out — matches _func/evolve exactly)
            from ..kernels.fused_rnn import _MAX_H

            hh = (self.f_layers[0].weight.shape[1]
                  if len(self.f_layers) > 1 else 0)
            if hh > _MAX_H:
                return None
            ode_layers = self.f_layers
            tdif = time_diffs
            ode_steps = self.ode_steps
        return fused_gru_scan(self.gru, inp, h0=z0,
                              obs=observed.astype(xs.dtype), hdec=hdec,
                              ode_layers=ode_layers, tdif=tdif,
                              ode_steps=ode_steps)

    def __call__(self, times, coeffs, final_index, *, z0=None,
                 stream: bool = False, key=None, train: bool = False):
        times = jnp.asarray(times)
        X = _values_from_spline(times, coeffs)          # [B, L, C]
        # the observation-GRU family declares an odd [t ‖ K intens ‖ K
        # vals] width; a wider (even) coeff stream's extra trailing
        # channel is IGNORED (registry.py gru-dt/gru-d/ode-rnn contract —
        # the reference's degenerate behavior on non-intensity coeffs)
        X = X[..., : self.input_channels]
        K = (self.input_channels - 1) // 2
        # cumulative intensity -> per-step observation indicator
        intens = X[:, :, 1 : 1 + K]
        intens = jnp.concatenate(
            [intens[:, :1], intens[:, 1:] - intens[:, :-1]], axis=1
        )
        X = X.at[:, :, 1 : 1 + K].set(intens)
        # times -> delta times in channel 0
        dt_chan = jnp.concatenate(
            [X[:, :1, 0] - times[0], X[:, 1:, 0] - times[:-1][None]], axis=1
        )
        X = X.at[:, :, 0].set(dt_chan)

        B = X.shape[0]
        H = self.gru.hidden_size
        if z0 is None:
            z0 = jnp.zeros((B, H), X.dtype)

        time_diffs = jnp.concatenate(
            [jnp.zeros((1,), times.dtype), times[1:] - times[:-1]]
        )

        hs_fused = self._fused_path(X, time_diffs, z0, K)
        if hs_fused is not None:
            out = jnp.moveaxis(hs_fused, 0, 1)           # [B, L, H]
            if stream:
                final = out
            else:
                idx = jnp.asarray(final_index)
                final = jnp.take_along_axis(out, idx[:, None, None],
                                            axis=1)[:, 0]
            return self.linear(final), out

        def step(carry, xs):
            h, dt_acc = carry
            Xi, tdiff = xs                               # [B, C], scalar
            h = self.evolve(h, tdiff)
            observed = jnp.max(Xi[:, 1 : 1 + K], axis=1) > 0.5
            inp = Xi if self.use_intensity else Xi[:, 1 + K :]
            # accumulated unobserved time is added to the first input
            # channel (reference _step, other.py:38-45)
            inp = jnp.concatenate(
                [inp[:, :1] + dt_acc[:, None], inp[:, 1:]], axis=-1
            )
            new_h = self.gru(inp, h)
            h = jnp.where(observed[:, None], new_h, h)
            dt_acc = jnp.where(observed, 0.0, dt_acc + Xi[:, 0])
            return (h, dt_acc), h

        init = (z0, jnp.zeros((B,), X.dtype))
        (_, _), hs = jax.lax.scan(
            step, init, (jnp.moveaxis(X, 1, 0), time_diffs)
        )
        out = jnp.moveaxis(hs, 0, 1)                     # [B, L, H]
        if stream:
            final = out
        else:
            idx = jnp.asarray(final_index)
            final = jnp.take_along_axis(out, idx[:, None, None],
                                        axis=1)[:, 0]
        return self.linear(final), out


@module
class GRUdt(_ObservationGRUBase):
    """GRU on (Δt, observed values); no evolution between observations
    (reference GRU_dt)."""

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               use_intensity=False, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        K = (input_channels - 1) // 2
        gru_in = input_channels if use_intensity else K
        return GRUdt(
            gru=GRUCell.create(k1, gru_in, hidden_channels, dtype),
            linear=Linear.create(k2, hidden_channels, output_channels,
                                 dtype=dtype),
            input_channels=input_channels,
            use_intensity=use_intensity,
        )


@module
class GRUD(_ObservationGRUBase):
    """GRU-D: exponential hidden-state decay over elapsed time
    (reference GRU_D, other.py:96-104)."""

    decay: Linear = None

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               use_intensity=False, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        K = (input_channels - 1) // 2
        gru_in = input_channels if use_intensity else K
        return GRUD(
            gru=GRUCell.create(k1, gru_in, hidden_channels, dtype),
            linear=Linear.create(k2, hidden_channels, output_channels,
                                 dtype=dtype),
            decay=Linear.create(k3, 1, hidden_channels, dtype=dtype),
            input_channels=input_channels,
            use_intensity=use_intensity,
        )

    def evolve(self, h, time_diff):
        rate = jax.nn.relu(self.decay(jnp.reshape(time_diff, (1,))))
        return h * jnp.exp(-rate)

    def _decay_rows(self, time_diffs):
        # [L, H] rows for the fused kernel — same math as evolve, batched
        # over steps (grads to the decay net ride this precompute)
        rate = jax.nn.relu(self.decay(time_diffs[:, None]))
        return jnp.exp(-rate)


@module
class ODERNN(_ObservationGRUBase):
    """ODE-RNN: hidden state evolves by an MLP ODE (euler, one step per
    interval — the reference integrates with euler over [0, Δt],
    other.py:121-138)."""

    f_layers: Tuple[Linear, ...] = ()
    ode_steps: int = static_field(default=1)

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               hidden_hidden_channels=None, num_hidden_layers=1,
               use_intensity=False, ode_steps: int = 1, dtype=jnp.float32):
        hh = hidden_hidden_channels or hidden_channels
        ks = jax.random.split(key, num_hidden_layers + 4)
        K = (input_channels - 1) // 2
        gru_in = input_channels if use_intensity else K
        layers = [Linear.create(ks[0], hidden_channels, hh, dtype=dtype)]
        for i in range(num_hidden_layers - 1):
            layers.append(Linear.create(ks[i + 1], hh, hh, dtype=dtype))
        layers.append(Linear.create(ks[num_hidden_layers], hh,
                                    hidden_channels, dtype=dtype))
        return ODERNN(
            gru=GRUCell.create(ks[-2], gru_in, hidden_channels, dtype),
            linear=Linear.create(ks[-1], hidden_channels, output_channels,
                                 dtype=dtype),
            f_layers=tuple(layers),
            input_channels=input_channels,
            use_intensity=use_intensity,
            ode_steps=ode_steps,
        )

    def _func(self, h):
        x = h
        for lin in self.f_layers[:-1]:
            x = jnp.tanh(lin(x))
        return self.f_layers[-1](x)

    def evolve(self, h, time_diff):
        # fixed euler steps over the interval
        dt = time_diff / self.ode_steps
        for _ in range(self.ode_steps):
            h = h + dt * self._func(h)
        return h


# ---------------------------------------------------------------------------
# Plain sequence baselines (torch-ists registry: rnn/lstm/gru/bilstm/cnn/
# transformer over [B, L, D] value streams, _layer.py:113-153)
# ---------------------------------------------------------------------------


@module
class SeqRNN(Module):
    """Stacked RNN/GRU/LSTM (+ optional bidirectional) over a value
    stream; returns (per-step readout, stream).

    Matches torch nn.RNN/LSTM/GRU constructor semantics (reference
    torch-ists _layer.py:135-146): `rnn` is a tanh Elman cell (NOT a
    GRU), `num_layers` stacks cells with inter-layer dropout (applied to
    every layer's output except the last, train-time only — torch
    ignores dropout when num_layers == 1), and bidirectional layers run
    `hidden_per_dir` wide per direction with their outputs concatenated
    before the next layer (the reference's `bilstm` passes
    int(hidden/2), _layer.py:152-153)."""

    cells: Tuple[Module, ...]
    cells_bwd: Optional[Tuple[Module, ...]]
    embed: Linear
    linear: Linear
    kind: str = static_field(default="gru")
    dropout: float = static_field(default=0.0)

    # round-2 call sites (mtan._bigru helpers, tests) used single-cell
    # attribute names; keep them as views of layer 0
    @property
    def cell(self):
        return self.cells[0]

    @property
    def cell_bwd(self):
        return self.cells_bwd[0] if self.cells_bwd else None

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               kind: str = "gru", bidirectional: bool = False,
               num_layers: int = 1, dropout: float = 0.0,
               hidden_per_dir: Optional[int] = None, dtype=jnp.float32):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        mk = {"gru": GRUCell.create, "lstm": LSTMCell.create,
              "rnn": RNNCell.create}[kind]
        Hd = hidden_per_dir or hidden_channels
        ndir = 2 if bidirectional else 1
        # layer 0 consumes the embedded stream (width hidden_channels);
        # deeper layers consume the previous layer's ndir * Hd outputs
        fwd_keys = jax.random.split(k1, num_layers)
        bwd_keys = jax.random.split(k4, num_layers)
        cells, cells_bwd = [], []
        for li in range(num_layers):
            in_w = hidden_channels if li == 0 else ndir * Hd
            cells.append(mk(fwd_keys[li], in_w, Hd, dtype))
            if bidirectional:
                cells_bwd.append(mk(bwd_keys[li], in_w, Hd, dtype))
        return SeqRNN(
            cells=tuple(cells),
            cells_bwd=tuple(cells_bwd) if bidirectional else None,
            embed=Linear.create(k2, input_channels, hidden_channels,
                                dtype=dtype),
            linear=Linear.create(k3, ndir * Hd, output_channels,
                                 dtype=dtype),
            kind=kind,
            dropout=dropout,
        )

    def _run(self, cell, xs, B, H, reverse=False):
        if isinstance(cell, LSTMCell):
            if _fused_rnn_enabled(H):
                from ..kernels.fused_em import is_batched
                from ..kernels.fused_rnn import (fused_lstm_scan,
                                                 supports_fused_lstm)

                if supports_fused_lstm(cell) and not is_batched(cell, xs):
                    return fused_lstm_scan(cell, xs, reverse=reverse)
            init = (jnp.zeros((B, H)), jnp.zeros((B, H)))

            def step(carry, x):
                h, carry = cell(x, carry)
                return carry, h
        elif isinstance(cell, GRUCell):
            if _fused_rnn_enabled(H):
                from ..kernels.fused_em import is_batched
                from ..kernels.fused_rnn import (fused_gru_scan,
                                                 supports_fused_gru)

                if supports_fused_gru(cell) and not is_batched(cell, xs):
                    return fused_gru_scan(cell, xs, reverse=reverse)
            init = jnp.zeros((B, H))

            def step(h, x):
                h2 = cell(x, h)
                return h2, h2
        else:                            # tanh Elman cell
            init = jnp.zeros((B, H))

            def step(h, x):
                h2 = cell(x, h)
                return h2, h2

        _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
        return hs

    def __call__(self, x, *, key=None, train: bool = False):
        """x: [B, L, D] value stream -> (out [B, L, out], stream)."""
        e = self.embed(x)
        xs = jnp.moveaxis(e, 1, 0)
        B = e.shape[0]
        n_layers = len(self.cells)
        for li in range(n_layers):
            cell = self.cells[li]
            H = cell.hidden_size
            hs = self._run(cell, xs, B, H)
            if self.cells_bwd is not None:
                hs_b = self._run(self.cells_bwd[li], xs, B, H, reverse=True)
                hs = jnp.concatenate([hs, hs_b], axis=-1)
            if (li < n_layers - 1 and self.dropout > 0.0 and train
                    and key is not None):
                keep = 1.0 - self.dropout
                mask = jax.random.bernoulli(
                    jax.random.fold_in(key, li), keep, hs.shape)
                hs = jnp.where(mask, hs / keep, 0.0)
            xs = hs
        stream = jnp.moveaxis(hs, 0, 1)
        return self.linear(stream), stream


@module
class SeqCNN(Module):
    """1-D conv stack over the time axis (reference cnn{-3,-5,-7})."""

    kernels: Tuple[jnp.ndarray, ...]
    biases: Tuple[jnp.ndarray, ...]
    linear: Linear
    kernel_size: int = static_field(default=3)

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               kernel_size: int = 3, depth: int = 2, dtype=jnp.float32):
        ks = jax.random.split(key, depth + 1)
        kernels, biases = [], []
        c_in = input_channels
        for i in range(depth):
            fan_in = c_in * kernel_size
            k = 1.0 / jnp.sqrt(fan_in)
            kernels.append(jax.random.uniform(
                ks[i], (kernel_size, c_in, hidden_channels), dtype, -k, k))
            biases.append(jnp.zeros((hidden_channels,), dtype))
            c_in = hidden_channels
        return SeqCNN(
            kernels=tuple(kernels),
            biases=tuple(biases),
            linear=Linear.create(ks[-1], hidden_channels, output_channels,
                                 dtype=dtype),
            kernel_size=kernel_size,
        )

    def __call__(self, x, *, key=None, train: bool = False):
        h = x  # [B, L, C]
        for kern, b in zip(self.kernels, self.biases):
            h = jax.lax.conv_general_dilated(
                h, kern, window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b
            h = jax.nn.relu(h)
        return self.linear(h), h


@module
class SeqTransformer(Module):
    """Encoder-only transformer with sinusoidal positions (reference
    `transformer` baseline, _layer.py:53-73 PositionalEncoding + torch
    TransformerEncoder)."""

    embed: Linear
    wq: Tuple[Linear, ...]
    wk: Tuple[Linear, ...]
    wv: Tuple[Linear, ...]
    wo: Tuple[Linear, ...]
    ff1: Tuple[Linear, ...]
    ff2: Tuple[Linear, ...]
    linear: Linear
    num_heads: int = static_field(default=4)
    num_layers: int = static_field(default=2)

    @staticmethod
    def create(key, input_channels, hidden_channels, output_channels,
               num_heads: int = 4, num_layers: int = 2, dtype=jnp.float32):
        n = num_layers
        ks = jax.random.split(key, 6 * n + 2)
        mk = lambda i, a, b: Linear.create(ks[i], a, b, dtype=dtype)
        H = hidden_channels
        return SeqTransformer(
            embed=mk(0, input_channels, H),
            wq=tuple(mk(1 + 6 * i, H, H) for i in range(n)),
            wk=tuple(mk(2 + 6 * i, H, H) for i in range(n)),
            wv=tuple(mk(3 + 6 * i, H, H) for i in range(n)),
            wo=tuple(mk(4 + 6 * i, H, H) for i in range(n)),
            ff1=tuple(mk(5 + 6 * i, H, 4 * H) for i in range(n)),
            ff2=tuple(mk(6 + 6 * i, 4 * H, H) for i in range(n)),
            linear=mk(6 * n + 1, H, output_channels),
            num_heads=num_heads,
            num_layers=num_layers,
        )

    @staticmethod
    def _positions(L, H, dtype):
        pos = jnp.arange(L, dtype=dtype)[:, None]
        i = jnp.arange(0, H, 2, dtype=dtype)[None, :]
        angle = pos / jnp.power(10000.0, i / H)
        pe = jnp.zeros((L, H), dtype)
        pe = pe.at[:, 0::2].set(jnp.sin(angle))
        pe = pe.at[:, 1::2].set(jnp.cos(angle[:, : (H + 1) // 2]))
        return pe

    def _norm(self, x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5)

    def __call__(self, x, *, key=None, train: bool = False):
        h = self.embed(x)                          # [B, L, H]
        B, L, H = h.shape
        h = h + self._positions(L, H, h.dtype)
        nh = self.num_heads
        hd = H // nh
        for li in range(self.num_layers):
            q = self.wq[li](h).reshape(B, L, nh, hd)
            k = self.wk[li](h).reshape(B, L, nh, hd)
            v = self.wv[li](h).reshape(B, L, nh, hd)
            att = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(hd)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bhlm,bmhd->blhd", att, v).reshape(B, L, H)
            h = self._norm(h + self.wo[li](o))
            ff = self.ff2[li](jax.nn.relu(self.ff1[li](h)))
            h = self._norm(h + ff)
        return self.linear(h), h
