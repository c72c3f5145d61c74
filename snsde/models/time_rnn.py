"""Time-aware RNNs: TLSTM, PLSTM (phased), TGLSTM (time-gated), GRUD-full,
ODE-LSTM — the `module/` family of the reference
(/root/reference/torch-ists/torch_ists/module/{tlstm,plstm,tglstm,grud,
odelstm}.py, ~1,100 LoC of per-step Python loops), rebuilt as `lax.scan`
cells.

Semantics preserved per cell:
  * TLSTM (tlstm.py:23-71): memory decomposition — short-term component
    tanh(W_d c) is discounted by the elapsed-time factor before the
    standard gate update.
  * PLSTM (plstm.py:63-190): per-unit rhythmic time gate from learned
    (period, shift, on-ratio); openness k(t) gates the (c, h) update with
    leak OFF_SLOPE=1e-3 in the closed phase. The custom fmod backward
    (GradMod) is unnecessary here — JAX differentiates mod directly with
    the same convention.
  * TGLSTM (tglstm.py:66-127): input/forget/output gates each multiplied
    by a sigmoid time-gate computed from the time input.
  * GRUD-full (grud.py:16-267): input decay toward empirical means +
    hidden decay, masked updates.
  * ODE-LSTM (odelstm.py:13-137): LSTM update at observations, output
    state evolved by a small MLP ODE between them (euler/heun/rk4 fixed
    steps).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Module, module, static_field
from ..nn.layers import Linear, LSTMCell

__all__ = ["TLSTM", "PLSTM", "TGLSTM", "GRUDFull", "ODELSTM"]

_OFF_SLOPE = 1e-3


@module
class TLSTMCell(Module):
    W_all: Linear    # h -> 4H
    U_all: Linear    # x -> 4H
    W_d: Linear      # c -> H

    @staticmethod
    def create(key, input_size, hidden_size, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return TLSTMCell(
            W_all=Linear.create(k1, hidden_size, 4 * hidden_size, dtype=dtype),
            U_all=Linear.create(k2, input_size, 4 * hidden_size, dtype=dtype),
            W_d=Linear.create(k3, hidden_size, hidden_size, dtype=dtype),
        )

    @property
    def hidden_size(self):
        return self.W_d.out_features

    def __call__(self, x, t_elapsed, state):
        h, c = state
        H = self.hidden_size
        c_short = jnp.tanh(self.W_d(c))
        c_short_dis = c_short * t_elapsed[:, None]
        c_adj = (c - c_short) + c_short_dis
        outs = self.W_all(h) + self.U_all(x)
        f = jax.nn.sigmoid(outs[..., :H])
        i = jax.nn.sigmoid(outs[..., H:2 * H])
        o = jax.nn.sigmoid(outs[..., 2 * H:3 * H])
        c_tmp = jax.nn.sigmoid(outs[..., 3 * H:])
        c = f * c_adj + i * c_tmp
        h = o * jnp.tanh(c)
        return h, (h, c)


@module
class PLSTMCell(Module):
    W: jnp.ndarray       # [in, 4H]
    U: jnp.ndarray       # [H, 4H]
    bias: jnp.ndarray
    periods: jnp.ndarray  # [H]
    shifts: jnp.ndarray
    on_end: jnp.ndarray

    @staticmethod
    def create(key, input_size, hidden_size, dtype=jnp.float32):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        std = 1.0 / jnp.sqrt(hidden_size)
        u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -std, std)
        return PLSTMCell(
            W=u(k1, (input_size, 4 * hidden_size)),
            U=u(k2, (hidden_size, 4 * hidden_size)),
            bias=u(k3, (4 * hidden_size,)),
            periods=jnp.exp(
                (3.0 - 1.0) * jax.random.uniform(k4, (hidden_size,), dtype)
                + 1.0
            ),
            shifts=jax.random.uniform(k5, (hidden_size,), dtype, 0.0, 100.0),
            on_end=jnp.full((hidden_size,), 0.05, dtype),
        )

    @property
    def hidden_size(self):
        return self.U.shape[0]

    def _time_gate(self, t):
        """t [B] -> openness k [B, H] (plstm.py:105-130)."""
        period = jnp.abs(self.periods)[None, :]
        shift = self.shifts[None, :]
        on_mid = jnp.abs(self.on_end)[None, :] * 0.5 * period
        on_end = jnp.abs(self.on_end)[None, :] * period
        in_cycle = jnp.mod(t[:, None] + shift, period)
        up = in_cycle <= on_mid
        down = (in_cycle > on_mid) & (in_cycle <= on_end)
        k = jnp.where(
            up,
            in_cycle / on_mid,
            jnp.where(
                down,
                (on_end - in_cycle) / on_mid,
                _OFF_SLOPE * in_cycle,
            ),
        )
        return k

    def __call__(self, x, t_abs, state):
        h, c = state
        H = self.hidden_size
        g = x @ self.W + h @ self.U + self.bias
        i = jax.nn.sigmoid(g[..., :H])
        f = jax.nn.sigmoid(g[..., H:2 * H])
        gg = jnp.tanh(g[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(g[..., 3 * H:])
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        k = self._time_gate(t_abs)
        c = k * c_new + (1.0 - k) * c
        h = k * h_new + (1.0 - k) * h
        return h, (h, c)


@module
class TGLSTMCell(Module):
    weights: Linear      # [H+in] -> 4H
    weight_t: Linear     # time -> 3H

    @staticmethod
    def create(key, input_size, hidden_size, time_size=1, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return TGLSTMCell(
            weights=Linear.create(k1, hidden_size + input_size,
                                  4 * hidden_size, dtype=dtype),
            weight_t=Linear.create(k2, time_size, 3 * hidden_size,
                                   dtype=dtype),
        )

    @property
    def hidden_size(self):
        return self.weights.out_features // 4

    def __call__(self, x, t, state):
        h, c = state
        H = self.hidden_size
        g = self.weights(jnp.concatenate([h, x], axis=-1))
        gt = self.weight_t(t[:, None] if t.ndim == 1 else t)
        i = jax.nn.sigmoid(g[..., :H]) * jax.nn.sigmoid(gt[..., :H])
        f = jax.nn.sigmoid(g[..., H:2 * H]) * jax.nn.sigmoid(
            gt[..., H:2 * H]
        )
        cand = jnp.tanh(g[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(g[..., 3 * H:]) * jax.nn.sigmoid(gt[..., 2 * H:])
        c = f * c + i * cand
        h = o * jnp.tanh(c)
        return h, (h, c)


def _fused_time_lstm(cell, xs, ts, cell_kind: str):
    """Route one TLSTM/PLSTM/TGLSTM layer through the fused LSTM kernel:
    each is an LSTM plus a DATA-only time modulation — PLSTM's phased
    openness k(t) becomes the kernel's sel stream (applied to both
    carries), TGLSTM's sigmoid time-gates the tg gate-modifier stream,
    and TLSTM's memory decomposition the in-kernel c-adjustment with the
    elapsed-time tel stream. Grads to the time parameters ride the
    stream precomputes. Returns hs [L, B, H] or None (scan fallback)."""
    import types

    from .rnn import _fused_rnn_enabled

    # Round-5 fidelity-matched sweep (BENCH_GATE_R5.json): the
    # stream-carrying time-aware LSTM kernels LOSE to the scan path at
    # every measured shape once the scan runs at the library-default
    # HIGHEST precision (plstm H=128: 0.90x bf16x3, and the exact-f32
    # arm fails to compile on v5e) — the round-4 1.29x win was against
    # the platform-bf16 scan. Default to scan; SNSDE_FUSED_TIME_RNN=1
    # re-enables the kernels (parity tests call them directly).
    import os as _os

    if _os.environ.get("SNSDE_FUSED_TIME_RNN", "0") != "1":
        return None
    if not _fused_rnn_enabled(cell.hidden_size) or cell_kind not in (
            "plstm", "tglstm", "tlstm"):
        return None
    from ..kernels.fused_em import is_batched
    from ..kernels.fused_rnn import fused_lstm_scan, supports_fused_lstm

    if is_batched(cell, xs, ts):
        return None
    H = cell.hidden_size
    L = xs.shape[0]
    if cell_kind == "tlstm":
        # W_all/U_all biases both add into the gates: fold U_all's into
        # the hoisted gi, W_all's into the kernel's bhh
        adapter = types.SimpleNamespace(
            w_ih=cell.U_all.weight, w_hh=cell.W_all.weight,
            b_ih=cell.U_all.bias, b_hh=cell.W_all.bias, hidden_size=H)
        if not supports_fused_lstm(adapter):
            return None
        return fused_lstm_scan(adapter, xs, tlstm=cell.W_d, tel=ts)
    if cell_kind == "plstm":
        adapter = types.SimpleNamespace(
            w_ih=cell.W, w_hh=cell.U, b_ih=cell.bias,
            b_hh=jnp.zeros((4 * H,), cell.bias.dtype), hidden_size=H)
        if not supports_fused_lstm(adapter):
            return None
        sel = cell._time_gate(ts.reshape(-1)).reshape(L, ts.shape[1], H)
        return fused_lstm_scan(adapter, xs, sel=sel)
    w = cell.weights.weight
    adapter = types.SimpleNamespace(
        w_ih=w[H:], w_hh=w[:H], b_ih=cell.weights.bias,
        b_hh=jnp.zeros((4 * H,), w.dtype), hidden_size=H)
    if not supports_fused_lstm(adapter):
        return None
    tg = jax.nn.sigmoid(cell.weight_t(ts[:, :, None]))   # [L, B, 3H]
    return fused_lstm_scan(adapter, xs, tg=tg)


def _stack_scan(cells, xs, ts, cell_kind: str):
    """Run stacked time-aware cells over [L, B, ·] inputs."""
    out = xs
    finals = []
    for cell in cells:
        B = out.shape[1]
        H = cell.hidden_size

        hs_fused = _fused_time_lstm(cell, out, ts, cell_kind)
        if hs_fused is not None:
            out = hs_fused
            # CONTRACT NOTE: on the fused TPU route the per-layer final
            # CELL state is None (the kernel exposes only h; every
            # in-repo consumer discards finals). A consumer needing c
            # should run with SNSDE_NO_FUSED=1 — the None fails loudly
            # rather than returning a silently non-differentiable value.
            finals.append((hs_fused[-1], None))
            continue

        init = (jnp.zeros((B, H), out.dtype), jnp.zeros((B, H), out.dtype))

        def step(state, inp):
            x_t, t_t = inp
            h, state = cell(x_t, t_t, state)
            return state, h

        state, hs = jax.lax.scan(step, init, (out, ts))
        out = hs
        finals.append(state)
    return out, finals


@module
class TLSTM(Module):
    """Stacked TLSTM: forward((x [B,L,D], elapsed [B,L])) -> stream."""

    cells: Tuple[TLSTMCell, ...]

    @staticmethod
    def create(key, input_size, hidden_size, num_layers=1, dtype=jnp.float32):
        ks = jax.random.split(key, num_layers)
        cells = [TLSTMCell.create(ks[0], input_size, hidden_size, dtype)]
        for i in range(1, num_layers):
            cells.append(TLSTMCell.create(ks[i], hidden_size, hidden_size,
                                          dtype))
        return TLSTM(cells=tuple(cells))

    def __call__(self, x, timestamps):
        xs = jnp.moveaxis(x, 1, 0)
        ts = jnp.moveaxis(timestamps, 1, 0)
        out, finals = _stack_scan(self.cells, xs, ts, "tlstm")
        return jnp.moveaxis(out, 0, 1), finals


@module
class PLSTM(Module):
    cells: Tuple[PLSTMCell, ...]

    @staticmethod
    def create(key, input_size, hidden_size, num_layers=1, dtype=jnp.float32):
        ks = jax.random.split(key, num_layers)
        cells = [PLSTMCell.create(ks[0], input_size, hidden_size, dtype)]
        for i in range(1, num_layers):
            cells.append(PLSTMCell.create(ks[i], hidden_size, hidden_size,
                                          dtype))
        return PLSTM(cells=tuple(cells))

    def __call__(self, x, timestamps):
        xs = jnp.moveaxis(x, 1, 0)
        ts = jnp.moveaxis(timestamps, 1, 0)
        out, finals = _stack_scan(self.cells, xs, ts, "plstm")
        return jnp.moveaxis(out, 0, 1), finals


@module
class TGLSTM(Module):
    cells: Tuple[TGLSTMCell, ...]

    @staticmethod
    def create(key, input_size, hidden_size, num_layers=1, dtype=jnp.float32):
        ks = jax.random.split(key, num_layers)
        cells = [TGLSTMCell.create(ks[0], input_size, hidden_size,
                                   dtype=dtype)]
        for i in range(1, num_layers):
            cells.append(TGLSTMCell.create(ks[i], hidden_size, hidden_size,
                                           dtype=dtype))
        return TGLSTM(cells=tuple(cells))

    def __call__(self, x, timestamps):
        xs = jnp.moveaxis(x, 1, 0)
        ts = jnp.moveaxis(timestamps, 1, 0)
        out, finals = _stack_scan(self.cells, xs, ts, "tglstm")
        return jnp.moveaxis(out, 0, 1), finals


@module
class GRUDFull(Module):
    """GRU-D with trainable input decay toward empirical means and hidden
    decay (reference module/grud.py:16-267).

    forward(x, mask, delta) with x [B,L,D], mask [B,L,D], delta [B,L,D]
    (elapsed time since last observation per channel).
    """

    w_ih: jnp.ndarray
    w_hh: jnp.ndarray
    b_ih: jnp.ndarray
    b_hh: jnp.ndarray
    gamma_x: Linear        # delta -> D decay rates
    gamma_h: Linear        # delta -> H decay rates
    x_mean: jnp.ndarray    # empirical channel means [D]

    @staticmethod
    def create(key, input_size, hidden_size, x_mean=None, dtype=jnp.float32):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        kk = 1.0 / jnp.sqrt(hidden_size)
        u = lambda kkey, shape: jax.random.uniform(kkey, shape, dtype, -kk, kk)
        gru_in = input_size * 2  # value + mask
        return GRUDFull(
            w_ih=u(k1, (gru_in, 3 * hidden_size)),
            w_hh=u(k2, (hidden_size, 3 * hidden_size)),
            b_ih=u(k3, (3 * hidden_size,)),
            b_hh=u(k4, (3 * hidden_size,)),
            gamma_x=Linear.create(k5, input_size, input_size, dtype=dtype),
            gamma_h=Linear.create(k6, input_size, hidden_size, dtype=dtype),
            x_mean=(
                jnp.zeros((input_size,), dtype)
                if x_mean is None
                else jnp.asarray(x_mean, dtype)
            ),
        )

    @property
    def hidden_size(self):
        return self.w_hh.shape[0]

    def __call__(self, x, mask, delta):
        B, L, D = x.shape
        H = self.hidden_size

        hs = self._fused_path(x, mask, delta)
        if hs is not None:
            return hs

        def step(carry, inp):
            h, x_last = carry
            x_t, m_t, d_t = inp
            # input decay toward empirical mean
            gx = jnp.exp(-jax.nn.relu(self.gamma_x(d_t)))
            x_hat = m_t * x_t + (1 - m_t) * (
                gx * x_last + (1 - gx) * self.x_mean
            )
            # hidden decay
            gh = jnp.exp(-jax.nn.relu(self.gamma_h(d_t)))
            h = gh * h
            inp_vec = jnp.concatenate([x_hat, m_t], axis=-1)
            gi = inp_vec @ self.w_ih + self.b_ih
            gh_ = h @ self.w_hh + self.b_hh
            r = jax.nn.sigmoid(gi[..., :H] + gh_[..., :H])
            z = jax.nn.sigmoid(gi[..., H:2 * H] + gh_[..., H:2 * H])
            n = jnp.tanh(gi[..., 2 * H:] + r * gh_[..., 2 * H:])
            h = (1 - z) * n + z * h
            x_last = m_t * x_t + (1 - m_t) * x_last
            return (h, x_last), h

        init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, D), x.dtype))
        xs = (jnp.moveaxis(x, 1, 0), jnp.moveaxis(mask, 1, 0),
              jnp.moveaxis(delta, 1, 0))
        _, hs = jax.lax.scan(step, init, xs)
        return jnp.moveaxis(hs, 0, 1)

    def _fused_path(self, x, mask, delta):
        """Fused-kernel route: the x_last recurrence is a data-only
        forward fill (closed form via per-channel last-observation
        indices), the input decay/imputation and gi projection are
        precomputes, and the per-SAMPLE hidden decay rides the kernel's
        full hdec stream. Returns hs [B, L, H] or None."""
        from ..models.rnn import _fused_rnn_enabled

        if not _fused_rnn_enabled(self.hidden_size):
            return None
        from ..kernels.fused_em import is_batched
        from ..kernels.fused_rnn import fused_gru_scan, supports_fused_gru

        if not supports_fused_gru(self) or is_batched(self, x, mask,
                                                      delta):
            return None
        from .rnn import last_observation_excl

        xs = jnp.moveaxis(x, 1, 0)                   # [L, B, D]
        ms = jnp.moveaxis(mask, 1, 0)
        ds = jnp.moveaxis(delta, 1, 0)
        # x_last BEFORE step t = value at the last observed step < t
        last_excl = last_observation_excl(ms > 0.5)
        gathered = jnp.take_along_axis(xs, jnp.maximum(last_excl, 0),
                                       axis=0)
        x_last = jnp.where(last_excl >= 0, gathered, 0.0)
        gx = jnp.exp(-jax.nn.relu(self.gamma_x(ds)))
        x_hat = ms * xs + (1 - ms) * (gx * x_last + (1 - gx) * self.x_mean)
        gh = jnp.exp(-jax.nn.relu(self.gamma_h(ds)))     # [L, B, H]
        inp = jnp.concatenate([x_hat, ms], axis=-1)
        hs = fused_gru_scan(self, inp, hdec=gh)
        return jnp.moveaxis(hs, 0, 1)


@module
class ODELSTM(Module):
    """ODE-LSTM: LSTM at observations; output state h evolved by an MLP ODE
    between them (reference module/odelstm.py:13-137; solvers euler/heun/
    rk4 fixed, matching the non-torchdyn branch)."""

    lstm: LSTMCell
    f1: Linear
    f2: Linear
    solver: str = static_field(default="euler")
    ode_steps: int = static_field(default=1)

    @staticmethod
    def create(key, input_size, hidden_size, solver="euler", ode_steps=1,
               dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return ODELSTM(
            lstm=LSTMCell.create(k1, input_size, hidden_size, dtype),
            f1=Linear.create(k2, hidden_size, hidden_size, dtype=dtype),
            f2=Linear.create(k3, hidden_size, hidden_size, dtype=dtype),
            solver=solver,
            ode_steps=ode_steps,
        )

    def _f(self, h):
        return self.f2(jnp.tanh(self.f1(h)))

    def _evolve(self, h, dt):
        dt = dt[:, None] / self.ode_steps
        for _ in range(self.ode_steps):
            if self.solver == "euler":
                h = h + dt * self._f(h)
            elif self.solver == "heun":
                k1 = self._f(h)
                k2 = self._f(h + dt * k1)
                h = h + 0.5 * dt * (k1 + k2)
            elif self.solver == "rk4":
                k1 = self._f(h)
                k2 = self._f(h + 0.5 * dt * k1)
                k3 = self._f(h + 0.5 * dt * k2)
                k4 = self._f(h + dt * k3)
                h = h + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            else:
                raise ValueError(self.solver)
        return h

    def __call__(self, x, timestamps):
        """x [B,L,D], timestamps [B,L] (elapsed times) -> stream [B,L,H]."""
        B = x.shape[0]
        H = self.lstm.hidden_size

        from .rnn import _fused_rnn_enabled

        if _fused_rnn_enabled(H) and self.solver == "euler":
            from ..kernels.fused_em import is_batched
            from ..kernels.fused_rnn import (fused_lstm_scan,
                                             supports_fused_lstm)

            if (supports_fused_lstm(self.lstm)
                    and not is_batched(self, x, timestamps)):
                # LSTM cell + per-sample euler MLP evolve of h, in-kernel
                hs = fused_lstm_scan(
                    self.lstm, jnp.moveaxis(x, 1, 0),
                    ode_layers=(self.f1, self.f2),
                    odt=jnp.moveaxis(timestamps, 1, 0),
                    ode_steps=self.ode_steps)
                return jnp.moveaxis(hs, 0, 1)

        def step(state, inp):
            h, c = state
            x_t, dt_t = inp
            h_new, (h_new, c) = self.lstm(x_t, (h, c))
            h_new = self._evolve(h_new, dt_t)
            return (h_new, c), h_new

        init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
        xs = (jnp.moveaxis(x, 1, 0), jnp.moveaxis(timestamps, 1, 0))
        _, hs = jax.lax.scan(step, init, xs)
        return jnp.moveaxis(hs, 0, 1)
