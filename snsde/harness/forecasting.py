"""Forecasting harness (MuJoCo-style windows).

Rebuilds /root/reference/benchmark_forecasting/{common_sde.py:88-402,
mujoco-sde.py, parse.py}: sliding windows (50 in -> 10 out), seeded
missingness, sequential 70/15/15 split, natural-spline control coeffs,
`NeuralSDE_forecasting` (solve full grid, ReLU-MLP readout on the last
`y_seq` steps), MSE/Huber loss + L1/L2 regularization, per-epoch train/val/
test eval, rk4->euler method resolution (mujoco-sde.py:15-25).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.common import inject_missingness
from ..data.synthetic import synthetic_mujoco
from ..fields import DiffusionField
from ..models.neuralsde import NeuralSDEForecasting
from ..nn.core import combine, filter_value_and_grad, partition
from ..ops.interp import natural_cubic_coeffs
from ..train.loop import iterate_batches, weight_regularization
from .classification import parse_model_name

__all__ = ["ForecastConfig", "run_mujoco", "make_forecast_model",
           "resolve_sde_method"]


def resolve_sde_method(method: str) -> str:
    """rk4 is not an SDE method; map to euler; whitelist {euler, srk,
    milstein, heun} (reference mujoco-sde.py:15-25 maps rk4->euler and
    whitelists euler/srk)."""
    if method == "rk4":
        return "euler"
    if method not in ("euler", "srk", "milstein", "heun"):
        raise ValueError(f"unsupported SDE method {method!r}")
    return method


def make_forecast_model(key, name: str, input_channels: int,
                        hidden_channels: int, hidden_hidden_channels: int,
                        num_hidden_layers: int, output_channels: int,
                        output_time: int, method: str = "euler"):
    io, no = parse_model_name(name)
    kf, km = jax.random.split(key)
    field = DiffusionField.create(
        kf, input_channels, hidden_channels, hidden_hidden_channels,
        num_hidden_layers, input_option=io, noise_option=no,
    )
    model = NeuralSDEForecasting.create(
        km, field, input_channels, hidden_channels, output_channels,
        output_time=output_time, method=resolve_sde_method(method),
    )
    return model, (lambda m: m.func)


@dataclass
class ForecastConfig:
    """Defaults mirror the reference CLI (parse.py:17-40 + mujoco-sde.py):
    lr 1e-4, Adam weight_decay 1e-5 (coupled L2), mse + l2-reg scale 0.01,
    ReduceLROnPlateau(patience=5) on val loss, plateau-terminate 50,
    time-augmented input channel (intensity default True)."""

    model_name: str = "neurallnsde"
    hidden_channels: int = 16
    hidden_hidden_channels: int = 16
    num_hidden_layers: int = 1
    lr: float = 1e-4
    weight_decay: float = 1e-5
    batch_size: int = 1024
    max_epochs: int = 100
    time_seq: int = 50
    y_seq: int = 10
    missing_rate: float = 0.0
    loss: str = "mse"            # mse | huber
    reg: str = "l2"              # none | l1 | l2
    reg_scale: float = 0.01
    method: str = "euler"
    step_mode: str = "valloss"   # valloss | trainloss | none
    time_augment: bool = True    # = --intensity (mujoco.sh sweeps False)
    plateau_patience: int = 5
    plateau_terminate: int = 50
    npy_path: Optional[str] = None   # None -> bundled reference mujoco.npy
    seed: int = 0
    verbose: bool = True


def _loss_fn_base(kind: str):
    if kind == "mse":
        return lambda p, t: jnp.mean((p - t) ** 2)
    if kind == "huber":
        def huber(p, t, delta=1.0):
            d = jnp.abs(p - t)
            return jnp.mean(
                jnp.where(d <= delta, 0.5 * d * d, delta * (d - 0.5 * delta))
            )
        return huber
    raise ValueError(kind)


def run_mujoco(cfg: ForecastConfig = ForecastConfig(), n: int = 2048,
               data_fn: Optional[Callable] = None) -> Dict:
    """Train + evaluate; returns dict with per-split MSE and history.

    Default data path: the bundled reference trajectory bank
    (benchmark_forecasting/datasets/mujoco.npy — stride-1 windows,
    whole-timestep seed-56789 missingness), falling back to synthetic
    windows when the file is absent. Pass data_fn(n, length, seed) ->
    (X [n, time_seq+y_seq, D], t) to override (tests use synthetic).
    """
    if data_fn is not None:
        total_len = cfg.time_seq + cfg.y_seq
        X, _ = data_fn(n=n, length=total_len, seed=cfg.seed)
        X_in = X[:, : cfg.time_seq, :]
        if cfg.missing_rate > 0:
            X_in = inject_missingness(X_in, cfg.missing_rate)
        y_out = X[:, cfg.time_seq :, :]
        times_in = np.arange(cfg.time_seq, dtype=np.float32)
    else:
        from ..data.mujoco import get_data

        X_in, y_out, times_in = get_data(
            npy_path=cfg.npy_path, time_seq=cfg.time_seq, y_seq=cfg.y_seq,
            missing_rate=cfg.missing_rate, n_synthetic=n, seed=cfg.seed,
        )
    C = X_in.shape[-1]
    # time_augment = intensity in the reference (mujoco-sde.py:64); the
    # official sweep (mujoco.sh) runs --intensity false -> no time channel.
    if cfg.time_augment:
        tchan = np.broadcast_to(times_in[None, :, None],
                                (X_in.shape[0], cfg.time_seq, 1))
        Xa = np.concatenate([tchan, X_in], axis=-1)
    else:
        Xa = X_in
    # natural-spline coeffs (reference uses the vendored NaN-aware
    # natural_cubic_spline_coeffs on the forecasting path)
    coeffs = np.asarray(
        natural_cubic_coeffs(jnp.asarray(times_in), jnp.asarray(Xa),
                             pack=True)
    )

    # sequential split (forecasting must not shuffle across time windows,
    # reference mujoco.py sequential 70/15/15)
    n_total = X_in.shape[0]
    n_tr, n_va = int(0.7 * n_total), int(0.15 * n_total)
    splits = {
        "train": slice(0, n_tr),
        "val": slice(n_tr, n_tr + n_va),
        "test": slice(n_tr + n_va, n_total),
    }
    datasets = {
        k: {"coeffs": coeffs[s], "y": y_out[s]} for k, s in splits.items()
    }

    key = jax.random.PRNGKey(cfg.seed)
    model, reg_fn = make_forecast_model(
        key, cfg.model_name, C + int(cfg.time_augment), cfg.hidden_channels,
        cfg.hidden_hidden_channels, cfg.num_hidden_layers,
        output_channels=C, output_time=cfg.y_seq, method=cfg.method,
    )

    base = _loss_fn_base(cfg.loss)

    def loss_fn(m, batch, key):
        pred = m(times_in, batch["coeffs"], key=key)
        loss = base(pred, batch["y"])
        if cfg.reg == "l2":
            loss = loss + weight_regularization(reg_fn(m), cfg.reg_scale)
        elif cfg.reg == "l1":
            params, _ = partition(reg_fn(m))
            l1 = sum(
                jnp.sum(jnp.abs(p))
                for p in jax.tree_util.tree_leaves(params)
                if p is not None
            )
            loss = loss + cfg.reg_scale * l1
        return loss

    # torch.optim.Adam(lr, weight_decay=1e-5): coupled L2 added to the
    # gradient before Adam normalization (common_sde.py:254).
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(learning_rate),
        )
    )(learning_rate=cfg.lr)
    params, _ = partition(model)
    opt_state = tx.init(params)
    vg = filter_value_and_grad(loss_fn)

    @jax.jit
    def train_step(m, opt_state, batch, key, lr):
        loss, grads = vg(m, batch, key)
        params, rest = partition(m)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        return combine(optax.apply_updates(params, updates), rest), \
            opt_state, loss

    @jax.jit
    def eval_mse(m, batch, key):
        pred = m(times_in, batch["coeffs"], key=key)
        return jnp.mean((pred - batch["y"]) ** 2)

    def evaluate(m, data, key):
        tot, cnt = 0.0, 0
        for i, (batch, nv) in enumerate(
            iterate_batches(data, cfg.batch_size)
        ):
            mse = eval_mse(m, batch, jax.random.fold_in(key, i))
            tot += float(mse) * nv
            cnt += nv
        return tot / cnt

    from ..train.schedule import ReduceLROnPlateau

    rng = np.random.default_rng(cfg.seed)
    history = []
    best_val = np.inf
    best_train = np.inf
    best_train_epoch = 0
    # full-model snapshot (weights + any buffers of the same epoch) —
    # matches the reference's state_dict deepcopy restore
    best_model = model
    lr = cfg.lr
    sched = ReduceLROnPlateau(lr=cfg.lr, mode="min",
                              patience=cfg.plateau_patience)
    for epoch in range(cfg.max_epochs):
        for batch, _ in iterate_batches(datasets["train"], cfg.batch_size,
                                        rng=rng):
            key, sub = jax.random.split(key)
            model, opt_state, loss = train_step(model, opt_state, batch,
                                                sub, jnp.asarray(lr))
        key, k1, k2, k3 = jax.random.split(key, 4)
        mses = {
            "train": evaluate(model, datasets["train"], k1),
            "val": evaluate(model, datasets["val"], k2),
            "test": evaluate(model, datasets["test"], k3),
        }
        history.append({"epoch": epoch, **mses})
        # best-val restore + train-plateau early stop, both with the
        # reference's 1.0001 improvement factor (common_sde.py:167-175,196)
        if mses["train"] * 1.0001 < best_train:
            best_train = mses["train"]
            best_train_epoch = epoch
        if mses["val"] * 1.0001 < best_val:
            best_val = mses["val"]
            best_model = model
        if cfg.step_mode == "valloss":
            lr = sched.step(mses["val"])
        elif cfg.step_mode == "trainloss":
            lr = sched.step(mses["train"])
        if cfg.verbose:
            print(
                f"epoch {epoch}: train {mses['train']:.4f} "
                f"val {mses['val']:.4f} test {mses['test']:.4f} lr {lr:.1e}",
                flush=True,
            )
        if epoch > best_train_epoch + cfg.plateau_terminate:
            if cfg.verbose:
                print("early stop: training-loss plateau", flush=True)
            break

    model = best_model
    key, k1 = jax.random.split(key)
    final_test = evaluate(model, datasets["test"], k1)
    return {
        "model": model,
        "history": history,
        "test_mse": final_test,
        "best_val_mse": best_val,
    }
