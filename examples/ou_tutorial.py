"""OU-process tutorial: train each model family on synthetic
Ornstein–Uhlenbeck paths and run its theory check.

Rebuilds the reference tutorial suite (/root/reference/tutorial/*.ipynb —
10 notebooks, one per model family) as one parameterized script; see
examples/README.md for the notebook -> command mapping.

Usage:
    python examples/ou_tutorial.py --model lnsde --epochs 50
    python examples/ou_tutorial.py --model gsde --solver srk
    python examples/ou_tutorial.py --model lsde-kld

Models: ode | cde | sde | lsde | lnsde | gsde | sde-kld | lsde-kld
Each run ends with the notebook's theory-verification cell
(tutorial/README.md:7-19):
  ode       - determinism across seeds (zero diffusion)
  cde       - control-path Jacobian norm
  sde       - trajectory variance across seeds
  lsde      - diffusion state-independence (g(t,y) == g(t,flip(y)))
  lnsde     - long-horizon |sigma(t)| saturation
  gsde      - latent positivity counts (euler vs srk)
  *-kld     - ELBO decomposition (reconstruction vs KL)
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

import snsde
from snsde.data.ou import generate_ou_paths
from snsde.fields import (
    NeuralGSDEFunc,
    NeuralLNSDEFunc,
    NeuralLSDEFunc,
    NeuralSDEFunc,
)
from snsde.models import NDEModel, LatentSDE
from snsde.models.neuralcde import FinalTanh, NeuralCDEStream
from snsde.nn.core import combine, filter_value_and_grad, partition
from snsde.ops.interp import CubicPath, hermite_cubic_coeffs

FIELDS = {
    "sde": NeuralSDEFunc,
    "lsde": NeuralLSDEFunc,
    "lnsde": NeuralLNSDEFunc,
    "gsde": NeuralGSDEFunc,
}


def _zero_g(m):
    gnet = m.func.g_net
    zeroed = gnet.replace(layers=gnet.layers[:-1] + (
        jax.tree_util.tree_map(jnp.zeros_like, gnet.layers[-1]),))
    return m.replace(func=m.func.replace(g_net=zeroed))


def make_data(key, n=1000, N=20):
    data, times = generate_ou_paths(key, n, T=10.0, N=N, theta=0.2,
                                    mu=0.0, sigma=0.1, x0=1.0)
    coeffs = hermite_cubic_coeffs(times, data)
    n_train = int(0.8 * n)
    return (np.asarray(times), np.asarray(coeffs[:n_train]),
            np.asarray(data[:n_train, :, 1]),
            np.asarray(coeffs[n_train:]), np.asarray(data[n_train:, :, 1]))


def train(model_kind, solver="euler", epochs=50, hidden=32, lr=1e-3,
          seed=42, kl_weight=1e-3):
    key = jax.random.PRNGKey(seed)
    kd, km = jax.random.split(key)
    times, tr_c, tr_y, te_c, te_y = make_data(kd)
    tr_c, tr_y = jnp.asarray(tr_c), jnp.asarray(tr_y)
    te_c, te_y = jnp.asarray(te_c), jnp.asarray(te_y)

    kld = model_kind.endswith("-kld")
    base = model_kind.replace("-kld", "")

    if base == "cde":
        func = FinalTanh.create(km, 2, hidden, hidden, 1)
        model = NeuralCDEStream.create(km, func, 2, hidden, 1)
        apply_fn = lambda m, c, k: m(times, c)[0][..., 0]
    elif base == "ode":
        model = NDEModel.create(km, 2, hidden, 1, 1,
                                vector_field=NeuralSDEFunc)
        # zero diffusion => ODE. Zeroing inside the apply path keeps the
        # gradient wrt the g-net output layer exactly zero, so training
        # cannot reintroduce noise.
        apply_fn = lambda m, c, k: _zero_g(m)(c, times, key=k)[..., 0]
    elif kld:
        model = LatentSDE.create(km, 2, hidden, hidden, 1, method=solver)
        apply_fn = None
    else:
        model = NDEModel.create(km, 2, hidden, 1, 1,
                                vector_field=FIELDS[base],
                                method=solver)
        apply_fn = lambda m, c, k: m(c, times, key=k)[..., 0]

    if kld:
        def loss_fn(m, coeffs, y, k):
            out, latent, logqp = m(coeffs, times, key=k)
            pred = out.mean(-1)
            recon = jnp.mean((pred - y) ** 2)
            return recon + kl_weight * logqp, (recon, logqp)

        vg = filter_value_and_grad(loss_fn, has_aux=True)
    else:
        def loss_fn(m, coeffs, y, k):
            return jnp.mean((apply_fn(m, coeffs, k) - y) ** 2)

        vg = filter_value_and_grad(loss_fn)

    tx = optax.adam(lr)
    params, _ = partition(model)
    opt_state = tx.init(params)

    @jax.jit
    def step(m, opt_state, c, y, k):
        out = vg(m, c, y, k)
        (loss, grads) = out if not kld else ((out[0][0], out[1]))
        params, rest = partition(m)
        updates, opt_state = tx.update(grads, opt_state, params)
        return combine(optax.apply_updates(params, updates), rest), \
            opt_state, loss

    for epoch in range(1, epochs + 1):
        key, sub = jax.random.split(key)
        model, opt_state, loss = step(model, opt_state, tr_c, tr_y, sub)
        if epoch % 10 == 0:
            key, sub = jax.random.split(key)
            if kld:
                te_loss, _ = loss_fn(model, te_c, te_y, sub)
            else:
                te_loss = loss_fn(model, te_c, te_y, sub)
            print(f"epoch {epoch}: train {float(loss):.4f} "
                  f"test {float(te_loss):.4f}", flush=True)

    theory_check(model_kind, model, times, te_c, te_y, key, solver)
    return model


def theory_check(kind, model, times, coeffs, y, key, solver):
    print("\n--- theory check:", kind, "---")
    t_arr = jnp.asarray(times)
    if kind == "ode":
        model = _zero_g(model)
        p1 = model(coeffs, times, key=jax.random.PRNGKey(0))
        p2 = model(coeffs, times, key=jax.random.PRNGKey(1))
        shift = float(jnp.abs(p1 - p2).mean())
        print(f"determinism across seeds: mean |Δ| = {shift:.2e} "
              f"(expect ~0)")
        assert shift < 1e-6
    elif kind == "cde":
        path = CubicPath(jnp.asarray(coeffs), times)
        z0 = model.initial_network(path.evaluate(t_arr[0]))
        fz = model.func(t_arr[0], z0)
        print(f"control-Jacobian |f(z0)| norm: "
              f"{float(jnp.linalg.norm(fz)):.3f}")
    elif kind == "sde":
        p1 = model(coeffs, times, key=jax.random.PRNGKey(0))
        p2 = model(coeffs, times, key=jax.random.PRNGKey(1))
        print(f"stochastic shift across seeds: "
              f"{float(jnp.abs(p1-p2).mean()):.4f} (expect > 0)")
    elif kind == "lsde":
        path = CubicPath(jnp.asarray(coeffs), times)
        func = model.func.bind(path)
        y0 = model.initial(path.evaluate(t_arr[0]))
        g1 = func.g(t_arr[0], y0)
        g2 = func.g(t_arr[0], jnp.flip(y0, -1))
        print(f"state-independence error: "
              f"{float(jnp.abs(g1-g2).max()):.2e} (expect ~0)")
        norms = [float(jnp.linalg.norm(func.g(t, y0[:1])))
                 for t in jnp.linspace(0, 1, 20)]
        print(f"additive diffusion norm mean: {np.mean(norms):.3f}")
    elif kind == "lnsde":
        path = CubicPath(jnp.asarray(coeffs), times)
        func = model.func.bind(path)
        y0 = model.initial(path.evaluate(t_arr[0]))
        sig = [float(jnp.abs(func.g(t, y0)).mean())
               for t in jnp.linspace(0, 3, 30)]
        print(f"|sigma(t)| over long horizon: start {sig[0]:.3f} "
              f"end {sig[-1]:.3f} (bounded)")
    elif kind == "gsde":
        path = CubicPath(jnp.asarray(coeffs), times)
        func = model.func.bind(path)
        y0 = jnp.abs(model.initial(path.evaluate(t_arr[0])))  # positive
        from snsde.ops.solve import sdeint

        zs = sdeint(func.f, func.g, y0, np.asarray(times), key=key,
                    dt=0.05, method=solver)
        frac_pos = float((zs > 0).mean())
        print(f"latent positivity fraction ({solver}): {frac_pos:.3f}")
    elif kind.endswith("-kld"):
        out, latent, logqp = model(coeffs, times, key=key)
        recon = float(jnp.mean((out.mean(-1) - y) ** 2))
        print(f"ELBO decomposition: reconstruction {recon:.4f}, "
              f"KL {float(logqp):.4f}")
        assert float(logqp) >= 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="lnsde",
                    choices=["ode", "cde", "sde", "lsde", "lnsde", "gsde",
                             "sde-kld", "lsde-kld"])
    ap.add_argument("--solver", default="euler",
                    choices=["euler", "srk", "milstein", "heun"])
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    train(args.model, args.solver, args.epochs, args.hidden, args.lr,
          args.seed)
