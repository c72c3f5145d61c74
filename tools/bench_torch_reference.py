"""Measure the PyTorch reference's training-step throughput (CPU).

BASELINE.md's north star is ">=10x training-step throughput vs the
PyTorch reference"; the reference targets a CUDA GPU
(/root/reference/benchmark_classification/sepsis-sde.py:5-9) which this
environment does not have, so this measures the best available proxy:
the reference's OWN `Diffusion_model` vector field
(benchmark_classification/models_sde/neuralsde.py:123-307, loaded
directly, torchcde/torchsde stubbed exactly like
tools/make_reference_goldens.py) driven by a hand-rolled Euler-Maruyama
training step (the same loop torchsde.sdeint runs for method='euler',
neuralsde.py:71-82) — forward solve + backward + Adam — on torch CPU.
snsde's scan and fused paths are measured on the SAME jax CPU backend
for an apples-to-apples framework comparison, and the TPU headline from
bench.py is quoted for the cross-hardware ratio.

Run from the repo root: python tools/bench_torch_reference.py
(the script inserts the repo on sys.path itself; never SET PYTHONPATH in
this environment — it would clobber the TPU plugin injection, see
CLAUDE.md). Writes RESULTS_torch_baseline.json.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

B, L, C, H = 1024, 72, 35, 49
N_LAYERS = 2
ITERS = 3


def bench_torch():
    import torch

    from make_reference_goldens import _StubX, load_reference_module

    torch.manual_seed(0)
    ref = load_reference_module()
    model = ref.Diffusion_model(
        input_channels=C, hidden_channels=H, hidden_hidden_channels=H,
        num_hidden_layers=N_LAYERS, input_option=4, noise_option=17,
        theta=1.0, sigma=1.0,
    )
    times = torch.arange(L, dtype=torch.float32)
    # spline values at the grid times (the solve evaluates X at each step;
    # table lookup mirrors what CubicSpline.evaluate costs at its cheapest)
    rng = np.random.default_rng(0)
    table = {float(t): rng.normal(size=(B, C)).astype(np.float32)
             for t in times}
    model.X = _StubX(table)

    dts = torch.diff(times)
    dW = torch.randn(L - 1, B, H) * dts[:, None, None].sqrt()
    y0 = torch.randn(B, H)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def train_step():
        opt.zero_grad()
        y = y0
        for k in range(L - 1):
            t = times[k]
            y = y + model.f(t, y) * dts[k] + model.g(t, y) * dW[k]
        loss = (y ** 2).mean()
        loss.backward()
        opt.step()
        return float(loss.detach())

    train_step()                                   # warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        train_step()
    dt_step = (time.perf_counter() - t0) / ITERS

    # forward-only (serving) twin: the deployment-side anchor for the
    # TPU infer_samples_per_sec numbers (VERDICT r3 weak #7)
    import torch

    def infer_step():
        with torch.no_grad():
            y = y0
            for k in range(L - 1):
                t = times[k]
                y = y + model.f(t, y) * dts[k] + model.g(t, y) * dW[k]
        return y

    infer_step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        infer_step()
    dt_infer = (time.perf_counter() - t0) / ITERS
    return dt_step, dt_infer


def bench_snsde_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from snsde.fields import DiffusionField
    from snsde.models.neuralsde import resolve_dt
    from snsde.nn.core import combine, filter_value_and_grad, partition
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import sdeint

    rng = np.random.default_rng(0)
    times = np.arange(L, dtype=np.float32)
    x = rng.normal(size=(B, L, C - 1)).astype(np.float32)
    tchan = np.broadcast_to(times[None, :, None], (B, L, 1))
    coeffs = hermite_cubic_coeffs(
        jnp.asarray(times), jnp.asarray(np.concatenate([tchan, x], -1))
    )
    path = CubicPath(coeffs, times)
    field = DiffusionField.create(jax.random.PRNGKey(0), C, H, H, N_LAYERS,
                                  input_option=4, noise_option=17)
    y0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dt = resolve_dt(times)
    tx = optax.adam(1e-3)
    params, _ = partition(field)
    opt_state = tx.init(params)

    def loss_fn(f, key):
        fb = f.bind(path)
        ys = sdeint(fb.f, fb.g, y0, times, key=key, dt=dt, method="euler")
        return jnp.mean(ys[-1] ** 2)

    vg = filter_value_and_grad(loss_fn)

    @jax.jit
    def step(field, opt_state, key):
        loss, grads = vg(field, key)
        p, rest = partition(field)
        updates, opt_state = tx.update(grads, opt_state, p)
        return combine(optax.apply_updates(p, updates), rest), opt_state, \
            loss

    key = jax.random.PRNGKey(1)
    field, opt_state, l = step(field, opt_state, key)
    l.block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        field, opt_state, l = step(field, opt_state,
                                   jax.random.fold_in(key, i))
    l.block_until_ready()
    dt_step = (time.perf_counter() - t0) / ITERS

    @jax.jit
    def fwd(field, key):
        fb = field.bind(path)
        return sdeint(fb.f, fb.g, y0, times, key=key, dt=dt,
                      method="euler")[-1]

    fwd(field, key).block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fwd(field, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt_infer = (time.perf_counter() - t0) / ITERS
    return dt_step, dt_infer


def main():
    t_torch, t_torch_inf = bench_torch()
    t_snsde, t_snsde_inf = bench_snsde_cpu()
    out = {
        "shape": {"B": B, "L": L, "C": C, "H": H, "layers": N_LAYERS},
        "torch_reference_cpu_s_per_train_step": round(t_torch, 4),
        "snsde_scan_cpu_s_per_train_step": round(t_snsde, 4),
        "snsde_cpu_vs_torch_cpu": round(t_torch / t_snsde, 2),
        "torch_reference_cpu_s_per_forward": round(t_torch_inf, 4),
        "snsde_scan_cpu_s_per_forward": round(t_snsde_inf, 4),
        "torch_cpu_infer_samples_per_sec": round(B / t_torch_inf, 1),
        "snsde_cpu_infer_samples_per_sec": round(B / t_snsde_inf, 1),
        "note": (
            "torch CPU is the only torch backend in this environment "
            "(reference targets CUDA); same-host single-CPU comparison. "
            "TPU headline (bench.py): 1.6 ms/train step = "
            f"{round(t_torch / 0.0016, 1)}x the torch-CPU reference step."
        ),
    }
    print(json.dumps(out, indent=1))
    with open(REPO / "RESULTS_torch_baseline.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
