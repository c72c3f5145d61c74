"""Generate torch-referenced parity goldens (run offline, once per change).

Implements the reference's own cross-implementation contract
(/root/reference/tests/test_neuralsde_core_alignment.py:102-128): load one
implementation's weights into the other and assert f/g allclose — here
between the reference PyTorch `Diffusion_model`
(/root/reference/benchmark_classification/models_sde/neuralsde.py:123-307)
and snsde's `DiffusionField`, over the full 7x20 option grid.

Also generates Euler-Maruyama trajectory + gradient goldens from a
hand-rolled torch EM loop on injected dW (the BASELINE.md "gradients match
torch to 1e-4" north star).

torchsde/torchcde are not installed in this environment; the reference
module imports them at module level, so they are stubbed (only
`X.evaluate`, which we bypass, would ever use them). The spline values fed
to the torch side come from snsde's own CubicPath so the goldens isolate
the f/g math (the spline itself is tested against closed forms elsewhere).

Outputs (committed so the tests run without torch):
  tests/goldens/reference_fg.npz   f/g parity over the 7x20 grid
  tests/goldens/reference_em.npz   EM trajectory + per-param grads
"""

import importlib.util
import os
import pathlib
import sys
import types

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path(
    "/root/reference/benchmark_classification/models_sde/neuralsde.py"
)
OUT_DIR = REPO / "tests" / "goldens"

sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _stub(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def load_reference_module():
    tc = _stub("torchcde")
    tc.CubicSpline = object  # only used inside set_X, which we bypass
    ts = _stub("torchsde")
    ts.sdeint = None
    _stub("controldiffeq")
    spec = importlib.util.spec_from_file_location("ref_neuralsde", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _StubX:
    """Replaces torchcde.CubicSpline: evaluate(t) -> precomputed values."""

    def __init__(self, table, dtype=None):
        import torch

        dtype = dtype or torch.float32
        self.table = {
            round(float(t), 9): torch.tensor(np.asarray(v), dtype=dtype)
            for t, v in table.items()
        }

    def evaluate(self, t):
        return self.table[round(float(t), 9)]


def set_params_from_rng(model, rng):
    """Overwrite every parameter with rng draws (deterministic across torch
    versions), return {name: np.ndarray}."""
    import torch

    out = {}
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        arr = rng.uniform(-0.5, 0.5, size=tuple(v.shape)).astype(np.float32)
        new[k] = torch.tensor(arr)
        out[k] = arr
    model.load_state_dict(new)
    return out


def gen_fg_goldens(ref):
    import torch

    C, H, B = 4, 8, 16
    rng = np.random.default_rng(0)
    y = rng.normal(size=(B, H)).astype(np.float32)
    # mixed-sign y exercises the nan_to_num path (noise 7: sqrt of negatives)
    t_vals = np.array([0.37, 1.0, 2.5], dtype=np.float32)
    Xt = rng.normal(size=(B, C)).astype(np.float32)

    data = {
        "y": y,
        "t_vals": t_vals,
        "Xt": Xt,
        "meta": np.array([C, H, B], np.int64),
    }
    ty = torch.tensor(y)
    stub = _StubX({float(t): Xt for t in t_vals})
    for io in range(7):
        for no in range(20):
            prng = np.random.default_rng(1000 + io * 100 + no)
            m = ref.Diffusion_model(
                C, H, H, num_hidden_layers=2,
                input_option=io, noise_option=no,
            )
            params = set_params_from_rng(m, prng)
            m.X = stub
            pre = f"cfg_{io}_{no:02d}"
            for k, v in params.items():
                data[f"{pre}/param/{k}"] = v
            with torch.no_grad():
                for ti, t in enumerate(t_vals):
                    tt = torch.tensor(float(t))
                    data[f"{pre}/f/{ti}"] = m.f(tt, ty).numpy()
                    data[f"{pre}/g/{ti}"] = m.g(tt, ty).numpy()
            print(pre, "done", flush=True)
    return data


def gen_em_goldens(ref):
    """Hand-rolled torch EM loop on snsde's grid with injected dW.

    y_{k+1} = y_k + f(t_k, y_k) dt_k + g(t_k, y_k) dW_k, outputs gathered at
    snsde's out_idx; loss = mean(ys_out^2); grads wrt every field param.
    """
    import torch

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from snsde.models.neuralsde import resolve_dt
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import make_grid

    B, L, C, H = 8, 6, 3, 8
    rng = np.random.default_rng(7)
    times = np.arange(L, dtype=np.float32) * 0.7
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    coeffs = np.asarray(
        hermite_cubic_coeffs(jnp.asarray(times), jnp.asarray(X))
    )
    path = CubicPath(coeffs, times)
    dt = resolve_dt(times) / 3.0  # subdivided grid exercises make_grid
    grid, out_idx = make_grid(times, dt)
    Xg = np.asarray(path.evaluate_grid(grid[:-1]))      # [M, B, C]
    M = grid.shape[0] - 1

    y0 = rng.normal(size=(B, H)).astype(np.float32)
    dW = (
        rng.normal(size=(M, B, H)).astype(np.float32)
        * np.sqrt(np.diff(grid))[:, None, None].astype(np.float32)
    )

    data = {
        "times": times, "X": X, "coeffs": coeffs,
        "grid": grid.astype(np.float64), "out_idx": out_idx.astype(np.int64),
        "y0": y0, "dW": dW, "dt": np.float64(dt),
    }

    configs = {
        "lsde": (2, 16), "lnsde": (4, 17), "gsde": (6, 17),
        "naivesde": (1, 18), "neuralsde": (3, 18),
    }
    for name, (io, no) in configs.items():
        prng = np.random.default_rng(5000 + io * 100 + no)
        m = ref.Diffusion_model(
            C, H, H, num_hidden_layers=2, input_option=io, noise_option=no,
        )
        params = set_params_from_rng(m, prng)
        m = m.double()
        table = {float(grid[k]): Xg[k] for k in range(M)}
        m.X = _StubX(table, dtype=torch.float64)
        for p in m.parameters():
            p.requires_grad_(True)

        y = torch.tensor(y0, dtype=torch.float64)
        tdW = torch.tensor(dW, dtype=torch.float64)
        outs = []
        out_set = {int(i) for i in out_idx}
        if 0 in out_set:
            outs.append(y)
        for k in range(M):
            tk = torch.tensor(float(grid[k]), dtype=torch.float64)
            h = float(grid[k + 1] - grid[k])
            fk = m.f(tk, y)
            gk = m.g(tk, y)
            y = y + fk * h + gk * tdW[k]
            if (k + 1) in out_set:
                outs.append(y)
        ys = torch.stack(outs)                           # [T, B, H]
        loss = (ys ** 2).mean()
        loss.backward()

        pre = f"em_{name}"
        data[f"{pre}/options"] = np.array([io, no], np.int64)
        for k, v in params.items():
            data[f"{pre}/param/{k}"] = v
        data[f"{pre}/ys"] = ys.detach().numpy().astype(np.float32)
        data[f"{pre}/loss"] = np.float64(loss.item())
        for k, p in m.named_parameters():
            if p.grad is None:     # unused param (e.g. initial_network
                continue           # when input_option in {1,3,5})
            data[f"{pre}/grad/{k}"] = (
                p.grad.detach().numpy().astype(np.float64)
            )
        print(pre, "done: loss", float(loss), flush=True)
    return data


def main():
    ref = load_reference_module()
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    fg = gen_fg_goldens(ref)
    np.savez_compressed(OUT_DIR / "reference_fg.npz", **fg)
    em = gen_em_goldens(ref)
    np.savez_compressed(OUT_DIR / "reference_em.npz", **em)
    print("wrote", OUT_DIR / "reference_fg.npz", OUT_DIR / "reference_em.npz")


if __name__ == "__main__":
    main()
