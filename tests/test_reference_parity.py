"""Cross-implementation parity against the PyTorch reference.

The semantic anchor for the rebuild: torch-generated goldens
(tests/goldens/reference_{fg,em}.npz, produced once by
tools/make_reference_goldens.py from
/root/reference/benchmark_classification/models_sde/neuralsde.py) are
replayed through snsde's DiffusionField / sdeint:

  * f/g parity over the full 7x20 input_option x noise_option grid — the
    reference's own cross-tree contract
    (/root/reference/tests/test_neuralsde_core_alignment.py:102-128).
  * Euler-Maruyama trajectory + gradient parity on injected dW for the five
    named models (lsde/lnsde/gsde/naivesde/neuralsde) — the BASELINE.md
    "gradients match torch to 1e-4" north star.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.fields import DiffusionField
from snsde.nn.core import filter_value_and_grad
from snsde.nn.layers import Linear
from snsde.ops.brownian import BrownianGrid
from snsde.ops.interp import CubicPath
from snsde.ops.solve import sdeint

GOLDENS = pathlib.Path(__file__).parent / "goldens"


class _ConstPath:
    """Stub control path: evaluate(t) -> fixed [B, C] values (mirrors the
    golden generator's torchcde.CubicSpline stub)."""

    def __init__(self, Xt):
        self.Xt = jnp.asarray(Xt)

    def evaluate(self, t):
        return self.Xt


def _lin(params, name):
    return Linear(
        weight=jnp.asarray(params[f"{name}.weight"].T),
        bias=jnp.asarray(params[f"{name}.bias"]),
    )


def field_from_torch_params(params, io, no):
    """Map a reference Diffusion_model state_dict onto DiffusionField
    (torch Linear stores [out, in]; snsde stores [in, out])."""
    linears = tuple(
        _lin(params, f"linears.{i}")
        for i in range(len({k.split(".")[1] for k in params
                            if k.startswith("linears.")}))
    )
    noise_t = noise_y = None
    if no in (12, 13):
        noise_t = (_lin(params, "noise_t"),)
    if no in (14, 15):
        noise_y = (_lin(params, "noise_y"),)
    if no in (16, 17):
        noise_t = (_lin(params, "noise_t.0"), _lin(params, "noise_t.2"))
    if no in (18, 19):
        noise_y = (_lin(params, "noise_y.0"), _lin(params, "noise_y.2"))
    return DiffusionField(
        initial_network=_lin(params, "initial_network"),
        linear_in=_lin(params, "linear_in"),
        linears=linears,
        linear_out=_lin(params, "linear_out"),
        emb=_lin(params, "emb") if "emb.weight" in params else None,
        theta=jnp.asarray(params["theta"]),
        sigma=jnp.asarray(params["sigma"]) if "sigma" in params else None,
        sigma_diag=(jnp.asarray(params["sigma_diag"])
                    if "sigma_diag" in params else None),
        noise_t=noise_t,
        noise_y=noise_y,
        path=None,
        input_option=io,
        noise_option=no,
    )


def _config_params(z, prefix):
    return {
        k[len(prefix):]: z[k] for k in z.files if k.startswith(prefix)
    }


@pytest.fixture(scope="module")
def fg_goldens():
    return np.load(GOLDENS / "reference_fg.npz")


@pytest.mark.parametrize("io", range(7))
def test_fg_parity_full_grid(fg_goldens, io):
    """f/g allclose vs the torch reference for all 20 noise options of one
    input option (reference contract: atol/rtol 1e-6; f32 cross-framework
    tolerance 2e-6 absolute on tanh-bounded outputs)."""
    z = fg_goldens
    y = jnp.asarray(z["y"])
    t_vals = z["t_vals"]
    Xt = z["Xt"]
    path = _ConstPath(Xt)
    for no in range(20):
        pre = f"cfg_{io}_{no:02d}/"
        params = _config_params(z, pre + "param/")
        field = field_from_torch_params(params, io, no).replace(path=path)
        for ti, t in enumerate(t_vals):
            f_ref = z[f"{pre}f/{ti}"]
            g_ref = z[f"{pre}g/{ti}"]
            f_out = np.asarray(field.f(jnp.float32(t), y))
            g_out = np.asarray(field.g(jnp.float32(t), y))
            np.testing.assert_allclose(
                f_out, f_ref, atol=2e-6, rtol=1e-5,
                err_msg=f"f mismatch io={io} no={no} t={t}")
            np.testing.assert_allclose(
                g_out, g_ref, atol=2e-6, rtol=1e-5,
                err_msg=f"g mismatch io={io} no={no} t={t}")


@pytest.fixture(scope="module")
def em_goldens():
    return np.load(GOLDENS / "reference_em.npz")


TORCH_TO_FIELD = None  # names map 1:1 through field_from_torch_params


def _grad_leaf(grads, torch_name):
    """Look up the DiffusionField grad leaf matching a torch param name."""
    parts = torch_name.split(".")
    if parts[0] == "linears":
        leaf = grads.linears[int(parts[1])]
        arr = getattr(leaf, parts[2])
    elif parts[0] in ("noise_t", "noise_y"):
        seq = getattr(grads, parts[0])
        if len(parts) == 2:       # single Linear: noise_t.weight
            arr = getattr(seq[0], parts[1])
        else:                     # Sequential: noise_t.0.weight / .2.weight
            arr = getattr(seq[0 if parts[1] == "0" else 1], parts[2])
    elif parts[0] in ("theta", "sigma", "sigma_diag"):
        arr = getattr(grads, parts[0])
    else:
        arr = getattr(getattr(grads, parts[0]), parts[1])
    if torch_name.endswith("weight") and arr is not None and arr.ndim == 2:
        arr = arr.T               # back to torch [out, in] layout
    return arr


@pytest.mark.parametrize(
    "name", ["lsde", "lnsde", "gsde", "naivesde", "neuralsde"]
)
def test_em_trajectory_and_gradient_parity(em_goldens, name):
    """EM solve on injected dW matches a hand-rolled float64 torch loop:
    trajectory to 1e-4 absolute, gradients to 1e-4 relative (BASELINE.md)."""
    z = em_goldens
    pre = f"em_{name}/"
    io, no = (int(v) for v in z[pre + "options"])
    params = _config_params(z, pre + "param/")
    field = field_from_torch_params(params, io, no)

    times = z["times"]
    coeffs = jnp.asarray(z["coeffs"])
    path = CubicPath(coeffs, times)
    bm = BrownianGrid(
        grid=jnp.asarray(z["grid"], jnp.float32),
        dW=jnp.asarray(z["dW"]),
        U=None,
    )
    y0 = jnp.asarray(z["y0"])

    def loss_fn(f):
        fb = f.bind(path)
        ys = sdeint(fb.f, fb.g, y0, times, bm=bm, method="euler")
        return jnp.mean(ys ** 2), ys

    (loss, ys), grads = filter_value_and_grad(loss_fn, has_aux=True)(field)

    np.testing.assert_allclose(
        np.asarray(ys), z[pre + "ys"], atol=1e-4, rtol=1e-4,
        err_msg=f"{name}: EM trajectory diverges from torch")
    np.testing.assert_allclose(
        float(loss), float(z[pre + "loss"]), rtol=1e-5)

    grad_names = [k[len(pre + "grad/"):] for k in z.files
                  if k.startswith(pre + "grad/")]
    assert grad_names, "goldens carry no gradients"
    for gname in grad_names:
        ref = z[pre + "grad/" + gname]
        ours = _grad_leaf(grads, gname)
        assert ours is not None, f"{name}: missing grad for {gname}"
        ours = np.asarray(ours, np.float64)
        denom = max(np.abs(ref).max(), 1e-8)
        rel = np.abs(ours - ref).max() / denom
        assert rel < 1e-4, (
            f"{name}: grad {gname} relative error {rel:.2e} >= 1e-4")


def test_srk_pathwise_parity_with_torchsde_scheme():
    """snsde's method='srk' reproduces the Rößler SRID2 scheme — torchsde's
    'srk' for diagonal Ito SDEs and the torch-ists stream family's default
    solver (nsde_model.py:63-69) — pathwise on shared (dW, I10), including
    gradients. Goldens from an independent float64 torch transcription of
    the tableau (tools/make_srk_goldens.py); order tests alone cannot
    distinguish two different valid order-1.5 schemes."""
    z = np.load(GOLDENS / "reference_srk.npz")
    a, b, c, d = [float(v) for v in z["params"]]

    from contextlib import contextmanager

    @contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        bm = BrownianGrid(
            grid=jnp.asarray(z["grid"]),
            dW=jnp.asarray(z["dW"]),
            U=jnp.asarray(z["I10"]),
        )
        y0 = jnp.asarray(z["y0"])
        ts = np.asarray(z["grid"])

        def run(params):
            aa, bb, cc, dd = params

            def f(t, y):
                return aa * y + bb * jnp.sin(t + y)

            def g(t, y):
                return cc * y + dd * jnp.cos(y)

            ys = sdeint(f, g, y0, ts, bm=bm, method="srk")
            return ys

        traj = run((a, b, c, d))
        np.testing.assert_allclose(np.asarray(traj), z["traj"],
                                   rtol=1e-10, atol=1e-10)

        def loss_fn(params):
            return jnp.sum(run(params)[-1] ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(
            (jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d))
        )
        np.testing.assert_allclose(float(loss), float(z["loss"]),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(grads), z["grads"],
                                   rtol=1e-8, atol=1e-10)
