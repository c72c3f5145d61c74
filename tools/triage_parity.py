"""Round-4 TPU parity triage: bug vs chaotic amplification.

For each failing fused kernel family (EM emb-drift, CDE, latent) this
prints, on real TPU:

  1. the per-output-step max|fused - scan| error of the FULL solve
     (the growth curve — exponential growth from ~1e-6 means benign
     per-op rounding differences amplified by the dynamics; a large
     error at step 1 means a real kernel bug), and
  2. STEPWISE injection errors: one fused step started FROM the scan
     trajectory's state at step k (same dW), which measures the per-step
     error with no amplification at all.

EM also A/Bs SNSDE_FUSED_HOIST=0 (in-kernel xh@we2, the round-2 layout)
vs =1 to isolate the hoist's rounding change.

Usage: python tools/triage_parity.py [em|cde|latent|all]
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from snsde.fields import DiffusionField
from snsde.ops.brownian import BrownianGrid, brownian_increments
from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
from snsde.ops.solve import cdeint, make_grid, sdeint

B, L, C, H = 128, 12, 5, 33
DT = 1.0      # grid == times: scan states land on every fused grid point


def _curve(a, b):
    return np.max(np.abs(np.asarray(a) - np.asarray(b)), axis=(1, 2))


def _fmt(c):
    return " ".join(f"{v:.2e}" for v in c)


def em():
    from snsde.kernels.fused_em import fused_em_solve

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    path = CubicPath(hermite_cubic_coeffs(jnp.asarray(times),
                                          jnp.asarray(X)), times)
    field = DiffusionField.create(key, C, H, H, 2, input_option=4,
                                  noise_option=17).bind(path)
    y0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    kb = jax.random.fold_in(key, 7)
    grid, _ = make_grid(times, DT)
    kw, _ = jax.random.split(kb)
    dW = brownian_increments(kw, grid, (B, H))
    bm = BrownianGrid(grid=jnp.asarray(grid), dW=dW, U=None)

    with jax.default_matmul_precision("highest"):
        ys_ref = sdeint(field.f, field.g, y0, times, bm=bm, method="euler")
    for hoist in ("1", "0"):
        os.environ["SNSDE_FUSED_HOIST"] = hoist
        ys_f = fused_em_solve(field, path, times, y0, kb, dt=DT)
        print(f"EM hoist={hoist} growth: {_fmt(_curve(ys_f, ys_ref))}")

    # stepwise: one fused step from the scan state at step k, same dW
    for hoist in ("1", "0"):
        os.environ["SNSDE_FUSED_HOIST"] = hoist
        errs = []
        for k in (0, 3, 7, 10):
            yk = ys_ref[k]
            ts2 = times[k:k + 2]
            ys1 = fused_em_solve(field, path, ts2, yk, kb, dt=DT,
                                 dW_override=dW[k:k + 1])
            err = float(jnp.max(jnp.abs(ys1[-1] - ys_ref[k + 1])))
            errs.append(f"k={k}:{err:.2e}")
        print(f"EM hoist={hoist} stepwise: {' '.join(errs)}")
    os.environ.pop("SNSDE_FUSED_HOIST", None)


def cde():
    from snsde.kernels.fused_cde import fused_cde_solve
    from snsde.models.neuralcde import FinalTanh

    rng = np.random.default_rng(0)
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    path = CubicPath(hermite_cubic_coeffs(jnp.asarray(times),
                                          jnp.asarray(X)), times)
    func = FinalTanh.create(jax.random.PRNGKey(3), C, H, H, 2)
    z0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    for method in ("euler", "rk4"):
        with jax.default_matmul_precision("highest"):
            zs_ref = cdeint(path, func, z0, times, dt=DT, method=method)
        zs_f = fused_cde_solve(func, path, times, z0, dt=DT, method=method)
        print(f"CDE[{method}] growth: {_fmt(_curve(zs_f, zs_ref))}")
        errs = []
        for k in (0, 3, 7, 10):
            zs1 = fused_cde_solve(func, path, times[k:k + 2], zs_ref[k],
                                  dt=DT, method=method)
            err = float(jnp.max(jnp.abs(zs1[-1] - zs_ref[k + 1])))
            errs.append(f"k={k}:{err:.2e}")
        print(f"CDE[{method}] stepwise: {' '.join(errs)}")


def latent():
    from snsde.kernels.fused_em import fused_latent_em_solve
    from snsde.models.latent_sde import LatentSDE

    rng = np.random.default_rng(0)
    times = np.arange(10, dtype=np.float32)
    model = LatentSDE.create(jax.random.PRNGKey(1), C, H, H, 2,
                             method="euler")
    aug0 = jnp.concatenate(
        [jnp.asarray(rng.normal(size=(B, H - 1)), jnp.float32),
         jnp.zeros((B, 1))], axis=-1)
    key = jax.random.PRNGKey(5)
    with jax.default_matmul_precision("highest"):
        ys_ref = sdeint(model.f_aug, model.g_aug, aug0, times, key=key,
                        dt=DT, method="euler")
    ys_f = fused_latent_em_solve(model, times, aug0, key, dt=DT)
    print(f"latent growth: {_fmt(_curve(ys_f, ys_ref))}")
    # KL lane separately (it accumulates, so its scale grows)
    klc = np.max(np.abs(np.asarray(ys_f[..., -1]) -
                        np.asarray(ys_ref[..., -1])), axis=1)
    print(f"latent KL-lane growth: {_fmt(klc)}")
    errs = []
    for k in (0, 3, 7):
        # per-step keyed draw differs between a sliced and a full grid, so
        # advance BOTH paths one step from the scan state with the same key
        ts2 = times[k:k + 2]
        with jax.default_matmul_precision("highest"):
            ys_s1 = sdeint(model.f_aug, model.g_aug, ys_ref[k], ts2,
                           key=key, dt=DT, method="euler")
        ys_f1 = fused_latent_em_solve(model, ts2, ys_ref[k], key, dt=DT)
        err = float(jnp.max(jnp.abs(ys_f1[-1] - ys_s1[-1])))
        errs.append(f"k={k}:{err:.2e}")
    print(f"latent stepwise: {' '.join(errs)}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("em", "all"):
        em()
    if which in ("cde", "all"):
        cde()
    if which in ("latent", "all"):
        latent()
