"""Library-wide matmul precision policy (VERDICT r4 item 2).

The torch reference computes exact f32 throughout (TF32 off —
benchmark_classification/models_sde/neuralsde.py:295-307); on TPU,
XLA/Mosaic round f32 dot operands to bf16 at DEFAULT precision. snsde's
fused kernels pin their in-kernel dots (kernels/fused_em.py:_dot); the
package __init__ pins jax_default_matmul_precision="highest" so the SCAN
paths the dispatch gates route to compute at the same fidelity.
"""

import os
import subprocess
import sys

import jax
import numpy as np


def test_default_is_highest():
    # conftest imports snsde; the library default must be in effect.
    assert jax.config.jax_default_matmul_precision == "highest"


def test_platform_escape_hatch():
    env = dict(os.environ, SNSDE_MATMUL_PRECISION="platform")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import snsde;"
         "print(repr(jax.config.jax_default_matmul_precision))"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "highest" not in out.stdout


def test_scan_solver_inherits_policy():
    """A scan-path SDE solve under jit sees the pinned precision: the
    trajectory matches an explicitly precision-pinned solve bit-for-bit
    (on CPU both are exact f32 — this guards the wiring, the TPU-side
    numeric assertion lives in tests/test_fused_kernel.py)."""
    from snsde.fields import DiffusionField
    from snsde.ops.interp import CubicPath, hermite_cubic_coeffs
    from snsde.ops.solve import sdeint

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    B, L, C, H = 8, 6, 3, 7
    times = np.arange(L, dtype=np.float32)
    X = rng.normal(size=(B, L, C)).astype(np.float32)
    path = CubicPath(hermite_cubic_coeffs(jnp.asarray(times),
                                          jnp.asarray(X)), times)
    field = DiffusionField.create(jax.random.PRNGKey(0), C, H, H, 2,
                                  input_option=4, noise_option=17).bind(path)
    y0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    ys_default = sdeint(field.f, field.g, y0, times, key=key,
                        method="euler")
    with jax.default_matmul_precision("highest"):
        ys_pinned = sdeint(field.f, field.g, y0, times, key=key,
                           method="euler")
    np.testing.assert_array_equal(np.asarray(ys_default),
                                  np.asarray(ys_pinned))
