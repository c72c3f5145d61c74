"""Matmul operand-precision probe (the round-4 root-cause repro).

Measures the max abs error of a [N,K]x[K,N] f32 dot against exact f32
under each precision regime, both INSIDE a Mosaic (Pallas-TPU) kernel
and at the XLA (scan-path) level. On v5e this prints ~1.3e-1 for the
Mosaic/XLA DEFAULTs (f32 operands silently rounded to bf16 on the MXU —
the bug that broke every compiled-kernel parity test while the
interpret-mode CPU suite stayed green), 0.0 for HIGHEST (exact f32),
and ~3e-4 for the bf16x3 split-operand mode.

Usage: python tools/probe_precision.py  (runs on the live backend)
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    N, K = 8, 128
    rng = np.random.default_rng(0)
    a = rng.normal(size=(N, K)).astype(np.float32)
    b = rng.normal(size=(K, N)).astype(np.float32)
    # exact f32 reference: accumulate in f64 then round once
    exact = (a.astype(np.float64) @ b.astype(np.float64)).astype(np.float32)

    def kernel_factory(mode):
        def kernel(a_ref, b_ref, o_ref):
            x, w = a_ref[:], b_ref[:]
            if mode == "default":
                o_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32)
            elif mode == "highest":
                o_ref[:] = jnp.dot(x, w,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
            elif mode == "bf16":
                o_ref[:] = jnp.dot(x.astype(jnp.bfloat16),
                                   w.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
            elif mode == "bf16x3":
                xh = x.astype(jnp.bfloat16)
                xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
                wh = w.astype(jnp.bfloat16)
                wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
                d = lambda p, q: jnp.dot(
                    p, q, preferred_element_type=jnp.float32)
                o_ref[:] = d(xh, wh) + d(xh, wl) + d(xl, wh)
        return kernel

    print(f"probe dot: [{N},{K}] x [{K},{N}] N(0,1) f32 operands")
    for mode in ("default", "highest", "bf16x3", "bf16"):
        try:
            out = pl.pallas_call(
                kernel_factory(mode),
                out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
            )(jnp.asarray(a), jnp.asarray(b))
            err = float(np.abs(np.asarray(out) - exact).max())
            print(f"  in-kernel {mode:8s}: max abs err {err:.3e}")
        except Exception as e:  # noqa: BLE001 — print-and-continue probe
            print(f"  in-kernel {mode:8s}: FAILED {type(e).__name__}: {e}")

    for prec, label in ((None, "xla default"),
                        (jax.lax.Precision.HIGHEST, "xla highest")):
        out = jax.jit(
            lambda x, w: jnp.dot(x, w, precision=prec)
        )(jnp.asarray(a), jnp.asarray(b))
        err = float(np.abs(np.asarray(out) - exact).max())
        print(f"  {label:18s}: max abs err {err:.3e}")


if __name__ == "__main__":
    sys.exit(main())
