"""Minimal repro for the PLSTM fused-kernel exact-f32 compile crash
(BENCH_GATE_R5: the plstm/plstm_h128 `fused` arms die with an opaque
`tpu_compile_helper subprocess exit code 1`, while the bf16x3 arms
compile and run).

Isolates which in-kernel piece trips Mosaic by compiling the fused LSTM
kernel with the PLSTM sel stream at SNSDE_FUSED_MATMUL=f32, with full
tracebacks. Run on TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_plstm_f32.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["JAX_TRACEBACK_FILTERING"] = "off"
os.environ["SNSDE_FUSED_MATMUL"] = "f32"
os.environ["SNSDE_FUSED_TIME_RNN"] = "1"
os.environ["SNSDE_FUSED_RNN_MIN_H"] = "0"

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from snsde.models.time_rnn import PLSTM

    rng = np.random.default_rng(0)
    B, L, C, H = 256, 24, 6, 128
    model = PLSTM.create(jax.random.PRNGKey(0), C, H)
    xs = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    ts = jnp.broadcast_to(jnp.arange(L, dtype=jnp.float32)[None], (B, L))

    def loss(m):
        out, _ = m(xs, ts)
        return jnp.sum(out ** 2)

    try:
        val = jax.jit(loss)(model)
        print("fused f32 PLSTM compiled OK, loss:", float(val))
    except Exception as e:  # noqa: BLE001
        print("FAILED:", type(e).__name__)
        print(str(e)[:4000])


if __name__ == "__main__":
    main()
