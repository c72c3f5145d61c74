"""Actionable errors for reverse-mode AD through adaptive solvers.

The bounded-`lax.while_loop` adaptive solvers (ops/dopri.py,
ops/extra_solvers.py, and `sdeint_adaptive(differentiable=False)`) are not
reverse-mode differentiable: JAX's `while_loop` has no transpose rule, so
`jax.grad` through them dies deep in JAX internals with an opaque message.
The reference sidesteps this with checkpointed adjoint wrappers
(/root/reference/TorchDiffEqPack/odesolver_mem/adjoint.py); our fixed-grid
solvers are plain differentiable scans, so the right user action is almost
always "use a fixed-grid method" or, for adaptive EM, `sdeint_adaptive(...,
differentiable=True)` (masked-scan mode, identical results).

`nondiff_guard` attaches that advice: an identity `custom_vjp` whose
backward raises immediately — the clear error fires BEFORE the while_loop
transpose is attempted (backward passes run in reverse order).
Forward-mode JVP through the guarded solvers is unaffected only when the
cotangent never reaches the guard; `jax.custom_vjp` itself rejects
forward-mode, which these while_loop solvers never supported usefully
anyway (their step controls are non-differentiable).
"""

from __future__ import annotations

import jax

__all__ = ["nondiff_guard"]


def nondiff_guard(ys, solver: str, hint: str):
    """Identity on `ys` whose reverse-mode rule raises an actionable error."""

    @jax.custom_vjp
    def ident(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        raise NotImplementedError(
            f"{solver} is not reverse-mode differentiable (its adaptive "
            f"step loop is a lax.while_loop, which has no transpose rule). "
            f"{hint}"
        )

    ident.defvjp(fwd, bwd)
    return ident(ys)
