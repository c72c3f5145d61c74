"""Actionable errors for AD through the while_loop adaptive solvers.

The bounded-`lax.while_loop` adaptive solvers (ops/dopri.py,
ops/extra_solvers.py, and `sdeint_adaptive(differentiable=False)`) are not
reverse-mode differentiable: JAX's `while_loop` has no transpose rule, so
`jax.grad` through them dies deep in JAX internals with an opaque message.
The reference sidesteps this with checkpointed adjoint wrappers
(/root/reference/TorchDiffEqPack/odesolver_mem/adjoint.py); our fixed-grid
solvers are plain differentiable scans, so the right user action is almost
always "use a fixed-grid method" or `...(differentiable=True)` (the
masked-scan mode — identical results, supports BOTH reverse and forward
mode).

`nondiff_guard` attaches that advice: an identity `custom_vjp` whose
backward raises immediately — the clear error fires BEFORE the while_loop
transpose is attempted (backward passes run in reverse order).

Forward-mode (jvp/jacfwd): `custom_vjp` rejects jvp by design, so the
guard also blocks forward mode, which the raw while_loop DID support.
That rejection cannot be bypassed selectively (reverse-mode linearization
also runs a JVP trace, so skipping the guard under JVPTracers would
reopen the opaque-transpose hole). Instead the guard function's name
spells out the remedy, so JAX's own TypeError reads
"... custom_vjp function <solver>_output__pass_differentiable_True_for_AD"
— pass `differentiable=True` and forward mode works through the scan.
"""

from __future__ import annotations

import re

import jax

__all__ = ["nondiff_guard"]


def nondiff_guard(ys, solver: str, hint: str):
    """Identity on `ys` whose reverse-mode rule raises an actionable error
    (and whose name makes the forward-mode rejection actionable)."""

    def ident(x):
        return x

    # surfaces the remedy inside JAX's "can't apply forward-mode autodiff
    # (jvp) to a custom_vjp function <name>" TypeError
    ident.__name__ = (
        re.sub(r"\W+", "_", solver).strip("_")
        + "_output__pass_differentiable_True_for_AD"
    )
    ident = jax.custom_vjp(ident)

    def fwd(x):
        return x, None

    def bwd(_, g):
        raise NotImplementedError(
            f"{solver} is not reverse-mode differentiable (its adaptive "
            f"step loop is a lax.while_loop, which has no transpose rule). "
            f"{hint}"
        )

    ident.defvjp(fwd, bwd)
    try:
        return ident(ys)
    except TypeError as e:
        # custom_vjp rejects jvp at bind time: re-raise with the remedy
        if "forward-mode" in str(e):
            raise TypeError(
                f"{solver}: forward-mode autodiff (jvp/jacfwd) through "
                f"the while_loop adaptive path is blocked by its "
                f"reverse-mode guard. {hint}"
            ) from e
        raise
