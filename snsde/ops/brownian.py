"""Stateless, counter-based Brownian motion for TPU.

Replaces torchsde's stateful `BrownianInterval` (used implicitly by every
`torchsde.sdeint` call in the reference, e.g.
/root/reference/benchmark_classification/models_sde/neuralsde.py:78-82) with
threefry counter-derived increments:

  * reproducible: increments are a pure function of (key, step index);
  * order-independent: any step's dW can be generated without generating
    the previous ones — required for checkpointed/rematerialized backward
    passes and for sharding the batch without coordinating RNG state;
  * shardable: per-sample keys via vmap/fold_in, so a batch sharded over a
    device mesh draws identical noise regardless of device placement.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["brownian_increments", "space_time_levy_area", "BrownianGrid"]


def brownian_increments(key, grid, shape: Tuple[int, ...], dtype=jnp.float32):
    """Sample dW over a fixed step grid.

    key:   PRNG key.
    grid:  [M+1] strictly increasing solve times.
    shape: state shape per step, e.g. (batch, hidden) for diagonal noise.

    Returns dW: [M, *shape] with dW_k ~ N(0, grid[k+1]-grid[k]).
    One fused normal draw — the fastest path on TPU (single kernel, no
    per-step launches).
    """
    grid = jnp.asarray(grid)
    dts = grid[1:] - grid[:-1]
    m = dts.shape[0]
    eps = jax.random.normal(key, (m,) + tuple(shape), dtype)
    scale = jnp.sqrt(dts).reshape((m,) + (1,) * len(shape))
    return eps * scale


def space_time_levy_area(key, grid, shape: Tuple[int, ...], dW,
                         dtype=jnp.float32):
    """Space-time Lévy area H_k for strong order-1.5 SRK schemes.

    Given dW over the grid, returns U with
        U_k = dt_k/2 * (dW_k + dZ_k/sqrt(3)),   dZ_k ~ N(0, dt_k) indep.
    matching the (W, U) pair torchsde's BrownianInterval supplies to its
    SRK solvers for diagonal noise.
    """
    grid = jnp.asarray(grid)
    dts = grid[1:] - grid[:-1]
    m = dts.shape[0]
    dZ = jax.random.normal(key, (m,) + tuple(shape), dtype)
    sd = jnp.sqrt(dts).reshape((m,) + (1,) * len(shape))
    dt = dts.reshape((m,) + (1,) * len(shape))
    return 0.5 * dt * (dW + (dZ * sd) / jnp.sqrt(3.0))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BrownianGrid:
    """Pre-sampled Brownian increments bound to a step grid.

    Carries (dW, U) so solvers can be swapped without re-threading RNG.
    U is sampled lazily (None unless requested at construction).
    """

    grid: jnp.ndarray          # [M+1]
    dW: jnp.ndarray            # [M, *shape]
    U: Optional[jnp.ndarray]   # [M, *shape] or None

    @staticmethod
    def create(key, grid, shape, *, levy_area: bool = False,
               dtype=jnp.float32) -> "BrownianGrid":
        kw, ku = jax.random.split(key)
        dW = brownian_increments(kw, grid, shape, dtype)
        U = (
            space_time_levy_area(ku, grid, shape, dW, dtype)
            if levy_area
            else None
        )
        return BrownianGrid(grid=jnp.asarray(grid), dW=dW, U=U)

    def tree_flatten(self):
        return (self.grid, self.dW, self.U), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
