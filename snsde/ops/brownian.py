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


# ---------------------------------------------------------------------------
# Virtual Brownian Tree: W(t) at arbitrary t, O(1) memory, jit-compatible
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VirtualBrownianTree:
    """Arbitrary-time Brownian queries via fixed-depth bridge bisection.

    TPU-native equivalent of torchsde's `BrownianTree` (Li et al. 2020,
    "Scalable Gradients for SDEs"; used by the reference through
    torchsde's BrownianInterval for adaptive solvers). The path is a pure
    function of (key, t): querying W(t) descends `depth` levels of binary
    bisection of [t0, t1], sampling each midpoint from the Brownian
    bridge with a key derived by fold_in on the node index — no state,
    no stored path, identical values for identical queries in any order
    (the property adaptive solvers need when they re-query overlapping
    intervals after step rejection).

    Resolution: leaves have width (t1-t0)/2^depth; within a leaf W is
    bridge-interpolated linearly (exact in mean, variance error bounded
    by leaf width — pick depth so 2^-depth*(t1-t0) is far below solver
    tolerances; depth=18 gives ~4e-6 of the horizon).
    """

    key: jnp.ndarray
    t0: float
    t1: float
    shape: Tuple[int, ...]
    depth: int = 18
    dtype: object = jnp.float32

    def __post_init__(self):
        if self.t1 <= self.t0:
            raise ValueError("need t1 > t0")

    def evaluate(self, t):
        """W(t) with W(t0) = 0, W(t1) ~ N(0, t1-t0)."""
        t = jnp.asarray(t, self.dtype)
        w1 = jax.random.normal(
            jax.random.fold_in(self.key, 1), self.shape, self.dtype
        ) * jnp.sqrt(jnp.asarray(self.t1 - self.t0, self.dtype))

        def body(_, carry):
            s, e, ws, we, node = carry
            m = 0.5 * (s + e)
            span = e - s
            # Brownian bridge midpoint: N((ws+we)/2, span/4)
            km = jax.random.fold_in(self.key, node)
            wm = 0.5 * (ws + we) + jax.random.normal(
                km, self.shape, self.dtype
            ) * jnp.sqrt(0.25 * span)
            go_left = t < m
            s2 = jnp.where(go_left, s, m)
            e2 = jnp.where(go_left, m, e)
            ws2 = jnp.where(go_left, ws, wm)
            we2 = jnp.where(go_left, wm, we)
            # heap indexing: left child 2*node, right 2*node+1 (root = 2
            # so fold_in indices never collide with the endpoint draw at 1)
            node2 = jnp.where(go_left, 2 * node, 2 * node + 1)
            return (s2, e2, ws2, we2, node2)

        s0 = jnp.asarray(self.t0, self.dtype)
        e0 = jnp.asarray(self.t1, self.dtype)
        w0 = jnp.zeros(self.shape, self.dtype)
        s, e, ws, we, _ = jax.lax.fori_loop(
            0, self.depth, body, (s0, e0, w0, w1, jnp.asarray(2))
        )
        # linear (bridge-mean) interpolation inside the leaf
        frac = jnp.clip((t - s) / jnp.maximum(e - s, 1e-30), 0.0, 1.0)
        w = ws + frac * (we - ws)
        # exact endpoints
        w = jnp.where(t <= self.t0, w0, jnp.where(t >= self.t1, w1, w))
        return w

    def __call__(self, t):
        return self.evaluate(t)

    def tree_flatten(self):
        return (self.key,), (self.t0, self.t1, self.shape, self.depth,
                             self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)
