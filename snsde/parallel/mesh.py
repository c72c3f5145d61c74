"""Device mesh + sharding: the framework's communication backend.

The reference has no distributed layer at all (SURVEY.md §2.9 — every entry
point pins one GPU). This module is the TPU-native replacement designed in
SURVEY.md §5: batch data-parallelism over a 1-D ('data',) mesh riding ICI,
with optional ('data','model') 2-D meshes for tensor-sharded readouts.
Collectives are never written by hand — shardings are annotated on the jit
boundary and XLA inserts all-reduces (psum of grads) over ICI automatically.

Multi-host (DCN) initialization goes through `jax.distributed.initialize`
via `init_multihost`; after that, global `jax.Array`s over the mesh span
hosts transparently.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "init_multihost",
    "local_device_count",
    "pad_to_multiple",
]


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a device mesh. Default: all devices on one 'data' axis.

    shape: per-axis sizes; None -> all devices on the first axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim across `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Device-put every array leaf with its leading dim split over `axis`.
    Scalar/0-d leaves are replicated."""
    bsh = batch_sharding(mesh, axis)
    rsh = replicated(mesh)

    def _put(x):
        x = jax.numpy.asarray(x)
        sh = bsh if x.ndim >= 1 and x.shape[0] % mesh.shape[axis] == 0 else rsh
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(_put, tree)


def replicate(tree, mesh: Mesh):
    rsh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), rsh), tree
    )


def pad_to_multiple(arr, multiple: int, axis: int = 0, value=0.0):
    """Pad `axis` up to a multiple (needed to shard uneven final batches).
    Returns (padded, original_length)."""
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    return np.pad(np.asarray(arr), widths, constant_values=value), n


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization. No-op on a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_device_count() -> int:
    return jax.local_device_count()
