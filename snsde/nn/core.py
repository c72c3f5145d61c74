"""Minimal pytree-native module system for the snsde framework.

Modules are frozen dataclasses registered as JAX pytrees: parameters are array
leaves, hyperparameters are static metadata. This gives equinox-style
filtered transformations with ~zero dependencies and full control over what
XLA sees — every module instance is directly jittable / vmappable / shardable.

Design notes (TPU-first):
  * No mutable state anywhere. BatchNorm running statistics are `Buffer`
    leaves: traced (so they live on device, updated functionally) but
    excluded from gradients by `partition`.
  * Static fields never appear as tracers, so Python-level `if` dispatch on
    hyperparameters (e.g. the noise_option grid) folds away at trace time
    into a single fused XLA graph per configuration.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = [
    "Module",
    "module",
    "static_field",
    "field",
    "Buffer",
    "buffer",
    "is_trainable",
    "partition",
    "combine",
    "filter_value_and_grad",
    "tree_count_params",
]


def static_field(**kwargs):
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


field = dataclasses.field


@jax.tree_util.register_pytree_node_class
class Buffer:
    """Wraps a non-trainable array (e.g. BatchNorm running stats).

    The wrapped value is a pytree leaf child — it is traced and transformed
    like any array — but `partition` routes it to the static/frozen side so
    gradients are never taken through it.
    """

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def tree_flatten(self):
        return (self.value,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def __repr__(self):
        return f"Buffer({self.value!r})"


def buffer(value):
    return Buffer(jnp.asarray(value))


def module(cls):
    """Class decorator: frozen dataclass + pytree registration.

    Fields created with `static_field` become aux data (hashable, compared by
    equality for jit caching); all other fields are pytree children.
    """
    cls = dataclasses.dataclass(frozen=True, repr=False)(cls)

    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)

    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def _repr(self):
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, jnp.ndarray):
                parts.append(f"{f.name}=Array{list(v.shape)}")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{cls.__name__}({', '.join(parts)})"

    cls.__repr__ = _repr
    return cls


class Module:
    """Base marker class. Subclasses should be decorated with @module."""

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)


# ---------------------------------------------------------------------------
# Filtered transformations
# ---------------------------------------------------------------------------

_SENTINEL = object()


def _is_buffer(x):
    return isinstance(x, Buffer)


def is_trainable(leaf) -> bool:
    """True for inexact array leaves that are not wrapped in Buffer."""
    if isinstance(leaf, Buffer):
        return False
    if isinstance(leaf, (jnp.ndarray, jax.Array)):
        return jnp.issubdtype(leaf.dtype, jnp.inexact)
    import numpy as np

    if isinstance(leaf, np.ndarray):
        return np.issubdtype(leaf.dtype, np.inexact)
    return False


def partition(tree):
    """Split a module tree into (params, rest).

    `params` has trainable leaves and None elsewhere; `rest` is the
    complement. `combine(params, rest)` reassembles the original tree.
    Buffers are treated as single leaves on the `rest` side.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=_is_buffer)
    params_leaves = [x if is_trainable(x) else None for x in leaves]
    rest_leaves = [None if is_trainable(x) else x for x in leaves]
    params = jax.tree_util.tree_unflatten(treedef, params_leaves)
    rest = jax.tree_util.tree_unflatten(treedef, rest_leaves)
    return params, rest


def combine(params, rest):
    """Inverse of `partition`."""

    def _merge(p, r):
        return r if p is None else p

    leaves_p, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: x is None or _is_buffer(x)
    )
    leaves_r = treedef.flatten_up_to(rest)
    merged = [_merge(p, r) for p, r in zip(leaves_p, leaves_r)]
    return jax.tree_util.tree_unflatten(treedef, merged)


def filter_value_and_grad(fn, has_aux: bool = False):
    """value_and_grad over only the trainable leaves of the first argument."""

    def wrapped(model, *args, **kwargs):
        params, rest = partition(model)

        def inner(p):
            m = combine(p, rest)
            return fn(m, *args, **kwargs)

        return jax.value_and_grad(inner, has_aux=has_aux)(params)

    return wrapped


def tree_count_params(tree) -> int:
    params, _ = partition(tree)
    return sum(
        x.size for x in jax.tree_util.tree_leaves(params) if x is not None
    )
