"""Small pytree utilities for params/state."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def param_count(tree) -> int:
    """Total number of scalar parameters in a pytree.

    Reference equivalent: ``Conv2D::get_params_num`` (``conv2d.cpp:238-240``)
    existed per-layer but was never called; this is the whole-model version.
    """
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def cast_floats(tree, dtype):
    """Cast floating-point leaves to ``dtype`` (e.g. bf16 compute params)."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)
