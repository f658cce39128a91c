"""Activations.

ReLU matches the reference exactly, including the tie-at-zero gradient rule:
forward keeps ``x`` only where ``x >= 0`` is positive (``relu.cpp:21-26``),
backward zeroes the gradient wherever the *output* is ``<= 0``
(``relu.cpp:30-44``). ``jnp.where(x > 0, x, 0)`` autodiffs to exactly that
mask (zero cotangent at ``x == 0``), so no custom VJP is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0, x, jnp.zeros((), dtype=x.dtype))
