"""Optimizers.

The reference applies plain SGD inside each layer (``w -= lr * dw``,
``conv2d.cpp:205-217``, ``linear.cpp:95-102``, ``batchnorm2d.cpp:161-166``)
and lists momentum/Adam as unimplemented future work (``cnn.cpp:17``). Here
the optimizer is a separate pure transform; ``sgd`` is bit-faithful to the
reference update, and momentum/Adam come via optax as supersets.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple[Any, Any]]  # (grads, opt_state, params) -> (params, opt_state)


def sgd(learning_rate: float) -> Optimizer:
    """Plain SGD: ``w -= lr * g`` — the reference's exact update."""
    lr = jnp.float32(learning_rate)

    def init(params):
        return ()

    def update(grads, opt_state, params):
        new_params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g.astype(p.dtype)).astype(p.dtype), params, grads)
        return new_params, opt_state

    return Optimizer(init, update)


def from_optax(tx: optax.GradientTransformation) -> Optimizer:
    def init(params):
        return tx.init(params)

    def update(grads, opt_state, params):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    return Optimizer(init, update)


def make_optimizer(name: str, learning_rate: float, momentum: float = 0.0) -> Optimizer:
    if name == "sgd" and momentum == 0.0:
        return sgd(learning_rate)
    if name in ("sgd", "momentum"):
        return from_optax(optax.sgd(learning_rate, momentum=momentum or 0.9))
    if name == "adam":
        return from_optax(optax.adam(learning_rate))
    raise ValueError(f"unknown optimizer '{name}'")
