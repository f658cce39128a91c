"""Sequential container.

Reference equivalent: ``AlexNet``'s ``std::list<shared_ptr<Layer>>`` with
forward/backward/update loops (``alexnet.cpp:35-65``). Here: params/state are
name-keyed dict pytrees; ``apply`` is pure and jittable; activation capture
(for Grad-CAM, reference ``alexnet.cpp:95-142``) is an explicit argument
instead of per-layer cached ``output`` buffers.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp

from cnn_tpu.nn.module import Layer


class Sequential:
    def __init__(self, layers: Sequence[Layer]):
        names = [l.name for l in layers]
        assert len(names) == len(set(names)), f"duplicate layer names: {names}"
        self.layers: tuple[Layer, ...] = tuple(layers)

    def __iter__(self):
        return iter(self.layers)

    def __getitem__(self, name: str) -> Layer:
        for l in self.layers:
            if l.name == name:
                return l
        raise KeyError(name)

    def init(self, key: jax.Array, dtype=jnp.float32) -> tuple[dict, dict]:
        """Returns (params, state) dict pytrees keyed by layer name."""
        params, state = {}, {}
        keys = jax.random.split(key, max(len(self.layers), 2))
        for layer, k in zip(self.layers, keys):
            p, s = layer.init(k if (layer.has_params or layer.has_state) else None, dtype)
            if layer.has_params:
                params[layer.name] = p
            if layer.has_state:
                state[layer.name] = s
        return params, state

    def apply(self, params: dict, state: dict, x: jnp.ndarray, *,
              train: bool = False, rng: Optional[jax.Array] = None,
              compute_dtype=None, rng_offset: int = 0,
              capture: Iterable[str] = ()) -> tuple[jnp.ndarray, dict, dict]:
        """Pure forward. Returns (output, new_state, captured_activations).

        ``rng_offset`` shifts the per-layer rng fold index: a sub-Sequential
        that is a slice of a larger net (pipeline stem/head) passes its
        start index so rng-consuming layers draw the SAME keys they would
        draw in the full net.
        """
        capture = set(capture)
        new_state = dict(state)
        captured: dict[str, jnp.ndarray] = {}
        for i, layer in enumerate(self.layers):
            layer_rng = None
            if layer.needs_rng and rng is not None:
                layer_rng = jax.random.fold_in(rng, i + rng_offset)
            x, s = layer.apply(
                params.get(layer.name), state.get(layer.name), x,
                train=train, rng=layer_rng, compute_dtype=compute_dtype)
            if layer.has_state:
                new_state[layer.name] = s
            if layer.name in capture:
                captured[layer.name] = x
        return x, new_state, captured

    def out_shapes(self, in_shape: tuple[int, ...]) -> list[tuple[str, tuple[int, ...]]]:
        """Shape trace, like the reference's ``print_info`` (alexnet.cpp:38-57)."""
        shapes = []
        shape = in_shape
        for layer in self.layers:
            shape = layer.out_shape(shape)
            shapes.append((layer.name, shape))
        return shapes
