"""Explicit RNG plumbing.

The reference scatters six fixed-seed ``std::default_random_engine``s across
layers and the pipeline (conv init 212 ``conv2d.cpp:23``, linear init 1998
``linear.cpp:14``, dropout 1314 ``architectures.h:188``, augmentor
212/826/320/520 ``pipeline.h:34``). C++ engine streams cannot be reproduced
from JAX's threefry, so we keep the *discipline* (named, deterministic
streams) with JAX-native keys. Cross-framework parity therefore always flows
through loaded checkpoints, never fresh inits (see SURVEY.md §7).
"""

from __future__ import annotations

import zlib

import jax


class RngStream:
    """Deterministic named key derivation from one root seed."""

    def __init__(self, seed: int):
        self._root = jax.random.key(seed)

    def key(self, name: str, step: int = 0) -> jax.Array:
        # zlib.crc32 is stable across processes (unlike str hash()).
        k = jax.random.fold_in(self._root, zlib.crc32(name.encode()) & 0x7FFFFFFF)
        if step:
            k = jax.random.fold_in(k, step)
        return k
