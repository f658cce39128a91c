"""Tensor utility ops — completing the reference's Tensor3D surface.

The reference's ``Tensor3D`` carries several helpers that its main paths
never call (SURVEY.md §2 "dead tensor helpers"): ``div``
(data_format.cpp:70-73), ``normalize`` (:75-83, see ops/preprocess.py),
``rot180`` (:127-137), ``pad`` (:139-150), plus min/max/argmin/argmax
(:32-67) and the debug printers. Their jax.Array equivalents are one-liners;
they live here so the API surface is complete for users migrating code that
did use them.
"""

from __future__ import annotations

import jax.numpy as jnp


def div(x: jnp.ndarray, times) -> jnp.ndarray:
    """Elementwise division (reference Tensor3D::div)."""
    return x / times


def rot180(x: jnp.ndarray) -> jnp.ndarray:
    """Rotate each spatial plane by 180 deg (reference Tensor3D::rot180;
    NHWC here: flips H and W)."""
    return x[..., ::-1, ::-1, :]


def pad2d(x: jnp.ndarray, padding: int = 1, value: float = 0.0) -> jnp.ndarray:
    """Symmetric spatial zero-pad (reference Tensor3D::pad). NHWC."""
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = cfg[-2] = (padding, padding)
    return jnp.pad(x, cfg, constant_values=value)


def argmax_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Flat argmax over the whole tensor — a scalar index into the
    row-major buffer, exactly Tensor3D::argmax (data_format.cpp:32-67),
    which scans one image's full CHW buffer."""
    return jnp.argmax(x.reshape(-1))


def minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(x - min) / (max - min) — the grad-CAM normalization
    (alexnet.cpp:136-139). An all-constant input (zero range) maps to
    zeros, not NaN. The single definition — tools/gradcam.py uses this."""
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, 1e-12)
