"""Device-side preprocessing.

The reference converts each decoded image on the host, one scalar at a time:
HWC-uint8-BGR interleaved -> CHW planar float / 255
(``Tensor3D::read_from_opencv_mat``, ``data_format.cpp:13-23``). Here the
uint8 bytes are shipped to the device raw (4x less PCIe/HBM traffic than
f32) and normalized on-chip; XLA fuses the convert+scale into whatever
consumes it. We stay NHWC (TPU-native tiling) instead of transposing to CHW.

``normalize`` optionally applies mean/std (the reference's dead
``Tensor3D::normalize``, ``data_format.cpp:75-83``, BGR-ordered ImageNet
stats, ``data_format.h:38``).

A Pallas fused kernel variant lives in ``cnn_tpu/ops/pallas/normalize.py``.
"""

from __future__ import annotations

import jax.numpy as jnp


def uint8_to_float(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[.., H, W, C] uint8 -> float in [0, 1].

    True division, not reciprocal-multiply: the reference computes
    ``(uint8 * 1.f) / 255`` (data_format.cpp:18-21) and the two differ by
    1 ulp for some byte values, which matters for bit-parity tests.
    """
    return x.astype(dtype) / jnp.asarray(255.0, dtype=dtype)


def normalize(x: jnp.ndarray, mean=(0.406, 0.456, 0.485),
              std=(0.225, 0.224, 0.229)) -> jnp.ndarray:
    """Channel-wise (x - mean) / std; defaults are the reference's BGR stats."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std


def preprocess_batch(raw_uint8: jnp.ndarray, dtype=jnp.float32,
                     with_normalize: bool = False) -> jnp.ndarray:
    """uint8 NHWC batch -> float NHWC batch in one fused expression."""
    x = uint8_to_float(raw_uint8, dtype)
    if with_normalize:
        x = normalize(x)
    return x
