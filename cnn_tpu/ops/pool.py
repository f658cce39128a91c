"""MaxPool2D with reference-parity argmax routing.

Reference semantics (``cpu/src/pool2d.cpp``):
- out extent ``floor((H - k + 2p) / step) + 1`` (``pool2d.cpp:14-15``), p = 0.
- forward records, per output cell, the flat input index of the window max;
  ties go to the FIRST max in row-major window scan order (strict ``<``
  comparison at ``pool2d.cpp:69-75``).
- backward scatters the incoming delta through that mask (``pool2d.cpp:92-109``).

TPU-first: forward is ``lax.reduce_window`` (fused by XLA); its VJP is XLA's
select-and-scatter, which also routes each window's cotangent to the first
max in row-major order — matching the reference tie-break exactly. After
ReLU, exact ties (zeros) are common, so this detail is load-bearing for
parity tests. A Pallas fused fwd+argmax / scatter-bwd pair lives in
``cnn_tpu/ops/pallas/pool.py``.

One deliberate divergence: when windows overlap (stride < kernel — never the
case in the reference model), the reference *overwrites* colliding input
slots (``pool2d.cpp:108`` uses ``=``, not ``+=``); select-and-scatter-add
accumulates, which is the mathematically correct VJP. Non-overlapping
configs are bit-identical.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def max_pool2d(x: jnp.ndarray, kernel_size: int = 2, stride: int = 2) -> jnp.ndarray:
    """NHWC max pooling, VALID padding. [B,H,W,C] -> [B,H',W',C]."""
    # NOTE: the init value must be a Python scalar literal so JAX recognizes
    # the max monoid and applies the select-and-scatter VJP.
    neg_inf = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def avg_pool2d(x: jnp.ndarray, kernel_size: int = 2, stride: int = 2) -> jnp.ndarray:
    """NHWC average pooling, VALID — listed as future work in the reference
    (cnn.cpp:21, TODO #7)."""
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return (summed / (kernel_size * kernel_size)).astype(x.dtype)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,C] spatial mean (reference TODO #7's 'Global Pool')."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
