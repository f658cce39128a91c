"""Conv2D — TPU-native convolution.

Reference semantics (``cpu/src/conv2d.cpp``):
- padding is always 0 (``architectures.h:59``): output extent is
  ``floor((H - k) / stride) + 1`` (``conv2d.cpp:41-42``) — i.e. XLA 'VALID'.
- odd kernel >= 3 asserted (``conv2d.cpp:14``); default stride 2.
- init: weights and bias ~ N(0, 1) / 10 (``conv2d.cpp:22-30``; the /10 is
  ``random_times``, ``architectures.cpp:6``).
- the backward (w-grad correlation ÷ batch, input-delta scatter,
  ``conv2d.cpp:97-202``) is exactly the VJP of this forward under a
  batch-mean loss, so we rely on ``jax.grad`` instead of hand-rolling it.

TPU-first choices: NHWC activation layout / HWIO weights (the natural TPU
tiling: C is the 128-lane minor dim), ``lax.conv_general_dilated`` which XLA
lowers onto the MXU, and ``preferred_element_type=float32`` for bf16 inputs.
The im2col+MXU Pallas path lives in ``cnn_tpu/ops/pallas/conv.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv_out_size(size: int, kernel: int, stride: int, padding: int = 0) -> int:
    """floor((H - k + 2p) / s) + 1 — matches conv2d.cpp:41-42."""
    return (size - kernel + 2 * padding) // stride + 1


def conv2d_init(key: jax.Array, in_channels: int, out_channels: int,
                kernel_size: int = 3, dtype=jnp.float32,
                init_scale: float = 0.1) -> dict:
    """N(0,1) * init_scale init for both W and b, as the reference does.

    (The reference divides by ``random_times=10``; distribution matched,
    stream parity is impossible across C++/threefry — see core/rng.py.)
    """
    # the reference asserts odd k >= 3 (conv2d.cpp:14); k=1 is a superset
    # for projection shortcuts (ResNet family)
    assert kernel_size % 2 == 1 and kernel_size >= 1, "kernel must be odd >= 1"
    assert in_channels > 0 and out_channels > 0
    k_w, k_b = jax.random.split(key)
    w = jax.random.normal(k_w, (kernel_size, kernel_size, in_channels, out_channels),
                          dtype) * init_scale
    b = jax.random.normal(k_b, (out_channels,), dtype) * init_scale
    return {"w": w, "b": b}


def conv2d(params: dict, x: jnp.ndarray, stride: int = 2,
           compute_dtype=None, precision=None, padding: int = 0) -> jnp.ndarray:
    """NHWC conv: [B, H, W, Cin] -> [B, H', W', Cout].

    ``padding=0`` is the reference behavior (its const at architectures.h:59;
    padding support is its TODO #8, cnn.cpp:22) — symmetric zero padding is a
    superset here.

    Precision: f32 inputs default to HIGHEST (full-f32 MXU passes — required
    for the <=1e-4 logit-parity target); bf16 inputs use the fast path.
    """
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if precision is None and x.dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    # bf16 path: out dtype bf16 (MXU still accumulates f32 internally);
    # upcasting via preferred_element_type would make the VJP cotangent f32
    # and mismatch the bf16 filters in the transposed convs.
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="VALID" if padding == 0 else [(padding, padding)] * 2,
        dimension_numbers=DIMENSION_NUMBERS,
        precision=precision,
    )
    return out + b.astype(out.dtype)
