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
from jax.ad_checkpoint import checkpoint_name

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


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """[B, H, W, C] -> [B, ceil(H/b), ceil(W/b), b*b*C].

    Output channel layout is ``(py, px, c)``-major: channel index
    ``(py*b + px)*C + c`` holds input pixel ``(b*i + py, b*j + px, c)``.
    Odd extents are zero-padded on the bottom/right; the repacked weights
    (``s2d_repack_weights``) place zeros on every tap that would read the
    padding, so the transform stays exact.
    """
    b = block
    B, H, W, C = x.shape
    ph, pw = (-H) % b, (-W) % b
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    H2, W2 = (H + ph) // b, (W + pw) // b
    x = x.reshape(B, H2, b, W2, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H2, W2, b * b * C)


def s2d_repack_weights(w: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Exact weight repack for running a stride-``b`` conv as stride-1 on
    space-to-depth input: ``[k, k, cin, cout] -> [K, K, b*b*cin, cout]``
    with ``K = ceil(k/b)``.

    Tap ``(dy, dx)`` of the original kernel lands at spatial position
    ``(dy//b, dx//b)`` and input channel ``((dy%b)*b + dx%b)*cin + c`` —
    the layout ``space_to_depth`` produces. Positions with ``dy`` or ``dx``
    beyond ``k-1`` (the pad ring) stay zero, which also masks any
    bottom/right zero-padding of odd input extents. The map is linear, so
    gradients flow back to the original ``[k,k,cin,cout]`` parameters and
    checkpoints keep the reference layout (conv2d.cpp:220-226).
    """
    b = block
    k, _, cin, cout = w.shape
    K = -(-k // b)
    pad = K * b - k
    w = jnp.pad(w, ((0, pad), (0, pad), (0, 0), (0, 0)))
    w = w.reshape(K, b, K, b, cin, cout)          # (Ky, py, Kx, px, ci, co)
    w = w.transpose(0, 2, 1, 3, 4, 5)             # (Ky, Kx, py, px, ci, co)
    return w.reshape(K, K, b * b * cin, cout)


def conv2d_s2d(params: dict, x: jnp.ndarray, stride: int = 2,
               compute_dtype=None, precision=None,
               padding: int = 0) -> jnp.ndarray:
    """Stride-2 conv executed as space-to-depth + stride-1 conv.

    Bit-for-bit the same multiply-adds as ``conv2d`` (summed in a
    different association order), but the MXU sees ``4*cin`` input lanes
    instead of ``cin`` — the canonical TPU answer to small-``cin``
    stride-2 convs like the reference's conv1 (3 channels at 224 px,
    conv2d.cpp:69-92), where a direct conv uses 3 of the systolic array's
    128 input lanes.
    """
    assert stride == 2, "s2d path is the stride-2 specialization"
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if precision is None and x.dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    out = lax.conv_general_dilated(
        space_to_depth(x, 2), s2d_repack_weights(w, 2),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS,
        precision=precision,
    )
    # slice to the direct conv's floor extents (conv2d.cpp:41-42): for even
    # kernels on odd input extents the s2d bottom/right zero row is NOT
    # masked by zero weight taps (pad = K*b-k = 0) and would otherwise
    # contribute one extra, synthetic output row/col
    k = w.shape[0]
    oh = (x.shape[1] - k) // 2 + 1
    ow = (x.shape[2] - k) // 2 + 1
    out = out[:, :oh, :ow, :]
    return checkpoint_name(out + b.astype(out.dtype), "conv_out")


def depthwise_conv2d_init(key: jax.Array, channels: int,
                          channel_multiplier: int = 1, kernel_size: int = 3,
                          dtype=jnp.float32, init_scale: float = 0.1) -> dict:
    """Per-channel filter bank: ``w [k, k, 1, C*mult]``, ``b [C*mult]``.

    HWIO with ``feature_group_count=C``: output channel ``g*mult + m`` reads
    only input channel ``g``. Same N(0,1)*scale init family as ``conv2d_init``
    (the reference has no grouped convs — its Conv2D is dense over cin,
    conv2d.cpp:69-92 — so this op is a framework superset)."""
    assert kernel_size % 2 == 1 and kernel_size >= 1
    assert channels > 0 and channel_multiplier > 0
    k_w, k_b = jax.random.split(key)
    w = jax.random.normal(
        k_w, (kernel_size, kernel_size, 1, channels * channel_multiplier),
        dtype) * init_scale
    b = jax.random.normal(k_b, (channels * channel_multiplier,),
                          dtype) * init_scale
    return {"w": w, "b": b}


def depthwise_conv2d(params: dict, x: jnp.ndarray, stride: int = 1,
                     compute_dtype=None, precision=None, padding: int = 0,
                     channel_multiplier: int | None = None) -> jnp.ndarray:
    """Depthwise conv: each input channel convolved with its own ``mult``
    filters — [B, H, W, C] -> [B, H', W', C*mult].

    XLA lowers ``feature_group_count=C`` grouped convs natively; on TPU a
    depthwise conv is VPU/bandwidth-bound (one input lane per MAC group, no
    MXU reuse), which is exactly why MobileNet-style nets trade it for a
    9x FLOP cut — the pointwise 1x1 that follows is pure MXU.

    ``channel_multiplier``: the layer's declared multiplier. Divisibility
    alone is too weak a guard — an x with HALF the channels the bank was
    built for still divides ``w.shape[3]`` and would silently run as a
    grouped conv with twice the multiplier (r3 advisor finding); the exact
    relation ``w.shape[3] == C * mult`` rejects it."""
    w, b = params["w"], params["b"]
    channels = x.shape[-1]
    assert w.shape[2] == 1 and w.shape[3] % channels == 0, (w.shape, channels)
    if channel_multiplier is not None:
        assert w.shape[3] == channels * channel_multiplier, (
            f"depthwise filter bank {w.shape} was built for "
            f"{w.shape[3] // channel_multiplier} channels x mult "
            f"{channel_multiplier}; input has {channels} channels")
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if precision is None and x.dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="VALID" if padding == 0 else [(padding, padding)] * 2,
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=channels,
        precision=precision,
    )
    return checkpoint_name(out + b.astype(out.dtype), "conv_out")


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
    # named for selective rematerialization (StackedBlocks remat='conv'
    # saves conv outputs, recomputes the cheap elementwise tail); an
    # identity outside jax.checkpoint policies
    return checkpoint_name(out + b.astype(out.dtype), "conv_out")
