"""Fused Conv2D + bias + ReLU Pallas kernel (VALID, odd k, any stride).

Strategy (tap decomposition, a.k.a. implicit im2col for strided VALID
convs): a k x k conv is the sum of k*k shifted 1x1 convs; each tap is a
[Ho*Wo, Cin] x [Cin, Cout] matmul on the MXU, accumulated in f32 VMEM
scratch-free (the taps unroll statically, XLA-style). Stride-s subsampling
is done with the slice+reshape trick (slice s*Ho rows from offset dy, view
as (Ho, s, ...), keep plane 0) — no gathers, no dynamic shapes. Bias add
and ReLU fuse into the same kernel, saving one HBM round-trip of the
activation tensor vs. unfused exec.

This reproduces the reference's Conv2D+ReLU semantics (conv2d.cpp:34-92 +
relu.cpp:9-27: VALID extent floor((H-k)/s)+1, out = max(conv+b, 0)) in one
kernel launch per batch block.

Training: the kernel carries a custom VJP whose backward uses the XLA
transposed convolutions (cotangent masked by out > 0 first — the
reference's relu backward rule), so it can replace the unfused pair
anywhere.

Measured on one v5e (tools/bench_kernels.py, bs=128, f32/HIGHEST, max dev
vs XLA <= 2e-6): conv2 3.1 ms vs XLA 1.7 ms; conv3 3.1 vs 2.3; conv4 3.6 vs
2.3; conv1 at 64px 3.5 vs 2.9 (the 224px conv1 full-image block exceeds
VMEM — Cin=3 occupies 3 of 128 lanes, inflating every temporary 42x). XLA's
own conv+ReLU fusion therefore remains the default path; this kernel is the
opt-in alternative and the scaffold for shapes XLA mishandles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnn_tpu.ops.conv import DIMENSION_NUMBERS

# v5e has 128 MB of VMEM; the default 16 MB scoped limit starves the
# relayout temporaries of the small-C tap views (see pool.py).
VMEM_LIMIT = 100 * 2**20


def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, k, stride, relu):
    _, h, w_in, cin = x_ref.shape
    _, ho, wo, cout = out_ref.shape
    x = x_ref[0]
    # pad the tail so every tap's slice+reshape view is in-bounds; padded
    # values land only in discarded planes (last used row/col is always
    # dy + s*(Ho-1) <= H-1)
    pad_h = stride * ho - (h - k + 1)
    pad_w = stride * wo - (w_in - k + 1)
    if pad_h > 0 or pad_w > 0:
        x = jnp.pad(x, ((0, max(pad_h, 0)), (0, max(pad_w, 0)), (0, 0)))
    acc = jnp.zeros((ho * wo, cout), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            rows = x[dy:dy + stride * ho]
            rows = rows.reshape(ho, stride, *rows.shape[1:])[:, 0]
            cols = rows[:, dx:dx + stride * wo]
            patch = cols.reshape(ho, wo, stride, cin)[:, :, 0]
            # f32 inputs need HIGHEST (multi-pass MXU) to match the XLA twin;
            # bf16 inputs take the fast single-pass path
            prec = (lax.Precision.HIGHEST if patch.dtype == jnp.float32
                    else None)
            acc += jnp.dot(patch.reshape(ho * wo, cin), w_ref[dy, dx],
                           precision=prec,
                           preferred_element_type=jnp.float32)
    acc += b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(ho, wo, cout).astype(out_ref.dtype)


def _forward(x, w, b, stride, relu, interpret=False):
    bsz, h, w_in, cin = x.shape
    k = w.shape[0]
    ho = (h - k) // stride + 1
    wo = (w_in - k) // stride + 1
    cout = w.shape[-1]
    kern = partial(_conv_kernel, k=k, stride=stride, relu=relu)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, cout), x.dtype),
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, h, w_in, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, k, cin, cout), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cout,), lambda i: (0,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, w, b)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d_bias_relu_pallas(x, w, b, stride: int = 2, relu: bool = True):
    """Fused VALID conv + bias [+ ReLU]. x [B,H,W,Cin], w [k,k,Cin,Cout]."""
    return _forward(x, w, b, stride, relu)


def _vjp_fwd(x, w, b, stride, relu):
    out = _forward(x, w, b, stride, relu)
    # the backward only reads `out` for the relu mask — don't pin an
    # activation-sized residual in HBM for plain conv+bias uses
    return out, (x, w, out if relu else None)


def _vjp_bwd(stride, relu, res, g):
    x, w, out = res
    if relu:
        g = jnp.where(out > 0, g, jnp.zeros((), g.dtype))  # relu.cpp:30-44 rule
    k = w.shape[0]
    # f32 gradients need HIGHEST like the forward (and the XLA twin in
    # ops/conv.py); bf16 takes the fast single-pass MXU path
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    # dx: transposed conv (input-dilated cotangent correlated with flipped w)
    dx = lax.conv_transpose(
        g, w, strides=(stride, stride), padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS, transpose_kernel=True,
        precision=prec)
    # crop/pad to the exact input extent (VALID discards dangling rows)
    pads = [(0, x.shape[1] - dx.shape[1]), (0, x.shape[2] - dx.shape[2])]
    dx = jnp.pad(dx, ((0, 0), *pads, (0, 0)))
    # dw: correlate input with cotangent (batch as contraction dim)
    dw = lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0),            # [Cin, H, W, B]
        g.transpose(1, 2, 0, 3),            # [Ho, Wo, B, Cout]
        window_strides=(1, 1), padding="VALID",
        lhs_dilation=(1, 1), rhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec,
    ).transpose(1, 2, 0, 3)                 # [kh, kw, Cin, Cout]
    # the correlation extent is H-(Ho-1)*stride >= k, with equality only when
    # (H-k) % stride == 0; dangling input rows/cols never touch the kernel, so
    # crop to the true kernel extent (e.g. the 224->111 conv1 geometry)
    dw = dw[:k, :k]
    db = jnp.sum(g, axis=(0, 1, 2))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(g.dtype)


conv2d_bias_relu_pallas.defvjp(_vjp_fwd, _vjp_bwd)
