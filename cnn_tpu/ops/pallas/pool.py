"""Fused MaxPool2D (k=2, s=2) Pallas kernels: forward+argmax, scatter backward.

The reference records, per output cell, the flat index of the window max and
scatters the incoming delta through it (pool2d.cpp:63-109, first-max-wins on
ties via strict '<'). Here the same semantics run on the VPU: the forward
kernel computes max and a 2-bit window-argmax in one pass (row-major tap
order 00,01,10,11 — ties keep the earlier tap, matching the reference); the
backward kernel routes the cotangent to the recorded tap and re-interleaves.

Odd input extents (e.g. the 111x111 conv1 output) are handled by cropping
the dangling row/col, exactly like the reference's loop bounds.

For kernels/strides other than 2/2 use the XLA path (ops/pool.py), whose
select-and-scatter VJP has the same tie-break.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e has 128 MB of VMEM; the compiler's default 16 MB scoped limit is too
# tight for the relayout temporaries the small-C (16-lane) reshapes create.
VMEM_LIMIT = 100 * 2**20


def _fwd_kernel(x_ref, out_ref, mask_ref):
    _, h2, w2, c = out_ref.shape
    x = x_ref[0, : 2 * h2, : 2 * w2, :]
    x = x.reshape(h2, 2, w2, 2, c)
    x00 = x[:, 0, :, 0, :]
    x01 = x[:, 0, :, 1, :]
    x10 = x[:, 1, :, 0, :]
    x11 = x[:, 1, :, 1, :]
    m0 = jnp.maximum(x00, x01)
    i0 = jnp.where(x01 > x00, 1, 0)
    m1 = jnp.maximum(x10, x11)
    i1 = jnp.where(x11 > x10, 3, 2)
    out_ref[0] = jnp.maximum(m0, m1)
    mask_ref[0] = jnp.where(m1 > m0, i1, i0).astype(jnp.int32)


def _bwd_kernel(mask_ref, g_ref, dx_ref):
    _, h, w, c = dx_ref.shape
    h2, w2 = h // 2, w // 2
    g = g_ref[0]
    idx = mask_ref[0]
    taps = [jnp.where(idx == k, g, jnp.zeros((), g.dtype)) for k in range(4)]
    # re-interleave (h2, 2, w2, 2, c) -> (2*h2, 2*w2, c)
    top = jnp.stack([taps[0], taps[1]], axis=2)      # (h2, w2, 2, c)
    bot = jnp.stack([taps[2], taps[3]], axis=2)
    rows = jnp.stack([top, bot], axis=1)             # (h2, 2, w2, 2, c)
    dx = rows.reshape(2 * h2, 2 * w2, c)
    if 2 * h2 != h or 2 * w2 != w:                   # cropped odd row/col: zero
        dx = jnp.pad(dx, ((0, h - 2 * h2), (0, w - 2 * w2), (0, 0)))
    dx_ref[0] = dx


def _fwd_call(x, interpret=False):
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    out, mask = pl.pallas_call(
        _fwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((b, h2, w2, c), x.dtype),
                   jax.ShapeDtypeStruct((b, h2, w2, c), jnp.int32)),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, h2, w2, c), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, h2, w2, c), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x)
    return out, mask


def _bwd_call(mask, g, h, w, interpret=False):
    b, h2, w2, c = g.shape
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), g.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h2, w2, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, h2, w2, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(mask, g)


@jax.custom_vjp
def max_pool2d_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H//2,W//2,C] max pool, k=2 s=2."""
    out, _ = _fwd_call(x)
    return out


def _vjp_fwd(x):
    out, mask = _fwd_call(x)
    return out, (mask, x.shape[1], x.shape[2])


def _vjp_bwd(res, g):
    mask, h, w = res
    return (_bwd_call(mask, g, h, w),)


max_pool2d_pallas.defvjp(_vjp_fwd, _vjp_bwd)
