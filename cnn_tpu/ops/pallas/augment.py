"""Fused three-shear rotation kernel (the augmentation hot spot).

The reference rotates on the host with ``cv::warpAffine``
(``pipeline.cpp:23-33``); the TPU-native policy runs rotation on-device.
XLA's options both lose: ``map_coordinates`` lowers to per-pixel scalar
gathers (~925 ms per 256-batch), and the gather-free bit-roll shear
(``ops/augment.py``) needs ~26 roll/select passes that each round-trip HBM
(~155 ms). This kernel runs the identical bit-roll algorithm entirely in
VMEM: per image it reads the canvas once, applies the Paeth shear sequence
Sx(m)->Sy(n)->Sx(m) as register/VMEM rolls and selects inside a padded
scratch, and writes the rotated canvas once — HBM traffic drops from ~30
passes to 2.

Layout: the [S, S, C] canvas is viewed as [S, S*C] so the C=3 minor dim
never wastes vector lanes; x-shears roll LANES by C*shift with per-sublane
(row) masks, the y-shear rolls SUBLANES with per-lane (column) masks.

Numerics match ``ops.augment._rotate_shear_batch`` exactly (same integer
bit decomposition, same 2-tap fractional blend) — asserted in
``tests/test_pallas.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 100 * 2**20


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def shear_bounds(s: int) -> tuple[int, int, int]:
    """Max |shift| in px per shear for content pre-shrunk by 1/f (see
    ops/augment.py): tan(th/2)*h, sin(th)*h*(1+tan(th/2)), tan(th/2)*h*f,
    maximized over th in [15, 75] deg with h = s/(2f)."""
    return int(0.313 * s) + 2, int(0.696 * s) + 2, int(0.384 * s) + 2


def _rotate_core(img, s1, s2, s3, *, s, c, sub, lane, pad_s, pad_l, roll):
    """Shared shear math: runs on VALUES so the Pallas kernel (pltpu.roll)
    and the XLA fallback (jnp.roll) are the same code — they agree exactly.

    ``img``: [s, s*c] flattened canvas; ``s1``/``s3``: [s, 1] per-row px
    shifts; ``s2``: [1, lane] per-lane px shifts over the FULL padded
    extent; ``roll(x, shift, axis)``.
    """
    plc = pad_l * c
    dt = img.dtype
    # Mosaic has no scatter: build padded arrays with jnp.pad (concats)
    x = jnp.pad(img, ((pad_s, sub - pad_s - s), (plc, lane - plc - s * c)))

    row_idx = lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
    lane_idx = lax.broadcasted_iota(jnp.int32, (1, lane), 1)
    in_rows = (row_idx >= pad_s) & (row_idx < pad_s + s)

    def pad_rows(v, fill):
        return jnp.pad(v, ((pad_s, sub - pad_s - s), (0, 0)),
                       constant_values=fill)

    def lane_shear(x, shifts):
        # out[y, u] = x[y, u + c*shifts[y]]  (bilinear, window-invariant)
        k = jnp.floor(shifts)
        a = pad_rows(shifts - k, 0.0).astype(dt)
        ki = pad_rows(k.astype(jnp.int32) + pad_l, pad_l)
        for j in range((2 * pad_l).bit_length()):
            bit = ((ki >> j) & 1) == 1
            x = jnp.where(bit, roll(x, -(c << j), 1), x)
        x = x * (dt.type(1) - a) + roll(x, -c, 1) * a
        x = roll(x, pad_l * c, 1)                  # re-center the window
        # mask only circular-wrap junk: out[u] sourced x[u + (ki-pad_l)*c]
        # (+c for the 2nd bilinear tap). Content legitimately overflows the
        # S window into the padding when |theta| > 45 deg (the first
        # shear's intermediate half-extent h*(1+tan(th/2)) exceeds S/2) —
        # it must survive into the next shear, not be window-clipped.
        src = lane_idx + (ki - pad_l) * c
        ok = (src >= 0) & (src + c < lane)
        return jnp.where(ok, x, dt.type(0))

    def sublane_shear(x, shifts):
        # out[y, u] = x[y + shifts[u], u]; ``shifts`` spans the FULL padded
        # lane extent (overflow columns carry real content past 45 deg)
        k = jnp.floor(shifts)
        a = (shifts - k).astype(dt)
        ki = k.astype(jnp.int32) + pad_s
        for j in range((2 * pad_s).bit_length()):
            bit = ((ki >> j) & 1) == 1
            x = jnp.where(bit, roll(x, -(1 << j), 0), x)
        x = x * (dt.type(1) - a) + roll(x, -1, 0) * a
        x = roll(x, pad_s, 0)
        # window-mask is exact here: the vertical shear yields the FINAL row
        # positions (the 3rd shear is horizontal), and rotated content's
        # vertical half-extent is (cs/f)*f = cs — inside the S window; its
        # sources never wrap (|shift| <= p2 < pad_s), junk rows lie outside
        return jnp.where(in_rows, x, dt.type(0))

    x = lane_shear(x, s1)
    x = sublane_shear(x, s2)
    x = lane_shear(x, s3)
    return x[pad_s:pad_s + s, plc:plc + s * c]


def _roll_tpu(x, k, ax):
    # pltpu.roll rejects negative shifts; a left-roll by k is a roll by
    # size - k (circular). Mosaic's rotate only handles 32-bit data, so
    # narrow dtypes roll as a concat of two static slices instead.
    n = x.shape[ax]
    k = k % n
    if x.dtype.itemsize != 4:
        if k == 0:
            return x
        # right-roll by k == concat(tail of n-k.., head of ..n-k)
        cut = n - k
        lo = (slice(None), slice(cut, None)) if ax else (slice(cut, None),)
        hi = (slice(None), slice(None, cut)) if ax else (slice(None, cut),)
        return jnp.concatenate([x[(*lo,)], x[(*hi,)]], axis=ax)
    return pltpu.roll(x, k, axis=ax)


def _kernel(img_ref, s1_ref, s2_ref, s3_ref, out_ref, **dims):
    out_ref[0] = _rotate_core(
        img_ref[0], s1_ref[0], s2_ref[0], s3_ref[0], roll=_roll_tpu, **dims)


def _geometry(s: int, c: int):
    p1, p2, p3 = shear_bounds(s)
    pad_l = max(p1, p3) + 1
    pad_s = p2 + 1
    sub = _round_up(s + 2 * pad_s + 1, 8)
    lane = _round_up((s + 2 * pad_l + 1) * c, 128)
    return dict(s=s, c=c, sub=sub, lane=lane, pad_s=pad_s, pad_l=pad_l)


def _shift_vectors(theta: jnp.ndarray, s: int, c: int,
                   pad_l: int, lane: int):
    p1, p2, p3 = shear_bounds(s)
    cy = (s - 1) / 2.0
    d = (jnp.arange(s, dtype=jnp.float32) - cy)[None, :]
    m = -jnp.tan(theta / 2.0)[:, None]
    n = jnp.sin(theta)[:, None]
    s1 = jnp.clip(m * d, -p1, p1)[:, :, None]          # [B,S,1] per-row
    # s2 spans the FULL padded lane extent: past 45 deg the first shear's
    # overflow columns carry real content and must shear by their true
    # pixel coordinate too (zero-shift padding there clips the corners)
    px = (jnp.arange(lane, dtype=jnp.int32) - pad_l * c) // c
    dl = (px.astype(jnp.float32) - cy)[None, :]
    s2 = jnp.clip(n * dl, -p2, p2)[:, None, :]         # [B,1,LANE] per-lane
    s3 = jnp.clip(m * d, -p3, p3)[:, :, None]
    return s1, s2, s3


def rotate_shear_xla(imgs: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """XLA twin of the kernel (same _rotate_core; jnp.roll materializes
    each pass through HBM, so this is the off-TPU/debug path)."""
    b, s, s2_, c = imgs.shape
    dims = _geometry(s, c)
    s1, s2, s3 = _shift_vectors(theta, s, c, dims["pad_l"], dims["lane"])
    flat = imgs.reshape(b, s, s * c)
    out = jax.vmap(lambda im, a1, a2, a3: _rotate_core(
        im, a1, a2, a3, roll=lambda x, k, ax: jnp.roll(x, k, axis=ax),
        **dims))(flat, s1, s2, s3)
    return out.reshape(b, s, s, c)


@partial(jax.jit, static_argnames=("interpret",))
def rotate_shear_pallas(imgs: jnp.ndarray, theta: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Rotate sampling coords of [B,S,S,C] canvases by ``theta[b]`` about
    the center (content must be pre-shrunk by 1/f, as augment_batch does).
    """
    b, s, s2_, c = imgs.shape
    assert s == s2_
    dims = _geometry(s, c)
    s1, s2v, s3 = _shift_vectors(theta, s, c, dims["pad_l"], dims["lane"])
    kern = partial(_kernel, **dims)
    flat = imgs.reshape(b, s, s * c)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, s, s * c), imgs.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, s * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, s, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, dims["lane"]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, s, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, s, s * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(flat, s1, s2v, s3)
    return out.reshape(b, s, s, c)
