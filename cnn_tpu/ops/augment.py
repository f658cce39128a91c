"""Device-side batched image augmentation.

The reference augments on the host, one image at a time, with OpenCV
(``ImageAugmentor::make_augment``, pipeline.cpp:40-77) — at ~4-6 ms/image on
one CPU core that caps training at a few hundred img/s. This module runs the
same four ops (hflip p=.5, vflip p=.2, random crop p=.7 keep-ratio
U[0.7,0.95], rotate p=.5 angle ±U[15,75]) as ONE fused affine resample per
image on the TPU: all transforms compose into a single 3x3 coordinate
matrix, applied with a bilinear gather (``map_coordinates``), batched with
``vmap`` and fused into the train step under jit.

Faithfulness notes vs the host path (which remains the bit-matched one,
``data/augment.py``):
- ops compose in a fixed order (flips -> crop -> rotate) rather than the
  reference's shuffled order; with stochastic augmentation this changes no
  marginal distribution users care about, only op-interaction details.
- the reference's expand-canvas rotation followed by the final square
  resize is emulated by rotating about the center and shrinking by the
  expansion factor (cos|th| + sin|th| for a square), black-filling corners —
  the same "whole image stays visible, squashed" visual semantics.
- crop coordinates are drawn in canvas space (the reference draws them in
  the current intermediate image's space).

Input: uint8 (or float) [B, S, S, C] canvases; output float [B, out, out, C]
in [0, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _affine_for_sample(key, canvas: int, out_size: int,
                       hflip_p: float, vflip_p: float,
                       crop_p: float, rotate_p: float):
    """3x3 matrix mapping output pixel coords -> canvas coords."""
    k_h, k_v, k_c, k_cy, k_cx, k_r, k_ra, k_rs = jax.random.split(key, 8)
    s = canvas
    eye = jnp.eye(3, dtype=jnp.float32)

    def mat(rows):
        return jnp.asarray(rows, jnp.float32)

    # base: output grid -> canvas (the final cv::resize in pipeline.cpp:159)
    base = mat([[s / out_size, 0, 0], [0, s / out_size, 0], [0, 0, 1]])

    # hflip: x -> S-1-x
    hflip = jnp.where(jax.random.uniform(k_h) < hflip_p,
                      mat([[1, 0, 0], [0, -1, s - 1], [0, 0, 1]]), eye)
    vflip = jnp.where(jax.random.uniform(k_v) < vflip_p,
                      mat([[-1, 0, s - 1], [0, 1, 0], [0, 0, 1]]), eye)

    # crop: keep-ratio r = 0.7 + U(0, 0.25), uniform position
    r = 0.7 + jax.random.uniform(k_c, minval=0.0, maxval=0.25)
    ch = r * s
    oy = jax.random.uniform(k_cy) * (s - ch)
    ox = jax.random.uniform(k_cx) * (s - ch)
    crop_m = mat([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    crop_m = jnp.stack([
        jnp.stack([r, jnp.float32(0), oy]),
        jnp.stack([jnp.float32(0), r, ox]),
        jnp.stack([jnp.float32(0), jnp.float32(0), jnp.float32(1)]),
    ])
    crop = jnp.where(jax.random.uniform(k_r) < crop_p, crop_m, eye)

    # rotate: angle U(15, 75) deg, random sign; expand-emulation scale
    ang = jax.random.uniform(k_ra, minval=15.0, maxval=75.0)
    ang = jnp.where(jax.random.uniform(k_rs) < 0.5, -ang, ang) * jnp.pi / 180.0
    f = jnp.abs(jnp.cos(ang)) + jnp.abs(jnp.sin(ang))   # square expansion
    c = (s - 1) / 2.0
    cos, sin = jnp.cos(ang) * f, jnp.sin(ang) * f       # inverse map incl. 1/f shrink
    rot_m = jnp.stack([
        jnp.stack([cos, -sin, c - cos * c + sin * c]),
        jnp.stack([sin, cos, c - sin * c - cos * c]),
        jnp.stack([jnp.float32(0), jnp.float32(0), jnp.float32(1)]),
    ])
    do_rot = jax.random.uniform(jax.random.fold_in(k_r, 1)) < rotate_p
    rot = jnp.where(do_rot, rot_m, eye)

    # output coord -> base -> flips -> crop -> rotate (canvas space)
    return rot @ crop @ vflip @ hflip @ base


def _sample_one(img, matrix, out_size: int):
    """Bilinear-resample one [S,S,C] image through a 3x3 coord matrix."""
    yy = jnp.arange(out_size, dtype=jnp.float32)
    xx = jnp.arange(out_size, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    ones = jnp.ones_like(gy)
    coords = jnp.stack([gy, gx, ones])                       # [3, H, W]
    src = jnp.einsum("ij,jhw->ihw", matrix, coords)          # [3, H, W]
    sy, sx = src[0], src[1]

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [sy, sx], order=1, mode="constant", cval=0.0)

    return jax.vmap(sample_channel, in_axes=-1, out_axes=-1)(img)


# --------------------------------------------------------------------------
# MXU resampling: augmentation as banded batched matmuls.
#
# A separable bilinear resample is two matrix products: out = Wy @ img @ WxT
# with 2-tap banded weight matrices. Building Wy/Wx per image from the drawn
# crop/flip parameters and contracting with `dot_general` keeps the whole
# fast path on the MXU — no gathers, no per-image `scale_and_translate`
# (measured 1.6x faster at bs=256: 1.57 vs 2.55 ms/batch), and the /255
# normalization folds into Wy for free. Plain (non-antialiased) bilinear
# matches the reference's `cv::resize` INTER_LINEAR more closely than
# `jax.image.scale_and_translate`, which widens its kernel when minifying.
# --------------------------------------------------------------------------


def _resample_matrix(s: int, out_size: int, span, off, flip,
                     gain=jnp.float32(1.0), clamp: bool = False):
    """[out,S] 2-tap bilinear row weights: ``src = off + (j+.5)*span/out
    - .5``, optionally mirrored. ``gain`` scales the whole matrix (used to
    fold the uint8 /255 into the resample).

    ``clamp=True`` pins sample positions inside the crop window
    ``[off, off+span-1]`` — the reference hard-crops to a new Mat and
    resizes THAT (pipeline.cpp:159), so its border taps clamp at the crop
    edge instead of bleeding into neighboring canvas pixels. Without clamp,
    out-of-canvas taps zero-fill with border renormalization (the behavior
    the rotation placement stage wants: black beyond the canvas)."""
    grid = jnp.arange(out_size, dtype=jnp.float32)
    taps = jnp.arange(s, dtype=jnp.float32)
    src = off + (grid + 0.5) * (span / out_size) - 0.5
    if clamp:
        src = jnp.clip(src, off, off + span - 1.0)
    src = jnp.where(flip, (s - 1.0) - src, src)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(taps[None, :] - src[:, None]))
    if clamp:
        # in-range rows already sum to 1; renormalization only washes out
        # float dust at the pinned crop edges
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-6)
    # clamp=False: partial border taps stay partial, so out-of-canvas mass
    # zero-fills (true black beyond the canvas — what the rotation
    # placement stage needs; renormalizing here would edge-replicate)
    return gain * w


def _matmul_resample(x: jnp.ndarray, Wy: jnp.ndarray, Wx: jnp.ndarray,
                     dtype) -> jnp.ndarray:
    """Apply per-image row/col weight matrices: [B,S,S,C] -> [B,Oy,Ox,C]."""
    from jax import lax
    b, s, _, c = x.shape
    prec = lax.Precision.HIGHEST if dtype == jnp.float32 else None
    x = x.astype(dtype)
    Wy = Wy.astype(dtype)
    Wx = Wx.astype(dtype)
    v = lax.dot_general(Wy, x.reshape(b, s, s * c),
                        (((2,), (1,)), ((0,), (0,))), precision=prec)
    v = v.reshape(b, Wy.shape[1], s, c)
    h = lax.dot_general(Wx, v, (((2,), (2,)), ((0,), (0,))), precision=prec)
    return h.transpose(0, 2, 1, 3)          # [B, Oy, Ox, C]


@partial(jax.jit, static_argnames=("out_size", "hflip_p", "vflip_p",
                                   "crop_p", "dtype"))
def augment_batch_fast(rng: jax.Array, images: jnp.ndarray,
                       out_size: int = 224, hflip_p: float = 0.5,
                       vflip_p: float = 0.2, crop_p: float = 0.7,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Gather-free augmentation: flips + random-resized-crop only.

    Flips, crop, resize, and the uint8 normalization all fold into the two
    banded matmuls of ``_matmul_resample`` — one fused MXU pass per axis.
    Drops the reference's rotate op (p=.5, pipeline.h:34); flips/crop match.
    """
    b, s, s2, _ = images.shape
    assert s == s2

    def draw(key):
        k_h, k_v, k_c, k_cy, k_cx, k_do = jax.random.split(key, 6)
        r = jnp.where(jax.random.uniform(k_do) < crop_p,
                      0.7 + jax.random.uniform(k_c) * 0.25, 1.0)
        return (r * s,
                jax.random.uniform(k_cy) * (1.0 - r) * s,
                jax.random.uniform(k_cx) * (1.0 - r) * s,
                jax.random.uniform(k_h) < hflip_p,
                jax.random.uniform(k_v) < vflip_p)

    span, oy, ox, hf, vf = jax.vmap(draw)(jax.random.split(rng, b))
    gain = jnp.float32(1.0 / 255.0 if images.dtype == jnp.uint8 else 1.0)
    Wy = jax.vmap(lambda sp, o, f: _resample_matrix(
        s, out_size, sp, o, f, gain, clamp=True))(span, oy, vf)
    Wx = jax.vmap(lambda sp, o, f: _resample_matrix(
        s, out_size, sp, o, f, clamp=True))(span, ox, hf)
    return _matmul_resample(images, Wy, Wx, dtype)


@partial(jax.jit, static_argnames=("out_size", "hflip_p", "vflip_p",
                                   "crop_p", "rotate_p"))
def augment_batch_gather(rng: jax.Array, images: jnp.ndarray,
                         out_size: int = 224, hflip_p: float = 0.5,
                         vflip_p: float = 0.2, crop_p: float = 0.7,
                         rotate_p: float = 0.5) -> jnp.ndarray:
    """[B,S,S,C] uint8/float canvases -> [B,out,out,C] f32 in [0,1].

    Single fused affine resample through ``map_coordinates``. Numerically
    the cleanest formulation, but the per-pixel gathers serialize on the
    TPU (~144 ms per 64-batch measured) — training uses ``augment_batch``
    (shear decomposition) instead; this stays as its correctness oracle.
    """
    b, s, s2, _ = images.shape
    assert s == s2, "square canvases expected"
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    keys = jax.random.split(rng, b)
    mats = jax.vmap(lambda k: _affine_for_sample(
        k, s, out_size, hflip_p, vflip_p, crop_p, rotate_p))(keys)
    return jax.vmap(lambda im, m: _sample_one(im, m, out_size))(x, mats)


# --------------------------------------------------------------------------
# Gather-free full policy: rotation via the Paeth three-shear decomposition.
#
# A pure rotation of SAMPLING coordinates (y,x about the canvas center)
# factors into three shears:
#     R(th) = Sx(m) @ Sy(n) @ Sx(m),   m = -tan(th/2), n = sin(th)
# where Sx(m): (y,x) -> (y, x + m*y) and Sy(n): (y,x) -> (y + n*x, x).
# Each shear resamples only ALONG one axis with a per-row (per-column)
# fractional shift — implemented as one dynamic row slice plus a 2-tap
# blend, i.e. contiguous vector loads instead of map_coordinates' per-pixel
# scalar gathers. The expansion shrink (factor f = |cos|+|sin|, emulating
# the reference's expand-canvas rotate + final resize, pipeline.cpp:23-33)
# and the crop/resize run as `scale_and_translate` (separable weighted
# sums), so the whole policy is gather-free.
#
# Working canvas: content is pre-shrunk by 1/f, so its half-extent is
# h = S/(2f); the worst intermediate half-extent is h*(1+|m|) <= 0.72*S
# (at 75 deg), hence the padded working canvas P ~ 1.5*S.
# --------------------------------------------------------------------------


def _rotate_batch(imgs: jnp.ndarray, theta: jnp.ndarray,
                  impl: str = "auto") -> jnp.ndarray:
    """Pure rotation of sampling coords by ``theta[b]`` about the center
    (content pre-shrunk by 1/f). Dispatches to the fused Pallas kernel on
    TPU (one HBM read+write per image) and the identical-math XLA bit-roll
    path elsewhere. See ``cnn_tpu/ops/pallas/augment.py``."""
    from cnn_tpu.ops.pallas.augment import rotate_shear_pallas, rotate_shear_xla
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return rotate_shear_pallas(imgs, theta)
    return rotate_shear_xla(imgs, theta)


def _rotate_shear(img: jnp.ndarray, theta) -> jnp.ndarray:
    """Single-image wrapper (correctness oracle tests)."""
    return _rotate_batch(img[None], jnp.asarray(theta)[None], impl="xla")[0]


@partial(jax.jit, static_argnames=("out_size", "hflip_p", "vflip_p",
                                   "crop_p", "rotate_p", "dtype"))
def augment_batch(rng: jax.Array, images: jnp.ndarray, out_size: int = 224,
                  hflip_p: float = 0.5, vflip_p: float = 0.2,
                  crop_p: float = 0.7, rotate_p: float = 0.5,
                  dtype=jnp.float32) -> jnp.ndarray:
    """[B,S,S,C] uint8/float canvases -> [B,out,out,C] f32 in [0,1].

    The FULL reference policy (hflip/vflip/crop/rotate, pipeline.h:34) with
    a gather-free rotation (three shears, see above) so it runs at
    fast-path speed instead of 18x the train step. Flips are applied first
    (the rotation angle and crop offsets are symmetrically distributed, so
    op order changes no marginal distribution); rotation uses three
    bilinear passes, which is very slightly softer than the one-pass
    ``augment_batch_gather`` oracle.
    """
    b, s, s2, _ = images.shape
    assert s == s2, "square canvases expected"
    x = images.astype(dtype)
    if images.dtype == jnp.uint8:
        x = x / dtype(255.0)

    cs = (s - 1) / 2.0
    keys = jax.random.split(rng, b)

    def draw(key):
        k_h, k_v, k_c, k_cy, k_cx, k_r, k_ra, k_rs, k_rp = jax.random.split(key, 9)
        ang = jax.random.uniform(k_ra, minval=15.0, maxval=75.0)
        ang = jnp.where(jax.random.uniform(k_rs) < 0.5, -ang, ang) * jnp.pi / 180.0
        ang = jnp.where(jax.random.uniform(k_rp) < rotate_p, ang, 0.0)
        r = jnp.where(jax.random.uniform(k_r) < crop_p,
                      0.7 + jax.random.uniform(k_c) * 0.25, 1.0)
        return (jax.random.uniform(k_h) < hflip_p,
                jax.random.uniform(k_v) < vflip_p,
                ang, r,
                jax.random.uniform(k_cy), jax.random.uniform(k_cx))

    do_h, do_v, ang, r, uy, ux = jax.vmap(draw)(keys)
    f = jnp.abs(jnp.cos(ang)) + jnp.abs(jnp.sin(ang))   # expansion factor

    # place: flips + pre-shrink by 1/f about the center, same canvas:
    # J0(q) = I(f*(q - cs) + cs) — the rotated content's half-extent is
    # then (|cos|+|sin|)*s/(2f) = s/2, exactly fitting the canvas; shear
    # intermediates overflow only into the rotation kernel's padding.
    # src = f*q + cs*(1-f) matches _resample_matrix with span = f*s and
    # off = s*(1-f)/2; the flips fold into the same matmuls
    # (banded-matmul resampling — see the fast path above).
    Wy0 = jax.vmap(lambda ff, fl: _resample_matrix(
        s, s, ff * s, s * (1.0 - ff) / 2.0, fl))(f, do_v)
    Wx0 = jax.vmap(lambda ff, fl: _resample_matrix(
        s, s, ff * s, s * (1.0 - ff) / 2.0, fl))(f, do_h)
    j = _matmul_resample(x, Wy0, Wx0, x.dtype)
    j = _rotate_batch(j, ang)

    # final: crop (keep-ratio r, uniform offsets) + resize to out_size:
    # out(q) = J(r*(s/out)*q + o)
    span = r * s
    Wy1 = jax.vmap(lambda sp, u: _resample_matrix(
        s, out_size, sp, u * (s - sp), jnp.bool_(False),
        clamp=True))(span, uy)
    Wx1 = jax.vmap(lambda sp, u: _resample_matrix(
        s, out_size, sp, u * (s - sp), jnp.bool_(False),
        clamp=True))(span, ux)
    return _matmul_resample(j, Wy1, Wx1, dtype)


def batch_mix(rng: jax.Array, images: jnp.ndarray,
              mixup_alpha: float = 0.0, cutmix_alpha: float = 0.0):
    """MixUp / CutMix: batch-level label-mixing augmentation (superset —
    the reference's augmentor is single-image only, pipeline.h:24-38).

    Returns ``(mixed_images, perm, lam)``: each sample blends with its
    partner ``perm[i]`` — MixUp as ``lam*x + (1-lam)*x[perm]`` (Zhang et
    al. 2018), CutMix by pasting a random rectangle of area ``1-lam``
    from the partner (Yun et al. 2019; ``lam`` is re-derived from the
    clipped box so the label weights match the pixel fractions exactly).
    One scalar ``lam`` per batch (the papers' formulation). The caller
    mixes the loss: ``lam*CE(y) + (1-lam)*CE(y[perm])`` — no soft-label
    materialization. With both alphas > 0, each step picks one of the
    two uniformly. Call on FLOAT images (post-normalize); uint8 blending
    would truncate.
    """
    b, h, w = images.shape[:3]
    k_perm, k_lam, k_box, k_pick = jax.random.split(rng, 4)
    perm = jax.random.permutation(k_perm, b)
    partner = images[perm]

    def _mixup():
        lam = jax.random.beta(k_lam, mixup_alpha, mixup_alpha)
        lam = lam.astype(jnp.float32)
        mixed = (images * lam.astype(images.dtype)
                 + partner * (1.0 - lam).astype(images.dtype))
        return mixed, lam

    def _cutmix():
        lam0 = jax.random.beta(k_lam, cutmix_alpha, cutmix_alpha)
        cut = jnp.sqrt(1.0 - lam0)  # box side fraction -> area 1-lam0
        ch = (cut * h).astype(jnp.int32)
        cw = (cut * w).astype(jnp.int32)
        k_cy, k_cx = jax.random.split(k_box)
        cy = jax.random.randint(k_cy, (), 0, h)
        cx = jax.random.randint(k_cx, (), 0, w)
        y0, y1 = jnp.clip(cy - ch // 2, 0, h), jnp.clip(cy + (ch + 1) // 2, 0, h)
        x0, x1 = jnp.clip(cx - cw // 2, 0, w), jnp.clip(cx + (cw + 1) // 2, 0, w)
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        inside = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
        mixed = jnp.where(inside[None, :, :, None], partner, images)
        # clipped box area, exactly — the effective label weight
        lam = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / float(h * w)
        return mixed, lam

    if mixup_alpha > 0.0 and cutmix_alpha > 0.0:
        xm, lm = _mixup()
        xc, lc = _cutmix()
        use_cut = jax.random.bernoulli(k_pick)
        return (jnp.where(use_cut, xc, xm), perm,
                jnp.where(use_cut, lc, lm))
    if cutmix_alpha > 0.0:
        mixed, lam = _cutmix()
        return mixed, perm, lam
    assert mixup_alpha > 0.0, "batch_mix needs mixup_alpha or cutmix_alpha"
    mixed, lam = _mixup()
    return mixed, perm, lam


def color_jitter(rng: jax.Array, images: jnp.ndarray,
                 strength: float = 0.2) -> jnp.ndarray:
    """Per-sample brightness / contrast / saturation jitter on NORMALIZED
    float images (post-resample, values ~[0,1]). Superset — the
    reference's augmentor is geometric only (pipeline.h:24-38).

    brightness: add U(-s, s); contrast: scale around the per-image mean by
    U(1-s, 1+s); saturation: lerp toward the per-pixel channel mean (the
    grayscale image in whatever channel order) by U(1-s, 1+s). All three
    are elementwise FMAs that XLA fuses into the augmentation epilogue —
    zero extra memory passes. Output clipped to [0, 1].
    """
    b = images.shape[0]
    k_b, k_c, k_s = jax.random.split(rng, 3)
    shape = (b, 1, 1, 1)
    dt = images.dtype
    bright = jax.random.uniform(k_b, shape, dt, -strength, strength)
    contrast = jax.random.uniform(k_c, shape, dt, 1.0 - strength,
                                  1.0 + strength)
    sat = jax.random.uniform(k_s, shape, dt, 1.0 - strength, 1.0 + strength)
    gray = jnp.mean(images, axis=-1, keepdims=True)
    x = gray + sat * (images - gray)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = mean + contrast * (x - mean) + bright
    return jnp.clip(x, 0.0, 1.0)
