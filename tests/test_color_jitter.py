"""Device-side color jitter (ops.augment.color_jitter) — a superset of
the reference's geometric-only augmentor
(/root/reference/cpu/include/pipeline.h:24-38).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu.ops.augment import color_jitter


def _imgs(b=4, s=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.1, 0.9, (b, s, s, 3)).astype(np.float32))


def test_output_in_range_and_shape():
    x = _imgs()
    y = color_jitter(jax.random.key(0), x, 0.5)
    assert y.shape == x.shape and y.dtype == x.dtype
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_zero_strength_is_identity():
    x = _imgs()
    y = color_jitter(jax.random.key(0), x, 0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_per_sample_factors_differ():
    """Two samples with identical pixels must jitter differently."""
    one = _imgs(b=1)
    x = jnp.concatenate([one, one], axis=0)
    y = color_jitter(jax.random.key(1), x, 0.4)
    assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))


def test_saturation_only_preserves_gray_pixels():
    """A gray image is a fixed point of the saturation lerp; with contrast
    and brightness the per-image mean still anchors the transform."""
    gray = jnp.full((2, 8, 8, 3), 0.5, jnp.float32)
    y = color_jitter(jax.random.key(2), gray, 0.3)
    # saturation/contrast act around the (uniform) mean -> only the
    # brightness shift survives: every pixel moved by the same delta
    flat = np.asarray(y).reshape(2, -1)
    assert np.allclose(flat.std(axis=1), 0.0, atol=1e-6)
    assert np.all(np.abs(flat.mean(axis=1) - 0.5) <= 0.3 + 1e-6)


def test_statistics_move_with_strength():
    """Stronger jitter spreads the per-image means further."""
    x = _imgs(b=64, s=8)
    lo = color_jitter(jax.random.key(3), x, 0.05)
    hi = color_jitter(jax.random.key(3), x, 0.5)
    d_lo = np.abs(np.asarray(lo - x).mean(axis=(1, 2, 3)))
    d_hi = np.abs(np.asarray(hi - x).mean(axis=(1, 2, 3)))
    assert d_hi.mean() > d_lo.mean() * 2


def test_bf16_path():
    x = _imgs().astype(jnp.bfloat16)
    y = color_jitter(jax.random.key(4), x, 0.2)
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, np.float32)).all()
