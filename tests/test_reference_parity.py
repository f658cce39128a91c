"""Numerical parity vs the actual C++ reference.

Fixtures in ``tests/fixtures/reference_parity.npz`` were produced by running
the UNMODIFIED reference framework (tools/reference_oracle/fixture_gen.cpp,
compiled from /root/reference sources) with its committed headline checkpoint
``iter_395000_train_0.918_valid_0.913.model``: per-image resized uint8 BGR
inputs, logits, softmax probs, and conv_layer_3 grad-CAM heatmaps.

North-star target (BASELINE.json): logit deviation <= 1e-4.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu.models import AlexNet
from cnn_tpu.parallel import make_forward
from cnn_tpu.utils.checkpoint import import_reference_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_parity.npz")
CKPT = ("/root/reference/cpu/checkpoints/AlexNet_aug_1e-3/"
        "iter_395000_train_0.918_valid_0.913.model")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIXTURE) and os.path.exists(CKPT)),
    reason="parity fixtures or reference checkpoint unavailable")


@pytest.fixture(scope="module")
def fixture():
    return np.load(FIXTURE, allow_pickle=False)


@pytest.fixture(scope="module")
def loaded_model():
    model = AlexNet(num_classes=3)
    params, state = import_reference_model(CKPT, model.net)
    return model, params, state


def _images(fx):
    n = len(fx["names"])
    return [str(i) for i in range(n)]


def test_logit_parity(fixture, loaded_model):
    """<= 1e-4 absolute logit deviation vs the C++ reference."""
    model, params, state = loaded_model
    worst = 0.0
    for stem in _images(fixture):
        img = fixture[f"image_u8_{stem}"]
        x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
        logits, _, _ = model.apply(params, state, x)
        ref = fixture[f"logits_{stem}"]
        dev = np.abs(np.asarray(logits)[0] - ref).max()
        worst = max(worst, float(dev))
        assert dev <= 1e-4, (stem, np.asarray(logits)[0], ref)
    print(f"worst logit deviation: {worst:.2e}")


def test_prob_and_argmax_parity(fixture, loaded_model):
    model, params, state = loaded_model
    fwd = make_forward(model)
    for stem in _images(fixture):
        img = fixture[f"image_u8_{stem}"]
        probs = np.asarray(fwd(params, state, jnp.asarray(img[None])))[0]
        ref_probs = fixture[f"probs_{stem}"]
        assert probs.argmax() == int(fixture[f"label_{stem}"])
        np.testing.assert_allclose(probs, ref_probs, atol=1e-4)


def test_uint8_path_matches_f32_path(fixture, loaded_model):
    """Device-side uint8/255 normalize == host-side f32 preprocessing."""
    model, params, state = loaded_model
    stem = "0"
    img = fixture[f"image_u8_{stem}"]
    from cnn_tpu.ops.preprocess import uint8_to_float
    a = uint8_to_float(jnp.asarray(img[None]))
    b = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
