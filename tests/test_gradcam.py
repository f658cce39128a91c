"""Grad-CAM tests: reference-mode heatmap parity + canonical-mode sanity."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu.models import AlexNet
from cnn_tpu.tools.gradcam import compute_cam, render_heatmap
from cnn_tpu.utils.checkpoint import import_reference_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_parity.npz")
CKPT = ("/root/reference/cpu/checkpoints/AlexNet_aug_1e-3/"
        "iter_395000_train_0.918_valid_0.913.model")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIXTURE) and os.path.exists(CKPT)),
    reason="parity fixtures unavailable")


@pytest.fixture(scope="module")
def setup():
    model = AlexNet(num_classes=3)
    params, state = import_reference_model(CKPT, model.net)
    fx = np.load(FIXTURE)
    return model, params, state, fx


def test_reference_mode_cam_parity(setup):
    """mode='reference' must reproduce the C++ heatmaps (alexnet.cpp:95-142).

    The fixture stores the uint8 cam (0..255, post min-max + saturate_cast)
    as f32; we compare after the same quantization.
    """
    model, params, state, fx = setup
    for stem in range(6):
        x = jnp.asarray(fx[f"image_u8_{stem}"][None]).astype(jnp.float32) / 255.0
        cam, probs = compute_cam(model, params, state, x, "conv_layer_3",
                                 mode="reference")
        ref = fx[f"gradcam_{stem}"]
        assert cam.shape == ref.shape
        ours_u8 = np.clip(np.rint(255.0 * cam), 0, 255)
        # allow 1 quantization step of slack (saturate_cast rounding)
        dev = np.abs(ours_u8 - ref).max()
        assert dev <= 1.0, (stem, dev)


def test_gradcam_mode_is_valid_heatmap(setup):
    model, params, state, fx = setup
    x = jnp.asarray(fx["image_u8_0"][None]).astype(jnp.float32) / 255.0
    cam, probs = compute_cam(model, params, state, x, "conv_layer_3",
                             mode="gradcam")
    assert cam.shape == (13, 13)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    assert np.isfinite(cam).all()
    assert int(probs.argmax()) == int(fx["label_0"])


def test_render_heatmap_shapes(setup):
    _, _, _, fx = setup
    img = fx["image_u8_0"]
    cam = np.random.default_rng(0).random((13, 13), np.float32)
    out = render_heatmap(img, cam)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_gradcam_tail_replay_equals_full_network_grad(setup):
    """The CAM weights come from replaying the network tail from the captured
    activation; the gradient must equal differentiating the FULL forward wrt
    that activation (chain rule through capture)."""
    import jax
    model, params, state, fx = setup
    x = jnp.asarray(fx["image_u8_1"][None]).astype(jnp.float32) / 255.0
    layer_name = "conv_layer_3"

    logits, _, cap = model.apply(params, state, x, capture=(layer_name,))
    k = int(np.asarray(logits).argmax())
    fmap = cap[layer_name]

    def score_from_act(act):
        out = act
        seen = False
        for layer in model.net.layers:
            if seen:
                out, _ = layer.apply(params.get(layer.name),
                                     state.get(layer.name), out, train=False)
            if layer.name == layer_name:
                seen = True
        return out[0, k]

    g_replay = jax.grad(score_from_act)(fmap)

    # oracle: inject the activation into the full forward via closure and
    # differentiate end to end
    def score_full(act):
        out = x
        for layer in model.net.layers:
            out, _ = layer.apply(params.get(layer.name),
                                 state.get(layer.name), out, train=False)
            if layer.name == layer_name:
                out = act  # substitute the captured activation
        return out[0, k]

    g_full = jax.grad(score_full)(fmap)
    np.testing.assert_allclose(np.asarray(g_replay), np.asarray(g_full),
                               rtol=1e-5, atol=1e-7)
