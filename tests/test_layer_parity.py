"""Per-layer numerical parity vs the reference (layer_dump.cpp oracle).

Fixtures: every intermediate activation of the reference's layer stack for
dog.jpg with the headline checkpoint, stored CHW (the reference layout);
we transpose to NHWC for comparison. Catches layout or op bugs at the layer
where they happen instead of only at the logits.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu.models import AlexNet
from cnn_tpu.utils.checkpoint import import_reference_model

LAYERS_FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                          "reference_layers_dog.npz")
PARITY_FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                          "reference_parity.npz")
CKPT = ("/root/reference/cpu/checkpoints/AlexNet_aug_1e-3/"
        "iter_395000_train_0.918_valid_0.913.model")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(LAYERS_FIX) and os.path.exists(CKPT)),
    reason="per-layer fixtures unavailable")

# absolute tolerance per layer: activations grow with depth; all comfortably
# below the 1e-4 end-to-end bar
TOL = 5e-5


def test_every_layer_matches_reference():
    fx = np.load(LAYERS_FIX)
    parity = np.load(PARITY_FIX)
    model = AlexNet(num_classes=3)
    params, state = import_reference_model(CKPT, model.net)

    # same preprocessed input the reference used (image 0 == dog.jpg)
    x = jnp.asarray(parity["image_u8_0"][None]).astype(jnp.float32) / 255.0

    capture = tuple(fx.files)
    logits, _, captured = model.apply(params, state, x, capture=capture)

    worst = {}
    for name in fx.files:
        ref_chw = fx[name]
        if name == "linear_1":
            ours = np.asarray(logits)[0]
            ref = ref_chw.reshape(-1)
        else:
            ours = np.asarray(captured[name])[0]         # HWC
            ref = ref_chw.transpose(1, 2, 0)              # CHW -> HWC
        dev = float(np.abs(ours - ref).max())
        worst[name] = dev
        assert dev <= TOL, (name, dev)
    print("per-layer max deviations:",
          {k: f"{v:.1e}" for k, v in worst.items()})
