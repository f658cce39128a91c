"""Committed training artifacts must stay loadable and functional."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

ART_DIR = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                       "alexnet_bn_device")
PARITY_FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                          "reference_parity.npz")

pytestmark = pytest.mark.skipif(not os.path.isdir(ART_DIR),
                                reason="artifacts not present")


def _oracle_correct(model, ts) -> int:
    """How many of the 6 oracle images a checkpointed model classifies."""
    fx = np.load(PARITY_FIX)
    correct = 0
    for stem in range(6):
        x = jnp.asarray(fx[f"image_u8_{stem}"][None]).astype(jnp.float32) / 255.0
        logits, _, _ = model.apply(ts.params, ts.state, x, train=False)
        correct += int(np.asarray(logits).argmax() == int(fx[f"label_{stem}"]))
    return correct


def _family_checkpoint(dirname: str):
    d = os.path.join(os.path.dirname(__file__), "..", "checkpoints", dirname)
    cks = sorted(glob.glob(os.path.join(d, "*.ckpt")))
    if not cks:
        pytest.skip(f"no {dirname} checkpoint committed")
    return cks[-1]


def test_flagship_checkpoints_classify_oracle_images():
    from cnn_tpu.models import AlexNet
    from cnn_tpu.utils.checkpoint import load_checkpoint

    model = AlexNet(num_classes=3, batch_norm=True)
    cks = sorted(glob.glob(os.path.join(ART_DIR, "*.ckpt")))
    assert cks, "no committed checkpoints"
    for ck in cks:
        correct = _oracle_correct(model, load_checkpoint(ck))
        assert correct >= 5, (ck, correct)  # flagship models: all/most right


def test_exported_model_files_have_bn_layout():
    from cnn_tpu.models import AlexNet
    from cnn_tpu.utils.checkpoint import (import_reference_model,
                                          reference_param_count)

    model = AlexNet(num_classes=3, batch_norm=True)
    for path in glob.glob(os.path.join(ART_DIR, "*.model")):
        raw = np.fromfile(path, dtype="<f4")
        assert raw.size == reference_param_count(model.net)
        params, state = import_reference_model(path, model.net)
        assert "bn_layer_1" in state


@pytest.mark.parametrize("family,min_correct", [
    ("pipecnn", 5),   # valid 0.900 / test 0.907 (BASELINE.md)
    ("moecnn", 5),    # valid 0.960 / test 0.940
])
def test_family_checkpoints_classify_oracle_images(family, min_correct):
    """Every committed family run loads into current model code and
    classifies the oracle images."""
    from cnn_tpu.models import get_model
    from cnn_tpu.utils.checkpoint import load_checkpoint

    ck = _family_checkpoint(family)
    model = get_model(family, num_classes=3, batch_norm=True)
    correct = _oracle_correct(model, load_checkpoint(ck))
    assert correct >= min_correct, (family, correct)
