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


def test_flagship_checkpoints_classify_oracle_images():
    from cnn_tpu.models import AlexNet
    from cnn_tpu.utils.checkpoint import load_checkpoint

    fx = np.load(PARITY_FIX)
    model = AlexNet(num_classes=3, batch_norm=True)
    cks = sorted(glob.glob(os.path.join(ART_DIR, "*.ckpt")))
    assert cks, "no committed checkpoints"
    for ck in cks:
        ts = load_checkpoint(ck)
        correct = 0
        for stem in range(6):
            x = jnp.asarray(fx[f"image_u8_{stem}"][None]).astype(jnp.float32) / 255.0
            logits, _, _ = model.apply(ts.params, ts.state, x, train=False)
            correct += int(np.asarray(logits).argmax() == int(fx[f"label_{stem}"]))
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


def test_pipecnn_checkpoint_classifies_oracle_images():
    """The committed pipecnn run (valid 0.900 / test 0.907, BASELINE.md)
    loads into the current model code and classifies the oracle images."""
    from cnn_tpu.models import get_model
    from cnn_tpu.utils.checkpoint import load_checkpoint

    pdir = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "pipecnn")
    cks = sorted(glob.glob(os.path.join(pdir, "*.ckpt")))
    if not cks:
        pytest.skip("no pipecnn checkpoint committed")
    fx = np.load(PARITY_FIX)
    model = get_model("pipecnn", num_classes=3, batch_norm=True)
    ts = load_checkpoint(cks[-1])
    correct = 0
    for stem in range(6):
        x = jnp.asarray(fx[f"image_u8_{stem}"][None]).astype(jnp.float32) / 255.0
        logits, _, _ = model.apply(ts.params, ts.state, x, train=False)
        correct += int(np.asarray(logits).argmax() == int(fx[f"label_{stem}"]))
    assert correct >= 5, correct


def test_moecnn_checkpoint_loads_and_runs():
    """The committed MoE run (BASELINE.md) loads and classifies."""
    from cnn_tpu.models import get_model
    from cnn_tpu.utils.checkpoint import load_checkpoint

    mdir = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "moecnn")
    cks = sorted(glob.glob(os.path.join(mdir, "*.ckpt")))
    if not cks:
        pytest.skip("no moecnn checkpoint committed")
    fx = np.load(PARITY_FIX)
    model = get_model("moecnn", num_classes=3, batch_norm=True)
    ts = load_checkpoint(cks[-1])
    correct = 0
    for stem in range(6):
        x = jnp.asarray(fx[f"image_u8_{stem}"][None]).astype(jnp.float32) / 255.0
        logits, _, _ = model.apply(ts.params, ts.state, x, train=False)
        correct += int(np.asarray(logits).argmax() == int(fx[f"label_{stem}"]))
    assert correct >= 4, correct   # 0.85-accuracy model: most oracle images
