"""Grad-CAM inside scanned trunks (VERDICT r3 item 4).

A pipecnn trunk is ONE StackedBlocks layer; round 3's capture addressed
top-level names only, so per-block activations of the deep family were
unreachable. These tests pin the round-4 path syntax
('trunk/block_<i>[/<body_layer>]') against manual unrolling, verify the
replayed tail against a full-forward substitution oracle, and drive the CLI
end to end on a pipecnn checkpoint.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu.models import PipeCNN
from cnn_tpu.tools.gradcam import (_forward_with_capture, compute_cam,
                                   parse_layer_path)


@pytest.fixture(scope="module")
def setup():
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    params, state = model.init(jax.random.key(30))
    x = jnp.asarray(np.random.default_rng(30).random((1, 32, 32, 3)),
                    jnp.float32)
    return model, params, state, x


def _unrolled_prefix(model, params, state, x, n_blocks_applied):
    h = x
    for l in model.net.layers:
        if l.name == "trunk":
            break
        h, _ = l.apply(params.get(l.name), state.get(l.name), h, train=False)
    trunk = model.net["trunk"]
    for j in range(n_blocks_applied):
        bp = jax.tree.map(lambda a: a[j], params["trunk"])
        bs = jax.tree.map(lambda a: a[j], state["trunk"])
        h, _ = trunk.block.apply(bp, bs, h, train=False)
    return h


def test_block_output_capture_matches_manual_unroll(setup):
    model, params, state, x = setup
    logits, fmap, resume = _forward_with_capture(model, params, state, x,
                                                 "trunk/block_2")
    expect = _unrolled_prefix(model, params, state, x, 3)
    np.testing.assert_allclose(np.asarray(fmap), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)
    # the capture forward reproduces the plain forward's logits
    full, _, _ = model.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_body_layer_capture_and_replay_grad_oracle(setup):
    """trunk/block_1/b_conv1: the captured activation matches manual body
    evaluation, and grad-through-resume equals differentiating the FULL
    forward with the activation substituted in place (chain rule)."""
    model, params, state, x = setup
    trunk = model.net["trunk"]
    logits, fmap, resume = _forward_with_capture(model, params, state, x,
                                                 "trunk/block_1/b_conv1")
    # manual: stem + block 0, then block 1's body up to b_conv1
    h = _unrolled_prefix(model, params, state, x, 1)
    bp = jax.tree.map(lambda a: a[1], params["trunk"])["body"]
    conv1 = trunk.block.body["b_conv1"]
    expect, _ = conv1.apply(bp["b_conv1"], None, h, train=False)
    np.testing.assert_allclose(np.asarray(fmap), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)
    full, _, _ = model.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full),
                               rtol=1e-5, atol=1e-6)

    k = int(np.asarray(logits).argmax())
    g_replay = jax.grad(lambda a: resume(a)[0, k])(fmap)

    def score_full(act):
        # oracle: full forward, substituting the captured activation where
        # b_conv1's output appears inside block 1
        h = x
        for l in model.net.layers:
            if l.name != "trunk":
                h, _ = l.apply(params.get(l.name), state.get(l.name), h,
                               train=False)
                continue
            for j in range(trunk.n_blocks):
                bpj = jax.tree.map(lambda a: a[j], params["trunk"])
                bsj = jax.tree.map(lambda a: a[j], state["trunk"])
                if j != 1:
                    h, _ = trunk.block.apply(bpj, bsj, h, train=False)
                    continue
                hh = h
                for bl in trunk.block.body.layers:
                    hh, _ = bl.apply(bpj["body"].get(bl.name),
                                     (bsj.get("body") or {}).get(bl.name),
                                     hh, train=False)
                    if bl.name == "b_conv1":
                        hh = act
                h = trunk.block.combine(hh, h)
        return h[0, k]

    g_full = jax.grad(score_full)(fmap)
    np.testing.assert_allclose(np.asarray(g_replay), np.asarray(g_full),
                               rtol=1e-5, atol=1e-7)


def test_compute_cam_inside_trunk(setup):
    model, params, state, x = setup
    for mode in ("gradcam", "reference"):
        cam, probs = compute_cam(model, params, state, x,
                                 "trunk/block_3/b_conv1", mode=mode)
        assert cam.shape == (8, 8)  # 32px stem downsamples 4x
        assert np.isfinite(cam).all()
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_parse_layer_path_errors(setup):
    model, _, _, _ = setup
    for bad in ("nope", "trunk/block_9", "trunk/block_1/nope",
                "stem_conv1/block_0", "trunk/x_1"):
        with pytest.raises(ValueError):
            parse_layer_path(model, bad)
    assert parse_layer_path(model, "trunk/block_0") == ("trunk", 0, None)
    assert parse_layer_path(model, "gap") == ("gap", None, None)


def test_gradcam_cli_on_pipecnn(tmp_path):
    """The VERDICT 'Done' line: the CLI produces a heatmap for a pipecnn
    per-block conv activation."""
    import cv2

    from cnn_tpu import optim
    from cnn_tpu.parallel import create_train_state
    from cnn_tpu.tools import gradcam
    from cnn_tpu.utils.checkpoint import save_checkpoint

    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    ts = create_train_state(model, optim.sgd(1e-3), jax.random.key(31))
    ck = str(tmp_path / "pipe.ckpt")
    save_checkpoint(ck, ts)
    img_path = str(tmp_path / "in.png")
    cv2.imwrite(img_path, np.random.default_rng(31).integers(
        0, 256, (48, 48, 3), dtype=np.uint8))

    rc = gradcam.main([img_path, "--checkpoint", ck, "--model", "pipecnn",
                       "--width", "8", "--n-blocks", "4", "--batch-norm",
                       "--image-size", "32",
                       "--layer", "trunk/block_3/b_conv1",
                       "--output-dir", str(tmp_path / "out")])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "out" / "0.png"))
