"""AOT serving artifacts (cnn_tpu/export.py): one file = program + weights.

The deployment inverse of the reference's scheme (its ``.model`` file is
useless without the exact C++ source that rebuilt the graph,
``inference.cpp:32-35``): the artifact embeds the lowered StableHLO and
the weights, serves any batch size through one symbolic dimension, and
loads with jax alone.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu import optim
from cnn_tpu.export import ServingArtifact, export_serving_artifact
from cnn_tpu.models import get_model
from cnn_tpu.parallel import create_train_state, make_train_step


def _small_trained(name="alexnet", steps=5, **kwargs):
    model = get_model(name, num_classes=3, image_size=64, **kwargs)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(3))
    step = make_train_step(model, opt, donate=False)
    r = np.random.default_rng(3)
    x = jnp.asarray(r.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    y = jnp.asarray(r.integers(0, 3, (8,), dtype=np.int32))
    for _ in range(steps):
        ts, _ = step(ts, x, y)
    return model, ts


def _f32_reference(model, ts, imgs):
    x = jnp.asarray(imgs).astype(jnp.float32) / 255.0
    logits, _, _ = model.apply(ts.params, ts.state, x, train=False)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return np.asarray(jnp.argmax(probs, -1)), np.asarray(probs)


def test_artifact_roundtrip_and_dynamic_batch(tmp_path):
    """Export -> load -> predict equals model.apply, at SEVERAL batch
    sizes through the single symbolic-batch program."""
    model, ts = _small_trained()
    path = os.path.join(tmp_path, "m.ctsa")
    meta = export_serving_artifact(model, ts.params, ts.state, path,
                                   platforms=("cpu",),
                                   class_names=["dog", "panda", "bird"])
    assert meta["image_size"] == 64 and meta["int8"] is False

    art = ServingArtifact.load(path)
    assert art.meta["class_names"] == ["dog", "panda", "bird"]
    r = np.random.default_rng(4)
    for n in (1, 3, 8):
        imgs = r.integers(0, 256, (n, 64, 64, 3), dtype=np.uint8)
        labels, probs = art.predict(imgs)
        l0, p0 = _f32_reference(model, ts, imgs)
        np.testing.assert_array_equal(labels, l0)
        np.testing.assert_allclose(probs, p0, rtol=1e-5, atol=1e-6)


def test_artifact_magic_rejects_other_files(tmp_path):
    p = os.path.join(tmp_path, "junk.ctsa")
    with open(p, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="not a cnn_tpu serving artifact"):
        ServingArtifact.load(p)


def test_int8_artifact_agreement(tmp_path):
    """An int8-exported artifact carries the folded quantized graph and
    classifies like the f32 model."""
    model, ts = _small_trained("resnet10", steps=8)
    r = np.random.default_rng(5)
    calib = r.integers(0, 256, (16, 64, 64, 3), dtype=np.uint8)
    path = os.path.join(tmp_path, "q.ctsa")
    meta = export_serving_artifact(model, ts.params, ts.state, path,
                                   platforms=("cpu",), int8_calib=calib)
    assert meta["int8"] is True
    art = ServingArtifact.load(path)
    test = r.integers(0, 256, (16, 64, 64, 3), dtype=np.uint8)
    labels, _ = art.predict(test)
    l0, _ = _f32_reference(model, ts, test)
    assert (labels == l0).mean() >= 0.9


def test_engine_from_artifact(tmp_path):
    """The serving engine (buckets/padding/micro-batching) runs on top of
    a loaded artifact with no model or params."""
    from cnn_tpu.serving import BatchingServer, InferenceEngine

    model, ts = _small_trained()
    path = os.path.join(tmp_path, "m.ctsa")
    export_serving_artifact(model, ts.params, ts.state, path,
                            platforms=("cpu",))
    engine = InferenceEngine.from_artifact(ServingArtifact.load(path),
                                           buckets=(1, 4))
    r = np.random.default_rng(6)
    imgs = r.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    labels, probs = engine.predict(imgs)       # 6 -> 4 + padded 2
    l0, p0 = _f32_reference(model, ts, imgs)
    np.testing.assert_array_equal(labels, l0)
    np.testing.assert_allclose(probs, p0, rtol=1e-5, atol=1e-6)

    with BatchingServer(engine, batch_timeout_ms=1.0) as srv:
        fut = srv.submit(imgs[0])
        label, _ = fut.result(timeout=60)
        assert label == l0[0]


def test_export_cli_and_serve_cli(tmp_path, capsys):
    """End to end through the real mains: train-checkpoint -> artifact ->
    serve --artifact classifies a written image file."""
    import cv2

    from cnn_tpu.tools import export_artifact, serve
    from cnn_tpu.utils.checkpoint import save_checkpoint

    model, ts = _small_trained()
    ckpt = os.path.join(tmp_path, "m.ckpt")
    save_checkpoint(ckpt, ts)
    art = os.path.join(tmp_path, "m.ctsa")
    assert export_artifact.main([ckpt, art, "--name", "alexnet",
                                 "--image-size", "64",
                                 "--platforms", "cpu"]) == 0
    img = np.random.default_rng(7).integers(0, 256, (64, 64, 3),
                                            dtype=np.uint8)
    ipath = os.path.join(tmp_path, "x.png")
    cv2.imwrite(ipath, img)
    rc = serve.main([ipath, "--artifact", art])
    assert rc == 0
    out = capsys.readouterr().out
    assert ipath in out
    label = out.strip().split("\t")[1]
    assert label in ("dog", "panda", "bird")
