"""Coverage for remaining paths: bf16 serving, VGG TP sharding, history
ascii fallback, full-mode device augment in the step, convert with BN."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.models import AlexNet, get_model
from cnn_tpu.parallel import (create_train_state, make_mesh, make_train_step,
                              shard_train_state)
from cnn_tpu.serving import InferenceEngine


def test_serving_bf16(rng):
    model = AlexNet(num_classes=3, image_size=64)
    params, state = model.init(jax.random.key(0))
    engine = InferenceEngine(model, params, state, buckets=(2,),
                             compute_dtype=jnp.bfloat16)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    labels, probs = engine.predict(imgs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-2)


def test_vgg_tp_sharding():
    mesh = make_mesh(4, 2)
    model = get_model("vgg8", num_classes=4, image_size=64)
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)), mesh, model)
    # the gap->linear head: in_features=256 divisible by model=2
    assert "model" in str(ts.params["linear_1"]["w"].sharding.spec)
    step = make_train_step(model, opt, mesh=mesh, donate=False)
    ts, m = step(ts, jnp.zeros((8, 64, 64, 3), jnp.uint8),
                 jnp.arange(8, dtype=jnp.int32) % 4)
    assert np.isfinite(float(m["loss"]))


def test_full_mode_augment_in_train_step(rng):
    from cnn_tpu.ops.augment import augment_batch
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(1))
    step = make_train_step(
        model, opt, donate=False,
        augment_fn=lambda r, im: augment_batch(r, im, out_size=64))
    x = jnp.asarray(rng.integers(0, 256, (4, 96, 96, 3), dtype=np.uint8))
    y = jnp.zeros(4, jnp.int32)
    ts, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))


def test_history_ascii_fallback(tmp_path, monkeypatch):
    import builtins
    from cnn_tpu.utils import history as H
    path = os.path.join(tmp_path, "h.jsonl")
    w = H.HistoryWriter(path)
    for i in range(10):
        w.log(step=i, loss=1.0 / (1 + i))
    w.close()

    real_import = builtins.__import__

    def fake_import(name, *a, **kw):
        if name.startswith("matplotlib"):
            raise ImportError("forced")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    out = H.plot_history(path, keys=("loss",))
    assert "loss" in out and "*" in out  # ascii chart


def test_convert_bn_roundtrip(tmp_path):
    """BN-model export -> import preserves all params + moving stats."""
    from cnn_tpu.utils.checkpoint import (export_reference_model,
                                          import_reference_model)
    model = AlexNet(num_classes=3, batch_norm=True)
    params, state = model.init(jax.random.key(3))
    # make stats non-trivial
    state = jax.tree_util.tree_map(lambda x: x + 0.25, state)
    path = os.path.join(tmp_path, "bn.model")
    export_reference_model(path, model.net, params, state)
    params2, state2 = import_reference_model(path, model.net)
    for a, b in zip(jax.tree_util.tree_leaves((params, state)),
                    jax.tree_util.tree_leaves((params2, state2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
