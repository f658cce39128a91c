"""Model-level tests: AlexNet topology, train step, checkpoint round-trip."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.core.pytree import param_count
from cnn_tpu.models import AlexNet, get_model
from cnn_tpu.parallel import (create_train_state, make_eval_step, make_forward,
                              make_train_step)
from cnn_tpu.utils.checkpoint import (checkpoint_name, load_checkpoint,
                                      parse_checkpoint_name,
                                      reference_param_count, save_checkpoint)


def test_alexnet_shape_chain():
    model = AlexNet(num_classes=3)
    shapes = dict(model.net.out_shapes((224, 224, 3)))
    # reference chain: 224->111->55(pool)->27->13->6 (alexnet.cpp:11-32)
    assert shapes["conv_layer_1"] == (111, 111, 16)
    assert shapes["max_pool_1"] == (55, 55, 16)
    assert shapes["conv_layer_2"] == (27, 27, 32)
    assert shapes["conv_layer_3"] == (13, 13, 64)
    assert shapes["conv_layer_4"] == (6, 6, 128)
    assert shapes["linear_1"] == (3,)


def test_alexnet_param_count():
    """111,267 params = the reference's 445,068-byte checkpoint (SURVEY.md §6)."""
    model = AlexNet(num_classes=3)
    params, _ = model.init(jax.random.key(0))
    assert param_count(params) == 111_267
    assert reference_param_count(model.net) == 111_267


def test_alexnet_bn_param_count():
    model = AlexNet(num_classes=3, batch_norm=True)
    # BN save format adds 4 vectors per BN layer (gamma/beta/mean/var)
    assert reference_param_count(model.net) == 111_267 + 4 * (16 + 32 + 64 + 128)


def test_forward_shapes_and_dtype():
    model = AlexNet(num_classes=3)
    params, state = model.init(jax.random.key(0))
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    logits, _, _ = model.apply(params, state, x)
    assert logits.shape == (2, 3)


def test_registry():
    m = get_model("alexnet", num_classes=5)
    assert m.num_classes == 5


def test_train_step_learns(rng):
    """A few SGD steps on a separable toy problem must reduce loss."""
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(0))
    step = make_train_step(model, opt)

    # three classes with distinct mean intensities
    labels = np.array([0, 1, 2, 0, 1, 2], np.int32)
    images = np.stack([np.full((64, 64, 3), 0.1 + 0.4 * l, np.float32)
                       + rng.standard_normal((64, 64, 3)).astype(np.float32) * 0.01
                       for l in labels])
    first_loss = None
    for _ in range(30):
        ts, metrics = step(ts, jnp.asarray(images), jnp.asarray(labels))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < first_loss
    assert int(ts.step) == 30


def test_train_step_uint8_input():
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-3)
    ts = create_train_state(model, opt, jax.random.key(1))
    step = make_train_step(model, opt)
    images = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    labels = jnp.zeros((2,), jnp.int32)
    ts, metrics = step(ts, images, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_and_forward():
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-3)
    ts = create_train_state(model, opt, jax.random.key(2))
    ev = make_eval_step(model)
    metrics = ev(ts.params, ts.state, jnp.zeros((4, 64, 64, 3)), jnp.zeros(4, jnp.int32))
    assert 0 <= int(metrics["correct"]) <= 4
    fwd = make_forward(model)
    probs = fwd(ts.params, ts.state, jnp.zeros((1, 64, 64, 3)))
    np.testing.assert_allclose(np.asarray(probs).sum(), 1.0, rtol=1e-5)


def test_bn_dropout_model_runs():
    model = AlexNet(num_classes=3, image_size=64, batch_norm=True, dropout=0.4)
    opt = optim.sgd(1e-3)
    ts = create_train_state(model, opt, jax.random.key(3))
    step = make_train_step(model, opt)
    x = jnp.ones((4, 64, 64, 3)) * 0.5
    y = jnp.zeros(4, jnp.int32)
    before = np.asarray(ts.state["bn_layer_1"]["mean"]).copy()  # read pre-donation
    ts2, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))
    # BN state must have been updated by the train step
    after = np.asarray(ts2.state["bn_layer_1"]["mean"])
    assert not np.allclose(before, after)


def test_optimizers():
    for name in ("sgd", "momentum", "adam"):
        model = AlexNet(num_classes=3, image_size=64)
        opt = optim.make_optimizer(name, 1e-3)
        ts = create_train_state(model, opt, jax.random.key(4))
        step = make_train_step(model, opt)
        ts, m = step(ts, jnp.zeros((2, 64, 64, 3)), jnp.zeros(2, jnp.int32))
        assert np.isfinite(float(m["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-3)
    ts = create_train_state(model, opt, jax.random.key(5))
    step = make_train_step(model, opt, donate=False)
    ts, _ = step(ts, jnp.ones((2, 64, 64, 3)), jnp.zeros(2, jnp.int32))

    path = os.path.join(tmp_path, "ck.ckpt")
    save_checkpoint(path, ts)
    ts2 = load_checkpoint(path)
    assert int(ts2.step) == int(ts.step)
    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training continues identically
    ts_a, m_a = step(ts, jnp.ones((2, 64, 64, 3)), jnp.zeros(2, jnp.int32))
    ts_b, m_b = step(ts2, jnp.ones((2, 64, 64, 3)), jnp.zeros(2, jnp.int32))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)


def test_checkpoint_load_rejects_code_execution(tmp_path):
    """load_checkpoint is data-only: a pickle carrying a callable global
    (the classic os.system __reduce__ payload) must be refused, not run."""
    import pickle

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned > /dev/null",))

    path = os.path.join(tmp_path, "evil.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"params": Evil()}, f)
    with pytest.raises(pickle.UnpicklingError, match="blocked global"):
        load_checkpoint(path)


def test_checkpoint_names():
    name = checkpoint_name(5000, 0.761, 0.803)
    assert name == "iter_5000_train_0.761_valid_0.803.ckpt"
    assert parse_checkpoint_name(name) == (5000, 0.761, 0.803)


def test_lr_schedules():
    from cnn_tpu import optim as _optim
    for sched in ("constant", "cosine", "step"):
        opt = _optim.make_optimizer("momentum", 1e-2, 0.9, schedule=sched,
                                    total_steps=100)
        model = AlexNet(num_classes=3, image_size=64)
        ts = create_train_state(model, opt, jax.random.key(0))
        step = make_train_step(model, opt, donate=False)
        ts, m = step(ts, jnp.zeros((2, 64, 64, 3)), jnp.zeros(2, jnp.int32))
        assert np.isfinite(float(m["loss"]))
    # warmup: first step must apply ~zero lr
    opt = _optim.make_optimizer("sgd", 1e-2, schedule="constant",
                                warmup_steps=10)
    model = AlexNet(num_classes=3, image_size=64)
    ts = create_train_state(model, opt, jax.random.key(0))
    before = np.asarray(ts.params["linear_1"]["w"]).copy()
    step = make_train_step(model, opt, donate=False)
    ts2, _ = step(ts, jnp.ones((2, 64, 64, 3)), jnp.zeros(2, jnp.int32))
    np.testing.assert_allclose(np.asarray(ts2.params["linear_1"]["w"]), before,
                               atol=1e-7)


def test_vgg_family():
    from cnn_tpu.models import get_model
    model = get_model("vgg8", num_classes=3, image_size=64)
    params, state = model.init(jax.random.key(0))
    assert "bn_1" in state  # BN on by default
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    logits, new_state, _ = model.apply(params, state, x, train=True)
    assert logits.shape == (2, 3)
    # trains through the shared machinery
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(1))
    step = make_train_step(model, opt)
    ts, m = step(ts, jnp.zeros((2, 64, 64, 3), jnp.uint8), jnp.zeros(2, jnp.int32))
    assert np.isfinite(float(m["loss"]))


def test_orbax_checkpoint_roundtrip(tmp_path):
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-3)
    ts = create_train_state(model, opt, jax.random.key(7))
    path = os.path.join(tmp_path, "orbax_ck")
    save_checkpoint(path, ts, backend="orbax")
    assert os.path.isdir(path)
    ts2 = load_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ts2.step) == 0


def test_tensor_utility_ops(rng):
    from cnn_tpu.ops import tensor as T
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 3), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(T.div(x, 2.0)), np.asarray(x) / 2)
    r = np.asarray(T.rot180(x))
    np.testing.assert_array_equal(r, np.asarray(x)[:, ::-1, ::-1, :])
    p = T.pad2d(x, 2)
    assert p.shape == (2, 8, 10, 3)
    np.testing.assert_array_equal(np.asarray(p[:, :2]), 0)
    mm = np.asarray(T.minmax_normalize(x))
    assert mm.min() == 0.0 and mm.max() == 1.0


def test_label_smoothing_and_weight_decay():
    from cnn_tpu import ops as _ops
    logits = jnp.asarray([[2.0, -1.0, 0.5]])
    labels = jnp.asarray([0])
    plain = float(_ops.softmax_cross_entropy(logits, labels))
    smooth = float(_ops.softmax_cross_entropy(logits, labels, label_smoothing=0.1))
    assert smooth > plain  # smoothing adds entropy mass on wrong classes
    # weight decay shrinks weights even with zero gradient signal
    opt = optim.make_optimizer("momentum", 1e-1, 0.9, weight_decay=1e-2)
    params = {"w": jnp.ones((4,))}
    opt_state = opt.init(params)
    new_params, _ = opt.update({"w": jnp.zeros((4,))}, opt_state, params)
    assert float(new_params["w"][0]) < 1.0


def test_resnet_family_shapes_and_training():
    """Third model family: residual blocks (composite layers), padded convs,
    1x1 projection shortcuts — reference TODOs #5/#8 as supersets."""
    from cnn_tpu.models import get_model

    model = get_model("resnet10", num_classes=3, image_size=64)
    shapes = dict(model.net.out_shapes((64, 64, 3)))
    assert shapes["block_4"] == (4, 4, 128)
    assert shapes["linear_1"] == (3,)

    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(1))
    step = make_train_step(model, opt, donate=False)
    x = jnp.asarray(np.random.default_rng(0).random((8, 64, 64, 3)), jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % 3
    losses = []
    for _ in range(6):
        ts, m = step(ts, x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6          # residual net learns
    # BN state lives nested under the block and updates
    assert "body" in ts.state["block_1"]
    # grad-CAM style capture works on composite layers
    logits, _, cap = model.apply(ts.params, ts.state,
                                 x[:1], capture=("block_4",))
    assert cap["block_4"].shape == (1, 4, 4, 128)


def test_residual_block_identity_vs_projection():
    from cnn_tpu.models.resnet import _block

    b_id = _block("b", 32, 32, 1)
    assert b_id.proj is None
    b_proj = _block("b", 16, 32, 2)
    assert b_proj.proj is not None and b_proj.proj.kernel_size == 1
    params, state = b_proj.init(jax.random.key(0))
    x = jnp.ones((2, 8, 8, 16))
    y, _ = b_proj.apply(params, state, x, train=True)
    assert y.shape == (2, 4, 4, 32)
    assert float(jnp.min(y)) >= 0.0              # relu after the add
