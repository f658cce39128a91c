"""Frozen-subtree fine-tuning (optim.with_frozen + --freeze).

Superset: the reference has no per-layer trainability — every layer
self-updates inside its own backward
(/root/reference/cpu/src/conv2d.cpp:205-217).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu import optim
from cnn_tpu.models import get_model
from cnn_tpu.parallel import create_train_state, make_train_step


def _setup(opt):
    model = get_model("resnet10", num_classes=3, image_size=64)
    ts = create_train_state(model, opt, jax.random.key(0))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 3, (8,), np.int32))
    return model, ts, imgs, labels


def _eq(a, b):
    return bool(jnp.array_equal(a, b))


def test_frozen_subtrees_stay_put_head_trains():
    opt = optim.with_frozen(
        optim.make_optimizer("momentum", 1e-2, momentum=0.9),
        ["stem", "block"])
    model, ts, imgs, labels = _setup(opt)
    step = make_train_step(model, opt, donate=False)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), ts.params)
    for _ in range(3):
        ts, _ = step(ts, imgs, labels)
    for k in p0:
        if k == "linear_1":
            continue
        assert all(_eq(a, b) for a, b in
                   zip(jax.tree_util.tree_leaves(p0[k]),
                       jax.tree_util.tree_leaves(ts.params[k]))), k
    assert not _eq(p0["linear_1"]["w"], ts.params["linear_1"]["w"])


def test_frozen_survives_weight_decay():
    """add_decayed_weights must not shrink frozen weights."""
    opt = optim.with_frozen(
        optim.make_optimizer("sgd", 1e-2, weight_decay=1e-2),
        ["stem_conv"])
    model, ts, imgs, labels = _setup(opt)
    step = make_train_step(model, opt, donate=False)
    w0 = np.asarray(ts.params["stem_conv"]["w"])
    for _ in range(3):
        ts, _ = step(ts, imgs, labels)
    np.testing.assert_array_equal(w0, np.asarray(ts.params["stem_conv"]["w"]))


def test_freeze_composes_with_ema():
    opt = optim.with_ema(optim.with_frozen(
        optim.make_optimizer("sgd", 1e-2), ["stem"]), 0.9)
    model, ts, imgs, labels = _setup(opt)
    step = make_train_step(model, opt, donate=False)
    s0 = np.asarray(ts.params["stem_conv"]["w"])
    for _ in range(3):
        ts, _ = step(ts, imgs, labels)
    # frozen weights constant -> their EMA equals them
    ema = optim.ema_params(ts.opt_state)
    np.testing.assert_array_equal(s0, np.asarray(ts.params["stem_conv"]["w"]))
    np.testing.assert_allclose(s0, np.asarray(ema["stem_conv"]["w"]),
                               rtol=1e-6)


def test_freeze_bad_prefix_asserts():
    opt = optim.with_frozen(optim.make_optimizer("sgd", 1e-2), ["nonesuch"])
    model = get_model("alexnet", num_classes=3, image_size=64)
    with pytest.raises(AssertionError):
        create_train_state(model, opt, jax.random.key(0))
