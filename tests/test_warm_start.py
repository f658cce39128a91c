"""Warm-start / transfer-learning init (utils.checkpoint.warm_start).

Superset capability: the reference's loader requires the identical
topology (/root/reference/cpu/src/alexnet.cpp:80-90); warm_start copies
every shape-matching tensor and keeps the fresh init for the rest (the
classifier head when num_classes differs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu import optim
from cnn_tpu.models import get_model
from cnn_tpu.parallel import create_train_state
from cnn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint, warm_start


def _trees_equal(a, b):
    return all(bool(jnp.array_equal(x, y)) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


@pytest.fixture(scope="module")
def src_ckpt(tmp_path_factory):
    model = get_model("resnet10", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-3)
    ts = create_train_state(model, opt, jax.random.key(7))
    path = str(tmp_path_factory.mktemp("ws") / "src.ckpt")
    save_checkpoint(path, ts._replace(step=jnp.asarray(123, jnp.int32)))
    return path


def test_head_mismatch_keeps_fresh_init_and_copies_trunk(src_ckpt):
    model4 = get_model("resnet10", num_classes=4, image_size=64)
    opt = optim.make_optimizer("momentum", 1e-3, momentum=0.9)
    fresh = create_train_state(model4, opt, jax.random.key(11))
    warmed, copied, skipped = warm_start(fresh, src_ckpt, opt)
    src = load_checkpoint(src_ckpt)
    # trunk (everything but the head) copied from the source
    assert _trees_equal({k: v for k, v in warmed.params.items() if k != "linear_1"},
                        {k: v for k, v in src.params.items() if k != "linear_1"})
    # BN moving stats travel too
    assert _trees_equal(warmed.state, src.state)
    # the 4-class head keeps the FRESH init (source head is 3-class)
    assert warmed.params["linear_1"]["w"].shape == (128, 4)
    assert _trees_equal(warmed.params["linear_1"], fresh.params["linear_1"])
    assert any("linear_1" in s for s in skipped)
    assert len(copied) > 20
    # a new run, not a resume: step stays fresh
    assert int(warmed.step) == 0


def test_opt_state_reinitialized_from_warmed_params(src_ckpt):
    model4 = get_model("resnet10", num_classes=4, image_size=64)
    opt = optim.with_ema(optim.make_optimizer("sgd", 1e-3), 0.99)
    fresh = create_train_state(model4, opt, jax.random.key(11))
    warmed, _, _ = warm_start(fresh, src_ckpt, opt)
    # the EMA average must start at the WARMED weights, not the fresh init
    ema_avg = warmed.opt_state.ema
    src = load_checkpoint(src_ckpt)
    assert bool(jnp.array_equal(ema_avg["stem_conv"]["w"],
                                src.params["stem_conv"]["w"]))


def test_same_topology_copies_everything(src_ckpt):
    model = get_model("resnet10", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-3)
    fresh = create_train_state(model, opt, jax.random.key(99))
    warmed, copied, skipped = warm_start(fresh, src_ckpt, opt)
    src = load_checkpoint(src_ckpt)
    assert skipped == []
    assert _trees_equal(warmed.params, src.params)
    assert _trees_equal(warmed.state, src.state)


def test_warmed_model_trains(src_ckpt):
    from cnn_tpu.parallel import make_train_step
    model4 = get_model("resnet10", num_classes=4, image_size=64)
    opt = optim.make_optimizer("momentum", 1e-2, momentum=0.9)
    fresh = create_train_state(model4, opt, jax.random.key(3))
    ts, _, _ = warm_start(fresh, src_ckpt, opt)
    step = make_train_step(model4, opt)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (8,), np.int32))
    losses = []
    for _ in range(5):
        ts, m = step(ts, imgs, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
