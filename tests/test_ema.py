"""Weight EMA (optim.with_ema): math, checkpoint round-trip, CLI, sharding.

A production accuracy lever the reference's in-layer SGD
(``conv2d.cpp:205-217``) has no analog of: the averaged weights ride the
optimizer state, so they checkpoint/resume/shard with everything else.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.models import get_model
from cnn_tpu.parallel import create_train_state, make_train_step


def test_ema_math_matches_reference_recurrence():
    """The wrapper reproduces e_t = d*e_{t-1} + (1-d)*p_t with the
    (1+t)/(10+t) warmup cap, on a scalar 'model'."""
    base = optim.sgd(0.5)
    opt = optim.with_ema(base, decay=0.9)
    params = {"w": jnp.asarray(2.0)}
    s = opt.init(params)
    np.testing.assert_allclose(np.asarray(s.ema["w"]), 2.0)

    grads = {"w": jnp.asarray(1.0)}
    e, p = 2.0, 2.0
    for t in range(1, 6):
        params, s = opt.update(grads, s, params)
        p -= 0.5 * 1.0
        d = min(0.9, (1 + t) / (10 + t))
        e = d * e + (1 - d) * p
        np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.ema["w"]), e, rtol=1e-6)
    assert int(s.count) == 5


def test_ema_rides_train_step_and_checkpoint(tmp_path):
    """EMA state flows through the jitted train step, differs from the raw
    params, survives a checkpoint round-trip (restricted unpickler), and
    load_params(use_ema=True) returns it."""
    from cnn_tpu.tools.infer import load_params
    from cnn_tpu.utils.checkpoint import save_checkpoint

    model = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.with_ema(optim.make_optimizer("momentum", 5e-2, 0.9),
                         decay=0.99)
    ts = create_train_state(model, opt, jax.random.key(1))
    step = make_train_step(model, opt, donate=False)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    y = jnp.asarray(r.integers(0, 3, (8,), dtype=np.int32))
    for _ in range(3):
        ts, _ = step(ts, x, y)

    ema = optim.ema_params(ts.opt_state)
    assert ema is not None
    raw_w = np.asarray(ts.params["conv_layer_1"]["w"])
    ema_w = np.asarray(ema["conv_layer_1"]["w"])
    assert not np.allclose(raw_w, ema_w)   # the average lags the raw weights

    ck = os.path.join(tmp_path, "ema.ckpt")
    save_checkpoint(ck, ts)
    p2, _ = load_params(ck, model, use_ema=True)
    np.testing.assert_array_equal(np.asarray(p2["conv_layer_1"]["w"]), ema_w)
    praw, _ = load_params(ck, model)
    np.testing.assert_array_equal(np.asarray(praw["conv_layer_1"]["w"]),
                                  raw_w)


def test_load_params_use_ema_without_ema_errors(tmp_path):
    import pytest

    from cnn_tpu.tools.infer import load_params
    from cnn_tpu.utils.checkpoint import save_checkpoint

    model = get_model("alexnet", num_classes=3, image_size=64)
    ts = create_train_state(model, optim.sgd(1e-3), jax.random.key(0))
    ck = os.path.join(tmp_path, "plain.ckpt")
    save_checkpoint(ck, ts)
    with pytest.raises(ValueError, match="no EMA state"):
        load_params(ck, model, use_ema=True)


def test_ema_shards_like_params():
    """EMA leaves carry layer-named pytree paths, so shard_train_state
    gives them the same TP placement as their parameters."""
    from cnn_tpu.parallel import make_mesh, shard_train_state

    mesh = make_mesh(4, 2)
    model = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.with_ema(optim.make_optimizer("momentum", 1e-2, 0.9))
    ts = create_train_state(model, opt, jax.random.key(0))
    ts = shard_train_state(ts, mesh, model)
    ema = optim.ema_params(ts.opt_state)
    for name, leaf in (("conv_layer_4", ema["conv_layer_4"]["w"]),
                       ("linear_1", ema["linear_1"]["w"])):
        assert leaf.sharding == ts.params[name]["w"].sharding, name

    step = make_train_step(model, opt, mesh=mesh, donate=False)
    r = np.random.default_rng(2)
    x = jnp.asarray(r.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    y = jnp.asarray(r.integers(0, 3, (8,), dtype=np.int32))
    ts2, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))


def test_train_cli_ema_smoke(tmp_path, capsys):
    """--ema end to end through the real main(): runs, validates with the
    averaged weights, checkpoints them."""
    from cnn_tpu.tools import train

    rc = train.main([
        "--dataset-path", "/root/reference/datasets/animals",
        "--num-classes", "3", "--image-size", "64",
        "--train-batch-size", "8", "--valid-batch-size", "32",
        "--total-iters", "4", "--valid-iters", "2", "--save-iters", "2",
        "--ema", "0.9", "--optimizer", "momentum", "--momentum", "0.9",
        "--augment", "false", "--num-workers", "2",
        "--checkpoint-dir", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "weight EMA: decay 0.9" in out
    assert "Valid===>" in out
