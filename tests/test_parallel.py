"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu import optim
from cnn_tpu.models import AlexNet
from cnn_tpu.parallel import (create_train_state, make_eval_step, make_mesh,
                              make_train_step, shard_train_state)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(8, 2)  # needs 16 devices


def test_dp_train_step_on_mesh():
    mesh = make_mesh(8, 1)
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)), mesh)
    step = make_train_step(model, opt, mesh=mesh, donate=False)
    x = jnp.zeros((16, 64, 64, 3), jnp.uint8)
    y = jnp.arange(16, dtype=jnp.int32) % 3
    ts, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))
    assert int(m["correct"]) <= 16


def test_dp_matches_single_device():
    """Gradient reduction over the mesh must equal the unsharded step."""
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    x = jnp.asarray(np.random.default_rng(0).random((8, 64, 64, 3)), jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % 3

    ts1 = create_train_state(model, opt, jax.random.key(1))
    step1 = make_train_step(model, opt, donate=False)
    out1, m1 = step1(ts1, x, y)

    mesh = make_mesh(8, 1)
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(1)), mesh)
    step2 = make_train_step(model, opt, mesh=mesh, donate=False)
    out2, m2 = step2(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out1.params),
                    jax.tree_util.tree_leaves(out2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_tp_shards_head_params():
    mesh = make_mesh(4, 2)
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)), mesh)
    # conv4 out-channels and linear in-features shard over 'model'
    w_conv4 = ts.params["conv_layer_4"]["w"]
    w_lin = ts.params["linear_1"]["w"]
    assert "model" in str(w_conv4.sharding.spec)
    assert "model" in str(w_lin.sharding.spec)
    # and a sharded train step still runs + stays finite
    step = make_train_step(model, opt, mesh=mesh, donate=False)
    ts, m = step(ts, jnp.zeros((8, 64, 64, 3), jnp.uint8),
                 jnp.arange(8, dtype=jnp.int32) % 3)
    assert np.isfinite(float(m["loss"]))


def test_tp_matches_single_device():
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    x = jnp.asarray(np.random.default_rng(1).random((8, 64, 64, 3)), jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % 3

    ts1 = create_train_state(model, opt, jax.random.key(2))
    out1, m1 = make_train_step(model, opt, donate=False)(ts1, x, y)

    mesh = make_mesh(4, 2)
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(2)), mesh)
    out2, m2 = make_train_step(model, opt, mesh=mesh, donate=False)(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out1.params["linear_1"]["w"]),
        np.asarray(out2.params["linear_1"]["w"]), rtol=1e-4, atol=1e-5)


def test_eval_step_on_mesh():
    mesh = make_mesh(8, 1)
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)), mesh)
    ev = make_eval_step(model, mesh=mesh)
    m = ev(ts.params, ts.state, jnp.zeros((16, 64, 64, 3), jnp.uint8),
           jnp.zeros(16, jnp.int32))
    assert np.isfinite(float(m["loss"]))


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    probs = jax.jit(fn)(*args)
    assert probs.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=-1), 1.0, rtol=1e-5)
