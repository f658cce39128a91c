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
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)), mesh, model)
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
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(1)), mesh, model)
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
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)), mesh, model)
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
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(2)), mesh, model)
    out2, m2 = make_train_step(model, opt, mesh=mesh, donate=False)(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out1.params["linear_1"]["w"]),
        np.asarray(out2.params["linear_1"]["w"]), rtol=1e-4, atol=1e-5)


def test_eval_step_on_mesh():
    mesh = make_mesh(8, 1)
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)), mesh, model)
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


# ---------------- device-resident dataset x mesh (VERDICT r1 item 2) --------


def _toy_device_ds(n, size=64, mesh=None):
    from cnn_tpu.data.device_dataset import DeviceDataset
    rng = np.random.default_rng(42)
    imgs = rng.integers(0, 256, (n, size, size, 3), np.uint8)
    lbls = rng.integers(0, 3, (n,))
    return DeviceDataset.from_arrays(imgs, lbls, mesh=mesh), imgs, lbls


def test_device_dataset_dp8_matches_single_device():
    """The sharded device-resident step (global sampling mode: identical
    index sequence) reproduces the single-device step numerically."""
    from cnn_tpu.data.device_dataset import make_device_train_step
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)

    ds1, imgs, lbls = _toy_device_ds(n=32)
    ts1 = create_train_state(model, opt, jax.random.key(3))
    step1 = make_device_train_step(model, opt, ds1, 16, donate=False)
    out1, m1 = step1(ts1)

    mesh = make_mesh(8, 1)
    from cnn_tpu.data.device_dataset import DeviceDataset
    ds2 = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    assert ds2.n == 32  # divisible: no padding, same index space
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(3)),
                            mesh, model)
    step2 = make_device_train_step(model, opt, ds2, 16, donate=False,
                                   mesh=mesh, sample_mode="global")
    out2, m2 = step2(ts2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    assert int(m1["correct"]) == int(m2["correct"])
    for a, b in zip(jax.tree_util.tree_leaves(out1.params),
                    jax.tree_util.tree_leaves(out2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_device_dataset_local_sampling_pairs_and_progress():
    """Shard-local sampling keeps (image, label) pairs intact across the
    mesh and the collective-free step trains."""
    from cnn_tpu.data.device_dataset import (DeviceDataset, _make_sampler,
                                             make_device_train_step)
    mesh = make_mesh(8, 1)
    # image i is constant-valued i; label i = i % 3 -> any mismatch after
    # sharded sampling breaks the pairing invariant
    n = 40
    imgs = np.tile(np.arange(n, dtype=np.uint8)[:, None, None, None],
                   (1, 64, 64, 3))
    lbls = np.arange(n, dtype=np.int32) % 3
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    sampler = jax.jit(_make_sampler(ds, 32, mesh, "local"))
    xs, ys = sampler(jax.random.key(0), ds.images, ds.labels)
    xs, ys = np.asarray(xs), np.asarray(ys)
    assert (xs == xs[:, :1, :1, :1]).all()  # still constant images
    ids = xs[:, 0, 0, 0].astype(np.int64)
    np.testing.assert_array_equal(ids % 3, ys)
    # sub-batches draw from disjoint local shards (stratified sampling):
    # shard d holds rows [d*5, (d+1)*5) of the padded 40-row dataset
    ids = ids.reshape(8, 4)
    for d in range(8):
        assert ((ids[d] >= d * 5) & (ids[d] < (d + 1) * 5)).all(), (d, ids[d])

    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(4)),
                           mesh, model)
    step = make_device_train_step(model, opt, ds, 32, donate=False, mesh=mesh)
    losses = []
    for _ in range(5):
        ts, m = step(ts)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # constant-image toy problem: learnable
    assert int(ts.step) == 5


def test_device_dataset_padding_to_shard_divisible():
    from cnn_tpu.data.device_dataset import DeviceDataset
    mesh = make_mesh(8, 1)
    ds, _, _ = _toy_device_ds(n=13, mesh=mesh)
    assert ds.n == 16  # padded up to the next multiple of 8
    assert ds.images.shape[0] == 16 and ds.labels.shape[0] == 16


def test_spec_driven_sharding_custom_names():
    """Sharding intent comes from Layer.param_pspecs, not layer-name
    matching: a dense layer named anything still TP-shards."""
    from cnn_tpu.nn.module import Flatten, Linear, ReLU
    from cnn_tpu.nn.sequential import Sequential

    class Tiny:
        def __init__(self):
            self.net = Sequential([
                Flatten("reshape_in"),
                Linear("mystery_projection", in_features=48, out_features=16),
                ReLU("act"),
                Linear("the_decider", in_features=16, out_features=3),
            ])
        layers = property(lambda self: self.net.layers)
        init = lambda self, key, dtype=jnp.float32: self.net.init(key, dtype)
        def apply(self, params, state, x, **kw):
            return self.net.apply(params, state, x, **kw)

    mesh = make_mesh(4, 2)
    model = Tiny()
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)),
                           mesh, model)
    assert "model" in str(ts.params["mystery_projection"]["w"].sharding.spec)
    assert "model" in str(ts.params["the_decider"]["w"].sharding.spec)
    step = make_train_step(model, opt, mesh=mesh, donate=False)
    ts, m = step(ts, jnp.zeros((8, 4, 4, 3), jnp.float32),
                 jnp.arange(8, dtype=jnp.int32) % 3)
    assert np.isfinite(float(m["loss"]))


def test_tp_shards_nested_resnet_params():
    """model_pspecs recurses into composite layers: ResNet's wide nested
    convs and the head TP-shard instead of silently replicating."""
    from cnn_tpu.models import get_model
    mesh = make_mesh(4, 2)
    model = get_model("resnet10", num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = shard_train_state(create_train_state(model, opt, jax.random.key(0)),
                           mesh, model)
    w = ts.params["block_4"]["body"]["block_4_conv1"]["w"]
    assert "model" in str(w.sharding.spec), w.sharding
    step = make_train_step(model, opt, mesh=mesh, donate=False)
    ts, m = step(ts, jnp.zeros((8, 64, 64, 3), jnp.uint8),
                 jnp.arange(8, dtype=jnp.int32) % 3)
    assert np.isfinite(float(m["loss"]))


def test_device_dataset_steps_per_call_matches_singles():
    """K steps chained in one program (lax.scan) == K one-step calls: the
    per-step RNG folds ts.step, which advances inside the scan too."""
    from cnn_tpu.data.device_dataset import make_device_train_step
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)

    ds, _, _ = _toy_device_ds(n=32)
    ts1 = create_train_state(model, opt, jax.random.key(4))
    one = make_device_train_step(model, opt, ds, 8, donate=False)
    losses = []
    for _ in range(4):
        ts1, m = one(ts1)
        losses.append(float(m["loss"]))

    ts4 = create_train_state(model, opt, jax.random.key(4))
    chunk = make_device_train_step(model, opt, ds, 8, donate=False,
                                   steps_per_call=4)
    ts4, m4 = chunk(ts4)

    assert int(ts4.step) == int(ts1.step) == 4
    assert int(m4["batch"]) == 32
    np.testing.assert_allclose(float(m4["loss"]), np.mean(losses), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


# ---------------- spatial partitioning ('spatial' axis = SP for CNNs) ------


def test_spatial_partitioning_matches_single_device():
    """Activation rows sharded over 'spatial': XLA's SPMD partitioner
    inserts the halo exchanges every conv/pool window needs at shard
    boundaries, so DP2 x SP4 must reproduce the single-device step."""
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    x = jnp.asarray(np.random.default_rng(7).random((8, 64, 64, 3)),
                    jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % 3

    ts1 = create_train_state(model, opt, jax.random.key(9))
    step1 = make_train_step(model, opt, donate=False)
    out1, m1 = step1(ts1, x, y)

    mesh = make_mesh(2, 1, spatial_parallel=4)
    assert dict(mesh.shape) == {"data": 2, "model": 1, "spatial": 4}
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(9)),
                            mesh, model)
    step2 = make_train_step(model, opt, mesh=mesh, donate=False)
    out2, m2 = step2(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out1.params),
                    jax.tree_util.tree_leaves(out2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_spatial_partitioning_eval_and_resnet():
    """SP eval path, and a padded-conv model (resnet10) where every 3x3
    stride-1 window straddles shard boundaries."""
    from cnn_tpu.models import ResNet
    model = ResNet("resnet10", num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(10))
    x = jnp.asarray(np.random.default_rng(8).random((8, 64, 64, 3)),
                    jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % 3

    ev1 = make_eval_step(model)
    out1 = ev1(ts.params, ts.state, x, y)

    mesh = make_mesh(1, 1, spatial_parallel=8)
    ts2 = shard_train_state(ts, mesh, model)
    ev2 = make_eval_step(model, mesh=mesh)
    out2 = ev2(ts2.params, ts2.state, x, y)

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out1["pred"]),
                                  np.asarray(out2["pred"]))


def test_composed_dp_tp_sp_mesh():
    """Three parallelism axes in ONE mesh (data2 x model2 x spatial2):
    DP + TP + spatial halo-exchange compose and match single-device."""
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    x = jnp.asarray(np.random.default_rng(11).random((8, 64, 64, 3)),
                    jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % 3

    ts1 = create_train_state(model, opt, jax.random.key(12))
    out1, m1 = make_train_step(model, opt, donate=False)(ts1, x, y)

    mesh = make_mesh(2, 2, spatial_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2, "spatial": 2}
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(12)),
                            mesh, model)
    out2, m2 = make_train_step(model, opt, mesh=mesh, donate=False)(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out1.params),
                    jax.tree_util.tree_leaves(out2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
