"""Gradient accumulation (parallel.train_step.accumulate_grads).

The reference has no analog (fixed bs=4, ``cnn.cpp:36``); here it is the
HBM-scaling lever: K sequential microbatches re-use one microbatch's
activation memory, their mean gradient is exactly the full-batch mean for
rng-free models, and one optimizer step applies it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.data.device_dataset import DeviceDataset, make_device_train_step
from cnn_tpu.models import get_model
from cnn_tpu.parallel import (create_train_state, make_mesh, make_train_step,
                              shard_train_state)


def _model():
    # rng-free, stateless (no BN/dropout): accumulation must match the
    # full-batch gradient exactly (up to f32 summation-order roundoff)
    return get_model("alexnet", num_classes=3, image_size=64,
                     batch_norm=False)


def _batch(rng, b=16, size=64):
    imgs = rng.integers(0, 256, (b, size, size, 3), np.uint8)
    lbls = rng.integers(0, 3, (b,), np.int32)
    return jnp.asarray(imgs), jnp.asarray(lbls)


def test_accum_matches_full_batch(rng):
    model = _model()
    images, labels = _batch(rng)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.PRNGKey(0))

    full = make_train_step(model, opt, donate=False)
    acc = make_train_step(model, opt, donate=False, grad_accum=4)
    ts_f, m_f = full(ts0, images, labels)
    ts_a, m_a = acc(ts0, images, labels)

    np.testing.assert_allclose(np.asarray(m_a["loss"]),
                               np.asarray(m_f["loss"]), rtol=1e-5)
    assert int(m_a["correct"]) == int(m_f["correct"])
    for pf, pa in zip(jax.tree_util.tree_leaves(ts_f.params),
                      jax.tree_util.tree_leaves(ts_a.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pf),
                                   rtol=2e-4, atol=1e-6)


def test_accum_with_bn_runs_and_updates_state(rng):
    # BN stats are per-microbatch under accumulation (documented trade, same
    # as GPipe microbatching) — assert the step runs and stats move
    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=True)
    images, labels = _batch(rng)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, donate=False, grad_accum=2)
    ts1, metrics = step(ts0, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(ts0.state),
                        jax.tree_util.tree_leaves(ts1.state)))
    assert moved, "BN moving stats did not update under accumulation"


def test_accum_on_mesh_matches_single_device(rng):
    model = _model()
    images, labels = _batch(rng)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.PRNGKey(0))

    single = make_train_step(model, opt, donate=False, grad_accum=4)
    ts_s, m_s = single(ts0, images, labels)

    mesh = make_mesh(8, 1)
    ts_m = shard_train_state(ts0, mesh, model)
    sharded = make_train_step(model, opt, donate=False, grad_accum=4,
                              mesh=mesh)
    ts_p, m_p = sharded(ts_m, images, labels)

    np.testing.assert_allclose(np.asarray(m_p["loss"]),
                               np.asarray(m_s["loss"]), rtol=1e-5)
    for ps, pp in zip(jax.tree_util.tree_leaves(ts_s.params),
                      jax.tree_util.tree_leaves(ts_p.params)):
        np.testing.assert_allclose(np.asarray(pp), np.asarray(ps),
                                   rtol=2e-4, atol=1e-6)


def test_accum_on_mesh_shard_local_regroup_matches(rng):
    """mb % data_dim == 0 takes the zero-communication regroup path
    ([D, K, mb/D] transpose — every microbatch slice stays on its shard);
    the mean gradient over the full batch is grouping-invariant for an
    rng-free stateless model, so it must match the single-device result."""
    model = _model()
    images, labels = _batch(rng, b=64)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.PRNGKey(0))

    single = make_train_step(model, opt, donate=False, grad_accum=2)
    ts_s, m_s = single(ts0, images, labels)

    mesh = make_mesh(8, 1)
    sharded = make_train_step(model, opt, donate=False, grad_accum=2,
                              mesh=mesh)
    ts_p, m_p = sharded(shard_train_state(ts0, mesh, model), images, labels)

    np.testing.assert_allclose(np.asarray(m_p["loss"]),
                               np.asarray(m_s["loss"]), rtol=1e-5)
    for ps, pp in zip(jax.tree_util.tree_leaves(ts_s.params),
                      jax.tree_util.tree_leaves(ts_p.params)):
        np.testing.assert_allclose(np.asarray(pp), np.asarray(ps),
                                   rtol=2e-4, atol=1e-6)


def test_accum_device_dataset_composes_with_steps_per_call(rng):
    model = _model()
    imgs = rng.integers(0, 256, (64, 64, 64, 3), np.uint8)
    lbls = rng.integers(0, 3, (64,), np.int32)
    ds = DeviceDataset.from_arrays(imgs, lbls)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_device_train_step(model, opt, ds, 16, donate=False,
                                  steps_per_call=2, grad_accum=4)
    for _ in range(2):
        ts, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts.step) == 4
    assert int(metrics["batch"]) == 32


def test_accum_rejects_indivisible_batch(rng):
    model = _model()
    images, labels = _batch(rng, b=10)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, donate=False, grad_accum=4)
    try:
        step(ts, images, labels)
        assert False, "expected divisibility assert"
    except AssertionError as e:
        assert "grad_accum" in str(e)
