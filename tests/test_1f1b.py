"""1F1B pipeline schedule (memory-bounded pipelining, VERDICT r3 item 3).

The correctness bar mirrors test_pipeline.py's for GPipe: the schedule only
changes WHERE and WHEN each block's forward/backward runs, never what it
computes — M=1 must match the single-device step, and for any M the
gradients must match GPipe's (both use per-microbatch BN statistics). The
memory claim (live activations O(S) instead of O(M)) is documented with the
live-set arithmetic in parallel/pipeline.py:_make_1f1b_device_fn.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cnn_tpu import optim
from cnn_tpu.models import PipeCNN
from cnn_tpu.parallel import (create_train_state, make_pp_train_step,
                              make_train_step, shard_pp_train_state)


def _stage_mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("stage",))


def _data(rng, n=16, size=32):
    x = jnp.asarray(rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 3, (n,), dtype=np.int32))
    return x, y


def _max_dev(t1, t2):
    return max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))), t1, t2)))


def test_1f1b_single_microbatch_matches_single_device():
    """M=1: the 1F1B schedule equals the unpipelined step — loss bitwise
    (the forward path is identical math), params/state to recompute
    precision (the deferred backward re-derives each chunk's vjp)."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(20))
    x, y = _data(np.random.default_rng(20))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = _stage_mesh(4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False, schedule="1f1b")
    tsp, mp = stepp(tsp, x, y)

    assert float(m1["loss"]) == float(mp["loss"])
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-6
    assert _max_dev(ts1.state, tsp.state) < 1e-6


@pytest.mark.parametrize("n_stages,n_mb", [(4, 4), (2, 6)])
def test_1f1b_matches_gpipe_microbatched(n_stages, n_mb):
    """M>1 with BatchNorm: 1F1B and GPipe share the per-microbatch-stats
    semantics, so their losses, gradients (= post-step params) and BN
    moving stats must agree to float precision."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(21))
    x, y = _data(np.random.default_rng(21), n=24)

    mesh = _stage_mesh(n_stages)
    ts_g = shard_pp_train_state(ts0, mesh, model)
    step_g = make_pp_train_step(model, opt, mesh, n_microbatches=n_mb,
                                donate=False, schedule="gpipe")
    ts_g, m_g = step_g(ts_g, x, y)

    ts_f = shard_pp_train_state(ts0, mesh, model)
    step_f = make_pp_train_step(model, opt, mesh, n_microbatches=n_mb,
                                donate=False, schedule="1f1b")
    ts_f, m_f = step_f(ts_f, x, y)

    np.testing.assert_allclose(float(m_g["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    assert int(m_g["correct"]) == int(m_f["correct"])
    assert _max_dev(ts_g.params, ts_f.params) < 1e-6
    assert _max_dev(ts_g.state, ts_f.state) < 1e-6


def test_1f1b_dp_dropout_matches_gpipe():
    """DP2 x PP2 with an rng-consuming (Dropout) trunk: per-block keys are
    schedule-independent, so 1F1B draws GPipe's exact masks."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False, dropout=0.25)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(22))
    x, y = _data(np.random.default_rng(22))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "stage"))
    ts_g = shard_pp_train_state(ts0, mesh, model)
    step_g = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                donate=False, schedule="gpipe")
    ts_g, m_g = step_g(ts_g, x, y)

    ts_f = shard_pp_train_state(ts0, mesh, model)
    step_f = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                donate=False, schedule="1f1b")
    ts_f, m_f = step_f(ts_f, x, y)

    np.testing.assert_allclose(float(m_g["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    assert _max_dev(ts_g.params, ts_f.params) < 1e-6


def test_1f1b_remat_conv_trains():
    """The trunk's selective remat policy applies inside the in-tick vjp;
    multi-step training stays finite and converges on a constant batch."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    opt = optim.make_optimizer("momentum", 5e-2, 0.9)
    mesh = _stage_mesh(4)
    ts = shard_pp_train_state(
        create_train_state(model, opt, jax.random.key(23)), mesh, model)
    step = make_pp_train_step(model, opt, mesh, n_microbatches=4,
                              donate=False, schedule="1f1b")
    x, y = _data(np.random.default_rng(23))
    ts, m0 = step(ts, x, y)
    for _ in range(10):
        ts, m = step(ts, x, y)
    assert float(m["loss"]) < float(m0["loss"])
    for leaf in jax.tree.leaves(ts.state):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_1f1b_composes_with_device_dataset_and_toolbox():
    """schedule='1f1b' slots into the same step builder, so the round-4
    composition matrix (device dataset, augment, mixup, grad-accum) holds
    for the memory-bounded schedule too."""
    from cnn_tpu.data.device_dataset import DeviceDataset
    from cnn_tpu.ops.augment import augment_batch_fast

    rng = np.random.default_rng(24)
    imgs = rng.integers(0, 256, (32, 40, 40, 3), dtype=np.uint8)
    lbls = rng.integers(0, 3, (32,), dtype=np.int32)
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    opt = optim.sgd(1e-2)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "stage"))
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    ts = shard_pp_train_state(
        create_train_state(model, opt, jax.random.key(24)), mesh, model)
    step = make_pp_train_step(
        model, opt, mesh, n_microbatches=2, donate=False, schedule="1f1b",
        dataset=ds, batch_size=16, grad_accum=2,
        augment_fn=lambda k, im: augment_batch_fast(k, im, out_size=32))
    for _ in range(3):
        ts, m = step(ts)
    assert np.isfinite(float(m["loss"]))
    assert int(ts.step) == 3


def test_1f1b_mixup_matches_gpipe():
    """The loss-composition features are schedule-independent: mixup under
    1F1B equals mixup under GPipe (same perm/lam, same mixed CE)."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False, remat=False)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(25))
    x, y = _data(np.random.default_rng(25))

    mesh = _stage_mesh(4)
    ts_g = shard_pp_train_state(ts0, mesh, model)
    ts_g, m_g = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                   donate=False, mixup=0.4)(ts_g, x, y)
    ts_f = shard_pp_train_state(ts0, mesh, model)
    ts_f, m_f = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                   donate=False, mixup=0.4,
                                   schedule="1f1b")(ts_f, x, y)
    np.testing.assert_allclose(float(m_g["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    assert _max_dev(ts_g.params, ts_f.params) < 1e-6


def test_1f1b_dp_pp_tp_three_axis_matches_gpipe():
    """DP2 x PP2 x TP2 under the 1F1B schedule. The hand-scheduled
    backward re-derives each chunk's vjp with ``jax.vjp`` INSIDE the
    shard_map body, so the Megatron f/g custom-VJP collectives (column
    conv's input-cotangent psum over 'model', row conv's forward psum)
    must differentiate correctly inside the deferred backward — the one
    TP surface the GPipe-only 3-axis test (test_pipeline.py) never
    touches. Two steps so the zero-init row convs go live and the 'f'
    backward all-reduce carries signal; grads/params must match GPipe
    on the SAME mesh to float precision."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False, batch_norm=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(26))
    x, y = _data(np.random.default_rng(26))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "stage", "model"))
    # TP placement sanity: column conv's out-channels shard over 'model'
    ts_g = shard_pp_train_state(ts0, mesh, model)
    w_col = ts_g.params["trunk"]["body"]["b_conv1"]["w"]
    assert w_col.sharding.spec == (("stage",) + (None,) * 3 + ("model",))

    step_g = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                donate=False, schedule="gpipe")
    ts_f = shard_pp_train_state(ts0, mesh, model)
    step_f = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                donate=False, schedule="1f1b")
    for _ in range(2):
        ts_g, m_g = step_g(ts_g, x, y)
        ts_f, m_f = step_f(ts_f, x, y)
    np.testing.assert_allclose(float(m_g["loss"]), float(m_f["loss"]),
                               rtol=1e-5)
    assert int(m_g["correct"]) == int(m_f["correct"])
    assert _max_dev(ts_g.params, ts_f.params) < 1e-5


def test_1f1b_pp_tp_bn_matches_single_device():
    """PP2 x TP2 + BatchNorm at M=1: 1F1B must match the single-device
    step — BN state flows through the masked stat updates while the
    NORMALIZATION inside the recomputed chunk vjp reads batch stats, so
    the recompute is exact even with TP'd per-channel stats."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False, batch_norm=True)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(27))
    x, y = _data(np.random.default_rng(27))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 2, 2),
                ("data", "stage", "model"))
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False, schedule="1f1b")
    tsp, mp = stepp(tsp, x, y)
    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    assert _max_dev(ts1.params, tsp.params) < 1e-5
    assert _max_dev(ts1.state, tsp.state) < 1e-5
