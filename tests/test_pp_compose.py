"""Pipeline parallelism x the rest of the framework (round-4 composition).

Round 3 fenced the PP path off from the device-resident dataset, device
augmentation, mixup/cutmix, distillation, grad accumulation and TTA
(tools/train.py asserts). This file proves the round-4 compositions against
the framework's own oracles: the sequential device step and the sequential
(GSPMD) train/eval steps — the same bar test_pipeline.py sets for the bare
schedule. All on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cnn_tpu import optim
from cnn_tpu.data.device_dataset import (DeviceDataset, _make_epoch_sampler,
                                         make_device_train_step)
from cnn_tpu.models import PipeCNN
from cnn_tpu.parallel import (create_train_state, make_eval_step,
                              make_pp_eval_step, make_pp_train_step,
                              make_train_step, shard_pp_train_state)


def _pp_mesh(dp, stages):
    return Mesh(np.array(jax.devices()[:dp * stages]).reshape(dp, stages),
                ("data", "stage"))


def _data(rng, n=16, size=32, classes=3):
    x = jnp.asarray(rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, classes, (n,), dtype=np.int32))
    return x, y


def _max_dev(t1, t2):
    return max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))), t1, t2)))


def test_pp_device_dataset_with_augment_matches_sequential_device_step():
    """VERDICT r3 item 1 closed: the HBM-resident sampler + on-device
    augmentation feed the pipelined step, and with M=1 on a single data
    shard the result is EQUAL to make_device_train_step — same sampled
    batch (same key derivation, 'global' sampling = the unsharded uniform
    draw), same augmented pixels, same schedule math."""
    from cnn_tpu.ops.augment import augment_batch_fast

    rng = np.random.default_rng(40)
    imgs = rng.integers(0, 256, (37, 40, 40, 3), dtype=np.uint8)
    lbls = rng.integers(0, 3, (37,), dtype=np.int32)
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(0))

    def aug(k, x):
        return augment_batch_fast(k, x, out_size=32)

    ds1 = DeviceDataset.from_arrays(imgs, lbls)
    step1 = make_device_train_step(model, opt, ds1, 16, donate=False,
                                   augment_fn=aug)
    ts1 = ts0
    for _ in range(3):
        ts1, m1 = step1(ts1)

    mesh = _pp_mesh(1, 4)
    ds2 = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False, dataset=ds2, batch_size=16,
                               augment_fn=aug, sample_mode="global")
    for _ in range(3):
        tsp, mp = stepp(tsp)

    assert float(m1["loss"]) == float(mp["loss"])
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) == 0.0
    assert _max_dev(ts1.state, tsp.state) == 0.0


def test_pp_device_dataset_data_sharded_trains():
    """DP2 x PP2 with the shard-local sampler: the collective-free input
    path runs under the pipeline schedule and training makes progress."""
    rng = np.random.default_rng(41)
    imgs = rng.integers(0, 256, (32, 32, 32, 3), dtype=np.uint8)
    lbls = rng.integers(0, 3, (32,), dtype=np.int32)
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    opt = optim.make_optimizer("momentum", 5e-2, 0.9)
    mesh = _pp_mesh(2, 2)
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    ts = shard_pp_train_state(create_train_state(model, opt, jax.random.key(1)),
                              mesh, model)
    step = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                              donate=False, dataset=ds, batch_size=16,
                              sample_mode="local")
    ts, m0 = step(ts)
    for _ in range(10):
        ts, m = step(ts)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(ts.step) == 11
    for leaf in jax.tree.leaves(ts.state):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_pp_epoch_sampler_exactly_once_on_pp_mesh():
    """The epoch-permutation sampler (the reference's exactly-once
    protocol, pipeline.cpp:145-151) runs on a ('data','stage') mesh: each
    data shard walks its own permutation; per epoch every row is sampled
    exactly once, replicated across 'stage'."""
    mesh = _pp_mesh(2, 2)
    n, bs = 24, 8
    imgs = np.zeros((n, 4, 4, 3), np.uint8)
    lbls = np.arange(n, dtype=np.int32)  # unique ids
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    sampler = _make_epoch_sampler(ds, bs, mesh, fixed=False)
    key = jax.random.key(5)
    seen = []
    for step in range(n // bs):
        _, y = jax.jit(sampler)(key, jnp.int32(step), ds.images, ds.labels)
        seen.extend(np.asarray(y).tolist())
    assert sorted(seen) == list(range(n))


def test_pp_epoch_mode_device_step_runs():
    """sample_mode='epoch' composes with the full pipelined device step."""
    rng = np.random.default_rng(42)
    imgs = rng.integers(0, 256, (32, 32, 32, 3), dtype=np.uint8)
    lbls = rng.integers(0, 3, (32,), dtype=np.int32)
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    opt = optim.sgd(1e-2)
    mesh = _pp_mesh(2, 2)
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    ts = shard_pp_train_state(create_train_state(model, opt, jax.random.key(2)),
                              mesh, model)
    step = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                              donate=False, dataset=ds, batch_size=8,
                              sample_mode="epoch")
    for _ in range(4):
        ts, m = step(ts)
    assert np.isfinite(float(m["loss"]))


def test_pp_steps_per_call_matches_single_calls():
    """steps_per_call=2 chains two pipelined device steps in one program;
    the chained state equals two single-step calls exactly."""
    rng = np.random.default_rng(43)
    imgs = rng.integers(0, 256, (24, 32, 32, 3), dtype=np.uint8)
    lbls = rng.integers(0, 3, (24,), dtype=np.int32)
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False)
    opt = optim.sgd(1e-2)
    mesh = _pp_mesh(1, 4)
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    ts0 = shard_pp_train_state(
        create_train_state(model, opt, jax.random.key(3)), mesh, model)

    one = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                             donate=False, dataset=ds, batch_size=8)
    ts_a = ts0
    losses = []
    for _ in range(2):
        ts_a, m = one(ts_a)
        losses.append(float(m["loss"]))

    two = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                             donate=False, dataset=ds, batch_size=8,
                             steps_per_call=2)
    ts_b, mb = two(ts0)
    np.testing.assert_allclose(float(mb["loss"]), np.mean(losses), rtol=1e-7)
    assert int(ts_b.step) == int(ts_a.step)
    # scanned vs separately-dispatched programs may fuse differently: ~1 ULP
    assert _max_dev(ts_a.params, ts_b.params) < 1e-6


def test_pp_grad_accum_matches_plain_pp():
    """K accumulation chunks x M microbatches == one K*M-sized pipeline
    step on a BN-free trunk (the mean gradient is chunk-invariant)."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(4))
    x, y = _data(np.random.default_rng(44), n=16)

    mesh = _pp_mesh(2, 4)
    ts1 = shard_pp_train_state(ts0, mesh, model)
    s1 = make_pp_train_step(model, opt, mesh, n_microbatches=2, donate=False)
    ts1, m1 = s1(ts1, x, y)

    ts2 = shard_pp_train_state(ts0, mesh, model)
    s2 = make_pp_train_step(model, opt, mesh, n_microbatches=2, donate=False,
                            grad_accum=2)
    ts2, m2 = s2(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    assert int(m1["correct"]) == int(m2["correct"])
    assert _max_dev(ts1.params, ts2.params) < 1e-6


def test_pp_mixup_matches_sequential():
    """MixUp under the pipeline: pairs mix on the global batch before the
    schedule, the last stage mixes the CE — equal to the sequential step
    (same rng stream, so the same perm/lam)."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False, remat=False)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(5))
    x, y = _data(np.random.default_rng(45))

    step1 = make_train_step(model, opt, donate=False, mixup=0.4)
    ts1, m1 = step1(ts0, x, y)

    mesh = _pp_mesh(1, 4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False, mixup=0.4)
    tsp, mp = stepp(tsp, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-6)
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-6


def test_pp_cutmix_matches_sequential():
    """CutMix under the pipeline (VERDICT r4 item 4a): the box-paste math
    and its area-exact lam run on the global batch before the schedule,
    the last stage mixes the CE — equal to the sequential step (same rng
    stream, so the same perm/box/lam). Mirrors the mixup equality test."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False, remat=False)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(14))
    x, y = _data(np.random.default_rng(52))

    step1 = make_train_step(model, opt, donate=False, cutmix=1.0)
    ts1, m1 = step1(ts0, x, y)

    mesh = _pp_mesh(1, 4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False, cutmix=1.0)
    tsp, mp = stepp(tsp, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-6)
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-6


def test_pp_cutmix_data_sharded_smoke():
    """CutMix on a DP2 x PP2 mesh (the pairing gather crosses data
    shards): runs and trains finite."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    opt = optim.sgd(1e-2)
    mesh = _pp_mesh(2, 2)
    ts = shard_pp_train_state(create_train_state(model, opt, jax.random.key(6)),
                              mesh, model)
    step = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                              donate=False, cutmix=1.0)
    x, y = _data(np.random.default_rng(46))
    for _ in range(2):
        ts, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))


def test_pp_mixup_grad_accum_matches_sequential():
    """mixup x grad_accum under PP (VERDICT r4 item 4b): per-chunk pairing
    inside the accumulation scan, mirroring accumulate_grads' key
    derivation exactly — so the PP accumulated-mix step equals the
    sequential accumulated-mix step."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False, remat=False)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(15))
    x, y = _data(np.random.default_rng(53))

    step1 = make_train_step(model, opt, donate=False, mixup=0.4,
                            grad_accum=2)
    ts1, m1 = step1(ts0, x, y)

    mesh = _pp_mesh(1, 4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False, mixup=0.4, grad_accum=2)
    tsp, mp = stepp(tsp, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-6)
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-6


def test_pp_distill_matches_sequential():
    """Knowledge distillation under the pipeline: the teacher's eval-mode
    forward runs outside the shard_map (stage-replicable), the KD term is
    added on the last stage — equal to the sequential distilling step."""
    student = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                      remat=False)
    teacher = PipeCNN(num_classes=3, width=16, n_blocks=4, image_size=32)
    t_params, t_state = teacher.init(jax.random.key(7))
    dist = (teacher, t_params, t_state, 3.0, 0.3)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(student, opt, jax.random.key(8))
    x, y = _data(np.random.default_rng(47))

    step1 = make_train_step(student, opt, donate=False, distill=dist)
    ts1, m1 = step1(ts0, x, y)

    mesh = _pp_mesh(1, 4)
    tsp = shard_pp_train_state(ts0, mesh, student)
    stepp = make_pp_train_step(student, opt, mesh, n_microbatches=1,
                               donate=False, distill=dist)
    tsp, mp = stepp(tsp, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-6)
    assert _max_dev(ts1.params, tsp.params) < 1e-6


def test_pp_distill_composes_with_grad_accum():
    """KD + grad accumulation under PP: per-chunk teacher targets sum to
    the full-batch KD loss (per-sample targets, equal chunks)."""
    student = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                      batch_norm=False)
    teacher = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    t_params, t_state = teacher.init(jax.random.key(9))
    dist = (teacher, t_params, t_state, 2.0, 0.5)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(student, opt, jax.random.key(10))
    x, y = _data(np.random.default_rng(48), n=16)

    mesh = _pp_mesh(2, 2)
    ts1 = shard_pp_train_state(ts0, mesh, student)
    s1 = make_pp_train_step(student, opt, mesh, n_microbatches=2,
                            donate=False, distill=dist)
    ts1, m1 = s1(ts1, x, y)

    ts2 = shard_pp_train_state(ts0, mesh, student)
    s2 = make_pp_train_step(student, opt, mesh, n_microbatches=2,
                            donate=False, distill=dist, grad_accum=2)
    ts2, m2 = s2(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    assert _max_dev(ts1.params, ts2.params) < 1e-6


def test_pp_eval_tta_matches_sequential():
    """TTA under the pipelined eval: per-view pipelined forwards +
    probability averaging == the sequential TTA eval step."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(11))
    x, y = _data(np.random.default_rng(49), n=13)  # ragged over data axis

    ref = make_eval_step(model, tta="hflip")(ts.params, ts.state, x, y)

    mesh = _pp_mesh(2, 4)
    tsp = shard_pp_train_state(ts, mesh, model)
    out = make_pp_eval_step(model, mesh, n_microbatches=2, tta="hflip")(
        tsp.params, tsp.state, x, y)

    np.testing.assert_allclose(float(ref["loss"]), float(out["loss"]),
                               rtol=1e-5)
    assert int(ref["correct"]) == int(out["correct"])
    np.testing.assert_array_equal(np.asarray(ref["pred"]),
                                  np.asarray(out["pred"]))


def test_pp_ema_and_freeze_match_sequential():
    """VERDICT r3 item 7: EMA + frozen subtrees under PP. The EmaState
    rides the optimizer state and shard_pp_train_state's path-mirror must
    place its trunk leaves on 'stage'; frozen leaves must not drift; and
    with M=1 the EMA trajectory equals the sequential step's exactly."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False)
    opt = optim.with_ema(optim.with_frozen(
        optim.make_optimizer("momentum", 1e-2, 0.9), ["stem_conv1"]), 0.99)
    ts0 = create_train_state(model, opt, jax.random.key(12))
    x, y = _data(np.random.default_rng(50))

    step1 = make_train_step(model, opt, donate=False)
    ts1 = ts0
    for _ in range(3):
        ts1, _ = step1(ts1, x, y)

    mesh = _pp_mesh(1, 4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    # the path-mirror placement: EMA trunk leaves shard over 'stage'
    ema_w = tsp.opt_state.ema["trunk"]["body"]["b_conv1"]["w"]
    assert "stage" in jax.tree.leaves(
        ema_w.sharding.spec, is_leaf=lambda s: s is not None) or \
        ema_w.sharding.spec[0] == "stage"
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False)
    for _ in range(3):
        tsp, _ = stepp(tsp, x, y)

    assert _max_dev(ts1.params, tsp.params) == 0.0
    assert _max_dev(ts1.opt_state.ema, tsp.opt_state.ema) == 0.0
    # frozen leaves did not drift (momentum/EMA could not move them)
    assert _max_dev(tsp.params["stem_conv1"], ts0.params["stem_conv1"]) == 0.0


def test_pp_device_augment_full_policy_smoke():
    """The FULL reference augmentation policy (flips/crop/Pallas-free
    rotation path on CPU) fused into the pipelined device step."""
    from cnn_tpu.ops.augment import augment_batch

    rng = np.random.default_rng(51)
    imgs = rng.integers(0, 256, (24, 40, 40, 3), dtype=np.uint8)
    lbls = rng.integers(0, 3, (24,), dtype=np.int32)
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    opt = optim.sgd(1e-2)
    mesh = _pp_mesh(2, 2)
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    ts = shard_pp_train_state(create_train_state(model, opt, jax.random.key(13)),
                              mesh, model)
    step = make_pp_train_step(
        model, opt, mesh, n_microbatches=2, donate=False, dataset=ds,
        batch_size=8, augment_fn=lambda k, x: augment_batch(k, x, out_size=32))
    ts, m = step(ts)
    assert np.isfinite(float(m["loss"]))
