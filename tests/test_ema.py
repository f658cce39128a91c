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


def test_ema_tracks_model_state_with_same_recurrence():
    """EMA weights must be evaluated against EMA'd BatchNorm moving stats
    (the raw run's stats track the CURRENT weights' activations — measured
    catastrophic at depth, optim.ema_update_state docstring). mstate must
    follow the exact same eff-decay recurrence as the weights."""
    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=True)
    opt = optim.with_ema(optim.make_optimizer("momentum", 5e-2, 0.9),
                         decay=0.9)
    ts = create_train_state(model, opt, jax.random.key(3))
    # seeded at creation: consistent from step 0 and jit-structure-stable
    assert ts.opt_state.mstate is not None
    m0 = np.asarray(ts.opt_state.mstate["bn_layer_1"]["mean"])
    np.testing.assert_array_equal(m0, np.asarray(ts.state["bn_layer_1"]["mean"]))

    step = make_train_step(model, opt, donate=False)
    r = np.random.default_rng(3)
    x = jnp.asarray(r.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    y = jnp.asarray(r.integers(0, 3, (8,), dtype=np.int32))
    e = m0.astype(np.float64)
    for t in range(1, 5):
        ts, _ = step(ts, x, y)
        d = min(0.9, (1 + t) / (10 + t))
        s_t = np.asarray(ts.state["bn_layer_1"]["mean"], np.float64)
        e = d * e + (1 - d) * s_t
        np.testing.assert_allclose(
            np.asarray(ts.opt_state.mstate["bn_layer_1"]["mean"]), e,
            rtol=1e-5)
    # the EMA'd stats lag the raw stats, exactly like the weights
    assert not np.allclose(np.asarray(ts.opt_state.mstate["bn_layer_1"]["mean"]),
                           np.asarray(ts.state["bn_layer_1"]["mean"]))
    # the accessor serves the pair; non-EMA optimizers fall back
    ms = optim.ema_model_state(ts.opt_state, ts.state)
    assert ms is ts.opt_state.mstate
    assert optim.ema_model_state((), "fb") == "fb"


def test_ema_legacy_checkpoint_without_mstate(tmp_path):
    """A pre-round-4 EmaState (3 fields) unpickles with mstate=None and the
    first ema_update_state initializes it from the incoming state —
    resume of old --ema checkpoints keeps working."""
    legacy = optim.EmaState(inner=(), ema={"w": jnp.asarray(1.0)},
                            count=jnp.asarray(5, jnp.int32))
    assert legacy.mstate is None and legacy.decay is None
    st = {"bn": {"mean": jnp.asarray([0.5, 0.5])}}
    upd = optim.ema_update_state(legacy, st)
    np.testing.assert_array_equal(np.asarray(upd.mstate["bn"]["mean"]),
                                  np.asarray(st["bn"]["mean"]))
    # and the next call averages with the default 0.999 decay (count=5 ->
    # warmup eff = 6/15)
    st2 = {"bn": {"mean": jnp.asarray([1.0, 1.0])}}
    upd2 = optim.ema_update_state(upd, st2)
    eff = min(0.999, 6.0 / 15.0)
    np.testing.assert_allclose(np.asarray(upd2.mstate["bn"]["mean"]),
                               eff * 0.5 + (1 - eff) * 1.0, rtol=1e-6)
    # ema_seed_model_state backfills the missing decay from the live --ema
    # flag (load-time only — filling it inside the jitted step would change
    # the scan carry structure), so the BN-stat EMA horizon matches the
    # weight EMA's instead of falling back to 0.999
    seeded = optim.ema_seed_model_state(legacy, st, decay=0.99)
    assert float(seeded.decay) == np.float32(0.99)
    assert seeded.mstate is not None
    # and never clobbers a decay that is already present
    kept = optim.ema_seed_model_state(seeded, st, decay=0.5)
    assert float(kept.decay) == np.float32(0.99)


def test_ema_eval_pairs_params_with_mstate(tmp_path):
    """infer.load_params(use_ema=True) and the evaluate CLI loader return
    the EMA'd state, not the raw run's."""
    from cnn_tpu.tools.infer import load_params
    from cnn_tpu.utils.checkpoint import save_checkpoint

    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=True)
    opt = optim.with_ema(optim.make_optimizer("momentum", 5e-2, 0.9),
                         decay=0.9)
    ts = create_train_state(model, opt, jax.random.key(4))
    step = make_train_step(model, opt, donate=False)
    r = np.random.default_rng(4)
    x = jnp.asarray(r.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    y = jnp.asarray(r.integers(0, 3, (8,), dtype=np.int32))
    for _ in range(3):
        ts, _ = step(ts, x, y)
    ck = os.path.join(tmp_path, "emabn.ckpt")
    save_checkpoint(ck, ts)
    _, s_ema = load_params(ck, model, use_ema=True)
    np.testing.assert_array_equal(
        np.asarray(s_ema["bn_layer_1"]["mean"]),
        np.asarray(ts.opt_state.mstate["bn_layer_1"]["mean"]))
    _, s_raw = load_params(ck, model)
    np.testing.assert_array_equal(np.asarray(s_raw["bn_layer_1"]["mean"]),
                                  np.asarray(ts.state["bn_layer_1"]["mean"]))


def test_ema_seed_model_state_stabilizes_scan_carry():
    """A legacy EmaState (mstate=None) fed into a steps-per-call step would
    change the lax.scan carry structure mid-scan; ema_seed_model_state at
    load/warm-start time materializes mstate host-side so the structure is
    stable. Also: seeding an already-seeded state is the identity (it must
    never advance the average outside a train step)."""
    from cnn_tpu.data.device_dataset import (DeviceDataset,
                                             make_device_train_step)

    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=True)
    opt = optim.with_ema(optim.make_optimizer("momentum", 5e-2, 0.9),
                         decay=0.9)
    ts = create_train_state(model, opt, jax.random.key(5))
    # already seeded -> identity, not an extra EMA step
    assert optim.ema_seed_model_state(ts.opt_state, ts.state) is ts.opt_state
    # simulate a pre-round-4 checkpoint: no mstate
    legacy = ts._replace(opt_state=ts.opt_state._replace(mstate=None,
                                                         decay=None))
    seeded = legacy._replace(opt_state=optim.ema_seed_model_state(
        legacy.opt_state, legacy.state))
    assert seeded.opt_state.mstate is not None

    r = np.random.default_rng(5)
    ds = DeviceDataset.from_arrays(
        r.integers(0, 256, (32, 64, 64, 3), dtype=np.uint8),
        r.integers(0, 3, (32,), dtype=np.int32))
    step = make_device_train_step(model, opt, ds, 8, donate=False,
                                  steps_per_call=2)
    new_ts, m = step(seeded)
    assert np.isfinite(float(m["loss"]))
    assert int(new_ts.step) == 2


def test_warm_start_seeds_ema_model_state(tmp_path):
    """warm_start re-inits the optimizer state; with an EMA optimizer the
    EMA'd model state must be seeded there too (same scan-carry reason)."""
    from cnn_tpu.utils.checkpoint import save_checkpoint, warm_start

    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=True)
    opt = optim.with_ema(optim.make_optimizer("momentum", 5e-2, 0.9),
                         decay=0.9)
    ts = create_train_state(model, opt, jax.random.key(6))
    ck = os.path.join(tmp_path, "src.ckpt")
    save_checkpoint(ck, ts)
    fresh = create_train_state(model, opt, jax.random.key(7))
    warmed, copied, _ = warm_start(fresh, ck, opt)
    assert copied
    assert warmed.opt_state.mstate is not None


def test_convert_cli_exports_ema_pair(tmp_path):
    """convert --use-ema writes the EMA weights + EMA'd BN stats to the
    reference .model format (what a reference user deploying an --ema run
    on the C++ loader needs)."""
    from cnn_tpu.tools import convert
    from cnn_tpu.utils.checkpoint import import_reference_model, save_checkpoint

    model = get_model("alexnet", num_classes=3, batch_norm=True)
    opt = optim.with_ema(optim.make_optimizer("momentum", 5e-2, 0.9),
                         decay=0.9)
    ts = create_train_state(model, opt, jax.random.key(8))
    step = make_train_step(model, opt, donate=False)
    r = np.random.default_rng(8)
    x = jnp.asarray(r.integers(0, 256, (4, 224, 224, 3), dtype=np.uint8))
    y = jnp.asarray(r.integers(0, 3, (4,), dtype=np.int32))
    for _ in range(2):
        ts, _ = step(ts, x, y)
    ck = os.path.join(tmp_path, "e.ckpt")
    out = os.path.join(tmp_path, "e.model")
    save_checkpoint(ck, ts)
    assert convert.main([ck, out, "--batch-norm", "true", "--use-ema"]) == 0
    p2, s2 = import_reference_model(out, model.net)
    ema = optim.ema_params(ts.opt_state)
    np.testing.assert_allclose(
        np.asarray(p2["conv_layer_1"]["w"]),
        np.asarray(ema["conv_layer_1"]["w"]).astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2["bn_layer_1"]["mean"]),
        np.asarray(ts.opt_state.mstate["bn_layer_1"]["mean"]), rtol=1e-6)


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
