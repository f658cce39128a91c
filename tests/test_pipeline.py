"""Pipeline parallelism (GPipe over a 'stage' mesh axis) on the CPU mesh.

The correctness bar: the pipelined schedule is the SAME function as the
single-device scan-over-blocks trunk — with one microbatch it must be
bit-identical (including BatchNorm batch statistics); with several
microbatches it must be exactly equal whenever the math is microbatch-
invariant (BN-free trunk). The reference has no parallelism to compare
against (SURVEY.md §2); the oracle is our own single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cnn_tpu import optim
from cnn_tpu.models import PipeCNN, get_model
from cnn_tpu.nn.module import StackedBlocks
from cnn_tpu.parallel import (create_train_state, make_pp_eval_step,
                              make_pp_train_step, make_train_step,
                              pp_decompose, shard_pp_train_state)


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


def test_stacked_blocks_match_unrolled():
    """scan-over-layers == applying the L blocks one by one."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    _, trunk, _ = pp_decompose(model)
    params, state = trunk.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 8)), jnp.float32)

    y_scan, st_scan = trunk.apply(params, state, x, train=True)

    h = x
    sts = []
    for i in range(trunk.n_blocks):
        p_i = jax.tree.map(lambda a: a[i], params)
        s_i = jax.tree.map(lambda a: a[i], state)
        h, s_new = trunk.block.apply(p_i, s_i, h, train=True)
        sts.append(s_new)
    st_unrolled = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)

    # scan and unrolled convs may pick different reduction orders: ~1e-6 ULPs
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(h),
                               rtol=1e-4, atol=1e-5)
    assert _max_dev(st_scan, st_unrolled) < 1e-5


def test_pp_single_microbatch_bitwise_matches_single_device():
    """M=1 pipeline == unpipelined step exactly, BN included: the schedule
    only changes WHERE each block runs, not what it computes. (remat off:
    checkpointed recomputation reorders float ops by ~1e-8, which would
    break the BITWISE claim without changing the math being compared.)"""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(0))
    x, y = _data(np.random.default_rng(1))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = _stage_mesh(4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)

    assert float(m1["loss"]) == float(mp["loss"])
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) == 0.0
    assert _max_dev(ts1.state, tsp.state) == 0.0


@pytest.mark.parametrize("n_stages,n_mb", [(4, 4), (8, 2)])
def test_pp_microbatched_matches_single_device_bn_free(n_stages, n_mb):
    """With a BN-free trunk every op is per-sample, so the microbatched
    pipeline must equal the full-batch step to numerical precision."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(2))
    x, y = _data(np.random.default_rng(3))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = _stage_mesh(n_stages)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=n_mb,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-6)
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-5


def test_pp_composes_with_data_parallelism():
    """('data', 'stage') mesh: batch shards over 'data', trunk depth over
    'stage'. BN-free so DP2 x PP4 with microbatches equals single-device."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(4))
    x, y = _data(np.random.default_rng(5))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "stage"))
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-6)
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-5


def test_pp_bn_training_converges_and_masks_bubbles():
    """BN trunk with M>1: GPipe per-microbatch statistics (documented).
    The moving stats must be updated only by valid ticks — training on a
    constant batch must keep state finite and loss decreasing."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    opt = optim.make_optimizer("momentum", 5e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(6))
    x, y = _data(np.random.default_rng(7))

    mesh = _stage_mesh(4)
    ts = shard_pp_train_state(ts, mesh, model)
    step = make_pp_train_step(model, opt, mesh, n_microbatches=4,
                              donate=False)
    ts, m0 = step(ts, x, y)
    for _ in range(10):
        ts, m = step(ts, x, y)
    assert float(m["loss"]) < float(m0["loss"])
    for leaf in jax.tree.leaves(ts.state):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_pp_eval_step_matches_single_device():
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(8))
    x, y = _data(np.random.default_rng(9))

    from cnn_tpu.parallel import make_eval_step
    ev1 = make_eval_step(model)
    out1 = ev1(ts.params, ts.state, x, y)

    mesh = _stage_mesh(4)
    tsp = shard_pp_train_state(ts, mesh, model)
    ev2 = make_pp_eval_step(model, mesh, n_microbatches=4)
    out2 = ev2(tsp.params, tsp.state, x, y)

    # eval BN uses moving stats -> microbatching cannot change the math
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out1["pred"]),
                                  np.asarray(out2["pred"]))


def test_pp_decompose_validation():
    from cnn_tpu.models import AlexNet
    with pytest.raises(ValueError):
        pp_decompose(AlexNet(num_classes=3))  # no StackedBlocks trunk


def test_pipecnn_registered_and_bf16():
    model = get_model("pipecnn", num_classes=3, width=8, n_blocks=4,
                      image_size=32)
    assert isinstance(model, PipeCNN)
    assert isinstance(model.net["trunk"], StackedBlocks)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(0))
    mesh = _stage_mesh(4)
    ts = shard_pp_train_state(ts, mesh, model)
    step = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                              compute_dtype=jnp.bfloat16, donate=False)
    x, y = _data(np.random.default_rng(10), n=8)
    ts, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))


def test_flops_counter_handles_nested_layers():
    from cnn_tpu.models import AlexNet
    from cnn_tpu.utils.flops import (forward_flops_per_image,
                                     train_flops_per_image)
    # flat model: matches the hand-derived AlexNet count used in BASELINE.md
    assert train_flops_per_image(AlexNet(num_classes=3)) == 76_144_320.0
    # nested: trunk blocks count n_blocks times, proj convs included
    p4 = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32)
    p8 = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    d = forward_flops_per_image(p8) - forward_flops_per_image(p4)
    blk = 2 * 2.0 * 8 * 8 * 9 * 8 * 8  # two 3x3 convs at 8x8, 8->8 channels
    assert d == 4 * blk


@pytest.mark.parametrize("mode", [True, "conv"])
def test_stacked_blocks_remat_matches_plain(mode):
    """jax.checkpoint on the scanned body changes memory, not math —
    for both full remat and the selective save-conv-outputs policy
    (remat='conv', jax.checkpoint_policies.save_only_these_names)."""
    from cnn_tpu import optim as _optim
    plain = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False)
    remat = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=mode)
    opt = _optim.sgd(1e-2)
    ts_a = create_train_state(plain, opt, jax.random.key(0))
    ts_b = create_train_state(remat, opt, jax.random.key(0))
    x, y = _data(np.random.default_rng(11), n=8)
    sa = make_train_step(plain, opt, donate=False)
    sb = make_train_step(remat, opt, donate=False)
    ts_a, ma = sa(ts_a, x, y)
    ts_b, mb = sb(ts_b, x, y)
    # recomputation may reorder float reductions: equal to ~1e-7, not bitwise
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-6)
    assert _max_dev(ts_a.params, ts_b.params) < 1e-6


def test_bn_free_deep_trunk_stable_at_init():
    """Regression: at width 64 x 8 blocks the reference's N(0,1)/10 init
    compounds a >1 residual gain per block and overflows bf16 within the
    first steps. The zero-init last conv (Fixup-style) makes the trunk the
    identity at init — activations and the first training steps must stay
    finite in bf16."""
    model = PipeCNN(num_classes=3, width=64, n_blocks=8, image_size=64,
                    batch_norm=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(0))
    step = make_train_step(model, opt, compute_dtype=jnp.bfloat16,
                           donate=False)
    x, y = _data(np.random.default_rng(13), n=8, size=64)
    for _ in range(3):
        ts, m = step(ts, x, y)
        assert np.isfinite(float(m["loss"])), "bf16 overflow in BN-free trunk"
    # the zero conv is training (nonzero after updates), not dead
    w2 = ts.params["trunk"]["body"]["b_conv2"]["w"]
    assert float(jnp.max(jnp.abs(w2))) > 0.0


def test_pp_eval_ragged_batch_with_data_axis():
    """Regression (review finding): eval on a ('data','stage') mesh must
    accept batches that don't divide over 'data' — the step zero-pads to
    the shard_map requirement and metrics cover only the real rows."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(12))
    x, y = _data(np.random.default_rng(14), n=7)  # 7 % 2 != 0

    from cnn_tpu.parallel import make_eval_step
    ref = make_eval_step(model)(ts.params, ts.state, x, y)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "stage"))
    tsp = shard_pp_train_state(ts, mesh, model)
    ev = make_pp_eval_step(model, mesh, n_microbatches=2)
    out = ev(tsp.params, tsp.state, x, y)

    np.testing.assert_allclose(float(ref["loss"]), float(out["loss"]),
                               rtol=1e-5)
    assert int(ref["correct"]) == int(out["correct"])
    np.testing.assert_array_equal(np.asarray(ref["pred"]),
                                  np.asarray(out["pred"]))


def test_pp_single_microbatch_bitwise_with_dropout():
    """VERDICT r2 item 6: an rng-consuming (Dropout) trunk pipelines with
    M=1 BITWISE equivalence to the sequential schedule — per-block keys
    come from the same split(fold_in(rng, trunk_idx), L) the scan draws,
    sliced per stage."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False, dropout=0.25)
    assert model.net["trunk"].needs_rng
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(6))
    x, y = _data(np.random.default_rng(6))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)
    ts1, m1b = step1(ts1, x, y)          # second step: rng advances

    mesh = _stage_mesh(4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)
    assert float(m1["loss"]) == float(mp["loss"])
    tsp, mpb = stepp(tsp, x, y)
    assert float(m1b["loss"]) == float(mpb["loss"])
    assert int(m1b["correct"]) == int(mpb["correct"])
    assert _max_dev(ts1.params, tsp.params) == 0.0
    assert _max_dev(ts1.state, tsp.state) == 0.0


def test_pp_microbatched_dropout_bn_free_matches():
    """M>1 with Dropout: every microbatch shares its block's channel mask
    (exactly the sequential per-batch-mask semantics), so a BN-free
    dropout trunk matches the full-batch step to numerical precision."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    batch_norm=False, dropout=0.25)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(7))
    x, y = _data(np.random.default_rng(7))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = _stage_mesh(4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=4,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)
    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-6)
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-5


def test_pp_head_dropout_bitwise():
    """Dropout AFTER the trunk (head layers): the pipeline's rng_offset
    makes head layers fold the same full-net indices Sequential folds, so
    M=1 stays bitwise."""
    from cnn_tpu.nn import Dropout, Sequential as Seq
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False)
    layers = list(model.net.layers)
    layers.insert(len(layers) - 1, Dropout("head_dropout", p=0.25))
    model.net = Seq(layers)

    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(8))
    x, y = _data(np.random.default_rng(8))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = _stage_mesh(4)
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)
    assert float(m1["loss"]) == float(mp["loss"])
    assert _max_dev(ts1.params, tsp.params) == 0.0


def test_dp_pp_tp_three_axis_mesh_matches_single_device():
    """The missing composition (VERDICT r2 item 5): DP2 x PP2 x TP2 on a
    3-axis ('data','stage','model') mesh. The trunk's conv pair runs
    Megatron-style (column conv shards out-channels, row conv shards
    in-channels with an explicit partial-sum psum whose backward is the
    identity) — and the whole thing must match the single-device step
    numerically. BN-free like the DP2xPP4 test: under DP the pipeline's
    shard_map computes per-data-shard batch stats (GPipe semantics),
    which is a documented BN difference, not a TP one — the TP+BN forward
    itself is exact (see test_tp_block_forward_exact)."""
    from jax.sharding import Mesh
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False, batch_norm=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(9))
    x, y = _data(np.random.default_rng(9))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "stage", "model"))
    tsp = shard_pp_train_state(ts0, mesh, model)
    # verify the TP placements actually shard channels over 'model'
    w_col = tsp.params["trunk"]["body"]["b_conv1"]["w"]
    assert w_col.sharding.spec == (("stage",) + (None,) * 3 + ("model",))
    # M=1: BN batch stats equal the full-batch stats, so the only float
    # difference left is the row conv's psum reassociation (~1e-6)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    assert int(m1["correct"]) == int(mp["correct"])
    assert _max_dev(ts1.params, tsp.params) < 1e-5

    # eval composes on the same 3-axis mesh
    from cnn_tpu.parallel import make_pp_eval_step
    from cnn_tpu.parallel.train_step import make_eval_step
    ev1 = make_eval_step(model)(ts1.params, ts1.state, x, y)
    evp = make_pp_eval_step(model, mesh)(tsp.params, tsp.state, x, y)
    np.testing.assert_allclose(float(ev1["loss"]), float(evp["loss"]),
                               rtol=1e-5)
    assert int(ev1["correct"]) == int(evp["correct"])

    # a SECOND train step: after step 1 the (zero-initialized) row convs
    # are non-zero, so the column conv's input cotangent — the Megatron
    # 'f' psum path — is live; a missing backward all-reduce diverges here
    ts2, m2 = step1(ts1, x, y)
    tsp, mp2 = stepp(tsp, x, y)
    np.testing.assert_allclose(float(m2["loss"]), float(mp2["loss"]),
                               rtol=1e-5)
    assert _max_dev(ts2.params, tsp.params) < 1e-5


def test_pp_tp_bn_first_step_matches_single_device():
    """PP2 x TP2 with BatchNorm and a single data shard: one train step
    must match the single-device step to float precision. BN gives the
    first convs non-zero downstream weights immediately, so this exercises
    the column conv's input-cotangent psum (Megatron 'f') at step 1 —
    the regression that zero-init BN-free single-step tests masked."""
    from jax.sharding import Mesh
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False, batch_norm=True)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(11))
    x, y = _data(np.random.default_rng(11))

    step1 = make_train_step(model, opt, donate=False)
    ts1, m1 = step1(ts0, x, y)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 2, 2),
                ("data", "stage", "model"))
    tsp = shard_pp_train_state(ts0, mesh, model)
    stepp = make_pp_train_step(model, opt, mesh, n_microbatches=1,
                               donate=False)
    tsp, mp = stepp(tsp, x, y)
    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                               rtol=1e-5)
    assert _max_dev(ts1.params, tsp.params) < 1e-5
    assert _max_dev(ts1.state, tsp.state) < 1e-5


def test_tp_block_forward_exact():
    """The TP'd residual block (column/row conv pair, BN on sharded
    channels) reproduces the sequential block's forward AND its BN state
    updates to float precision — BN per-channel stats are untouched by
    channel sharding."""
    from jax.sharding import Mesh, PartitionSpec as P
    from cnn_tpu.models.pipecnn import _trunk_block
    from cnn_tpu.parallel.pipeline import _tp_body_apply

    block = _trunk_block(8, True)
    params, state = block.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16, 16, 8)),
                    jnp.float32)
    y_ref, st_ref = block.apply(params, state, x, train=True)

    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    specs_p = {"b_conv1": {"w": P(None, None, None, "model"),
                           "b": P("model")},
               "b_bn1": {"gamma": P("model"), "beta": P("model")},
               "b_conv2": {"w": P(None, None, "model", None), "b": P()},
               "b_bn2": {"gamma": P(), "beta": P()}}
    specs_s = {"b_bn1": {"mean": P("model"), "var": P("model")},
               "b_bn2": {"mean": P(), "var": P()}}

    def dev(pbody, sbody, xx):
        return _tp_body_apply(block, pbody, sbody, xx, train=True, rng=None,
                              compute_dtype=None, tp_axis="model")

    f = jax.shard_map(dev, mesh=mesh, in_specs=(specs_p, specs_s, P()),
                      out_specs=(P(), specs_s), check_vma=False)
    y_tp, st_tp = f(params["body"], state["body"], x)
    assert float(jnp.abs(y_tp - y_ref).max()) < 1e-5
    assert _max_dev(st_tp, st_ref["body"]) < 1e-6
