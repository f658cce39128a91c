"""Interleaved (virtual-stage) 1F1B — VERDICT r4 item 8.

Megatron-LM-style: each device owns V non-contiguous trunk chunks (chunk c
of V*S on device c mod S), cutting the pipeline bubble to 2(S-1)/V
chunk-applies. The correctness bar is the same as the classic schedule's
(tests/test_1f1b.py): the schedule changes only WHERE and WHEN each block
runs — for any (M, V) the loss/gradients/BN stats must match GPipe at the
same M to float precision, including dropout trunks (canonical per-block
keys), DP meshes, and the Megatron f/g collectives of a 3-axis TP trunk.
The interleave itself is a per-step GSPMD relayout, so these tests also
pin that the canonical<->strided round trip is exact.
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


@pytest.mark.parametrize("n_stages,V,n_mb", [(2, 2, 2), (2, 4, 4), (4, 2, 4)])
def test_interleaved_matches_gpipe(n_stages, V, n_mb):
    """BN trunk, momentum: interleaved 1F1B == GPipe at the same M (loss,
    post-step params, BN moving stats) across (S, V, M) shapes — including
    V=4 with single-block chunks."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(30))
    x, y = _data(np.random.default_rng(30), n=16)

    mesh = _stage_mesh(n_stages)
    ts_g = shard_pp_train_state(ts0, mesh, model)
    ts_g, m_g = make_pp_train_step(model, opt, mesh, n_microbatches=n_mb,
                                   donate=False, schedule="gpipe")(ts_g, x, y)

    ts_i = shard_pp_train_state(ts0, mesh, model)
    ts_i, m_i = make_pp_train_step(
        model, opt, mesh, n_microbatches=n_mb, donate=False,
        schedule="1f1b", virtual_stages=V)(ts_i, x, y)

    np.testing.assert_allclose(float(m_g["loss"]), float(m_i["loss"]),
                               rtol=1e-6)
    assert int(m_g["correct"]) == int(m_i["correct"])
    assert _max_dev(ts_g.params, ts_i.params) < 1e-6
    assert _max_dev(ts_g.state, ts_i.state) < 1e-6


def test_interleaved_dropout_dp_matches_gpipe():
    """DP2 x PP2, V=2, rng-consuming trunk: each virtual chunk must slice
    the CANONICAL per-block keys at (k*S + s)*chunk, or the interleaved
    masks silently diverge from the sequential/GPipe schedule."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32,
                    remat=False, dropout=0.25)
    opt = optim.sgd(1e-2)
    ts0 = create_train_state(model, opt, jax.random.key(31))
    x, y = _data(np.random.default_rng(31))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "stage"))
    ts_g = shard_pp_train_state(ts0, mesh, model)
    ts_g, m_g = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                   donate=False, schedule="gpipe")(ts_g, x, y)
    ts_i = shard_pp_train_state(ts0, mesh, model)
    ts_i, m_i = make_pp_train_step(
        model, opt, mesh, n_microbatches=2, donate=False, schedule="1f1b",
        virtual_stages=2)(ts_i, x, y)
    np.testing.assert_allclose(float(m_g["loss"]), float(m_i["loss"]),
                               rtol=1e-6)
    assert _max_dev(ts_g.params, ts_i.params) < 1e-6


def test_interleaved_tp_three_axis_matches_gpipe():
    """DP2 x PP2 x TP2 with V=2: the deferred per-chunk vjp differentiates
    the Megatron f/g custom-VJP collectives for STRIDED chunk slices; two
    steps so the zero-init row convs go live."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=4, image_size=32,
                    remat=False, batch_norm=False)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts0 = create_train_state(model, opt, jax.random.key(32))
    x, y = _data(np.random.default_rng(32))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "stage", "model"))
    ts_g = shard_pp_train_state(ts0, mesh, model)
    step_g = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                donate=False, schedule="gpipe")
    ts_i = shard_pp_train_state(ts0, mesh, model)
    step_i = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                                donate=False, schedule="1f1b",
                                virtual_stages=2)
    for _ in range(2):
        ts_g, m_g = step_g(ts_g, x, y)
        ts_i, m_i = step_i(ts_i, x, y)
    np.testing.assert_allclose(float(m_g["loss"]), float(m_i["loss"]),
                               rtol=1e-5)
    assert _max_dev(ts_g.params, ts_i.params) < 1e-5


def test_interleaved_device_dataset_toolbox_trains():
    """V=2 slots into the composed device-resident step (sampler + fused
    augment + the interleaved schedule in one program) and trains finite."""
    from cnn_tpu.data.device_dataset import DeviceDataset
    from cnn_tpu.ops.augment import augment_batch_fast

    rng = np.random.default_rng(33)
    imgs = rng.integers(0, 256, (32, 40, 40, 3), dtype=np.uint8)
    lbls = rng.integers(0, 3, (32,), dtype=np.int32)
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    opt = optim.sgd(1e-2)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "stage"))
    ds = DeviceDataset.from_arrays(imgs, lbls, mesh=mesh)
    ts = shard_pp_train_state(
        create_train_state(model, opt, jax.random.key(33)), mesh, model)
    step = make_pp_train_step(
        model, opt, mesh, n_microbatches=2, donate=False, schedule="1f1b",
        virtual_stages=2, dataset=ds, batch_size=16,
        augment_fn=lambda k, im: augment_batch_fast(k, im, out_size=32))
    for _ in range(3):
        ts, m = step(ts)
    assert np.isfinite(float(m["loss"]))
    assert int(ts.step) == 3


def test_interleaved_validates_shapes():
    """The divisibility contracts fail fast: M % S, blocks % (S*V), and
    V>1 under GPipe are all rejected at build time."""
    model = PipeCNN(num_classes=3, width=8, n_blocks=8, image_size=32)
    opt = optim.sgd(1e-2)
    mesh = _stage_mesh(2)
    with pytest.raises(AssertionError, match="microbatches"):
        make_pp_train_step(model, opt, mesh, n_microbatches=3,
                           schedule="1f1b", virtual_stages=2)
    with pytest.raises(AssertionError, match="virtual"):
        make_pp_train_step(model, opt, mesh, n_microbatches=2,
                           schedule="gpipe", virtual_stages=2)
    with pytest.raises(AssertionError, match="divide"):
        make_pp_train_step(model, opt, mesh, n_microbatches=2,
                           schedule="1f1b", virtual_stages=3)
