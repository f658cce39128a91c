"""MixUp / CutMix (ops.augment.batch_mix + loss mixing in _loss_fn).

Batch-level label-mixing augmentation — a superset over the reference's
single-image augmentor (pipeline.h:24-38).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.data.device_dataset import DeviceDataset, make_device_train_step
from cnn_tpu.models import get_model
from cnn_tpu.ops.augment import batch_mix
from cnn_tpu.ops.losses import softmax_cross_entropy
from cnn_tpu.parallel import create_train_state, make_train_step
from cnn_tpu.parallel.train_step import _loss_fn


def test_mixup_is_convex_blend(rng):
    x = jnp.asarray(rng.random((8, 16, 16, 3), np.float32))
    mixed, perm, lam = batch_mix(jax.random.PRNGKey(3), x, mixup_alpha=0.4)
    lam_f = float(lam)
    assert 0.0 <= lam_f <= 1.0
    expect = lam_f * x + (1 - lam_f) * x[np.asarray(perm)]
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)
    # perm is a permutation
    assert sorted(np.asarray(perm).tolist()) == list(range(8))


def test_cutmix_pastes_box_and_lam_matches_area(rng):
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    # give the partner images a constant value so the pasted box is visible
    x = x.at[:].set(jnp.arange(4, dtype=jnp.float32)[:, None, None, None])
    mixed, perm, lam = batch_mix(jax.random.PRNGKey(7), x, cutmix_alpha=1.0)
    mixed, perm = np.asarray(mixed), np.asarray(perm)
    for i in range(4):
        own, other = float(i), float(perm[i])
        vals = np.unique(mixed[i])
        assert set(vals.tolist()) <= {own, other}
        frac_other = np.mean(mixed[i] == other) if own != other else 0.0
        if own != other:
            np.testing.assert_allclose(frac_other, 1 - float(lam), atol=1e-6)


def test_loss_mixing_math(rng):
    logits = jnp.asarray(rng.random((8, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (8,), np.int32))
    perm = jnp.asarray(np.random.default_rng(0).permutation(8))
    lam = jnp.float32(0.3)

    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=False)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((8, 64, 64, 3), np.float32))
    loss_mixed, _ = _loss_fn(params, state, model, x, labels, None, False,
                             None, mix=(perm, lam))
    logits_m, _, _ = model.apply(params, state, x, train=False)
    want = (0.3 * softmax_cross_entropy(logits_m.astype(jnp.float32), labels)
            + 0.7 * softmax_cross_entropy(logits_m.astype(jnp.float32),
                                          labels[perm]))
    np.testing.assert_allclose(float(loss_mixed), float(want), rtol=1e-6)


def test_train_step_with_mixup_and_cutmix_runs(rng):
    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=False)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, donate=False, mixup=0.2, cutmix=1.0)
    images = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 3, (8,), np.int32))
    p0 = jax.tree_util.tree_leaves(ts.params)[0].copy()
    for _ in range(2):
        ts, metrics = step(ts, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(p0),
                           np.asarray(jax.tree_util.tree_leaves(ts.params)[0]))


def test_device_step_with_mixup(rng):
    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=False)
    ds = DeviceDataset.from_arrays(
        rng.integers(0, 256, (32, 64, 64, 3), np.uint8),
        rng.integers(0, 3, (32,), np.int32))
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_device_train_step(model, opt, ds, 16, donate=False,
                                  mixup=0.2)
    ts, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))


def test_mix_excludes_grad_accum(rng):
    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=False)
    opt = optim.sgd(1e-2)
    try:
        make_train_step(model, opt, mixup=0.2, grad_accum=2)
        assert False, "expected assert"
    except AssertionError as e:
        assert "grad_accum" in str(e)
