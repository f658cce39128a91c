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


def test_mixup_grad_accum_k1_matches_unaccumulated(rng):
    """VERDICT r4 item 4b: mixup rides the accumulation scan. At K=1 the
    chunk IS the batch and the mix key is the step's own mix stream, so
    the scan path computes the SAME mixed batch/loss as the unaccumulated
    path (on an rng-free model — the model key folds the chunk index);
    grads match to float precision (a length-1 scan fuses differently
    than the unrolled program — same bar as test_pp_steps_per_call)."""
    from cnn_tpu.parallel.train_step import (accumulate_grads,
                                             mix_and_teacher_targets)

    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=False)
    params, state = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
                    ).astype(jnp.float32) / 255.0
    y = jnp.asarray(rng.integers(0, 3, (8,), np.int32))
    key = jax.random.PRNGKey(5)

    g1, _, l1, c1 = jax.jit(
        lambda p, s, xx, yy: accumulate_grads(
            model, p, s, xx, yy, key, grad_accum=1, mixup=0.4))(
        params, state, x, y)

    def plain(p, s, xx, yy):
        r, xx, mix, _ = mix_and_teacher_targets(
            key, xx, mixup=0.4, cutmix=0.0, distill=None, t_params=None,
            t_state=None, compute_dtype=None)
        (loss, (st, corr)), g = jax.value_and_grad(_loss_fn, has_aux=True)(
            p, s, model, xx, yy, r, True, None, False, 0.0, mix, None)
        return g, loss, corr
    g2, l2, c2 = jax.jit(plain)(params, state, x, y)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert int(c1) == int(c2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_mixup_grad_accum_k2_matches_per_chunk_oracle(rng):
    """K=2 accumulated mixup equals the hand-built oracle: each chunk
    mixed with batch_mix(fold_in(k_mix, i), chunk), losses/grads averaged
    — pinning both the per-chunk pairing semantics and the exact key
    derivation (split off the step key, fold the chunk index)."""
    from cnn_tpu.parallel.train_step import accumulate_grads

    model = get_model("alexnet", num_classes=3, image_size=64,
                      batch_norm=False)
    params, state = model.init(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
                    ).astype(jnp.float32) / 255.0
    y = jnp.asarray(rng.integers(0, 3, (8,), np.int32))
    key = jax.random.PRNGKey(9)

    g1, _, l1, _ = jax.jit(
        lambda p, s, xx, yy: accumulate_grads(
            model, p, s, xx, yy, key, grad_accum=2, cutmix=1.0))(
        params, state, x, y)

    def oracle(p, s, xx, yy):
        r, k_mix = jax.random.split(key)
        gsum, lsum = None, 0.0
        for i in range(2):
            xi, yi = xx[4 * i:4 * (i + 1)], yy[4 * i:4 * (i + 1)]
            xi, perm, lam = batch_mix(jax.random.fold_in(k_mix, i), xi,
                                      cutmix_alpha=1.0)
            (loss, _), g = jax.value_and_grad(_loss_fn, has_aux=True)(
                p, s, model, xi, yi, jax.random.fold_in(r, i), True, None,
                False, 0.0, (perm, lam), None)
            gsum = g if gsum is None else jax.tree_util.tree_map(
                jnp.add, gsum, g)
            lsum = lsum + loss
        return jax.tree_util.tree_map(lambda a: a / 2, gsum), lsum / 2
    g2, l2 = jax.jit(oracle)(params, state, x, y)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
