"""BatchNorm compat: legacy checkpoint import + broken-eval reproduction.

Two reference artifacts/behaviors round 1 left unproven:

1. The six committed ``checkpoints/AlexNet_bn/*.model`` files were written
   by an OLDER save format carrying only gamma/beta (446,988 B = current
   format minus 1,920 B of moving stats); the reference's own current
   loader (``batchnorm2d.cpp:176-182``) can no longer read them. Our
   importer auto-detects the size and loads them.

2. The reference acknowledges its BN eval mode is broken (``README.md:15``
   "验证时性能很差"; committed run: train 0.988 / valid 0.770). We MEASURED
   the mechanism instead of guessing: ``tools/reference_oracle/bn_gap.cpp``
   trains the unmodified reference (bs=4, 400 iters, fixed 72 real images)
   and scores the SAME images both ways — train-mode (batch statistics)
   1.000 vs eval-mode (moving statistics) 0.833. Since the momentum-0.1 EMA
   is long converged by iter 400, the zero ``moving_var`` init
   (``batchnorm2d.cpp:20``) is NOT the cause; the gap is the bs=4
   batch-statistics mismatch (features co-adapt to 4-sample normalization
   that population statistics don't provide). Our framework reproduces the
   gap direction under the identical protocol (test below) — and makes it
   irrelevant in practice by training BN at bs=256 on-device, where batch
   and population statistics agree (flagship runs: valid 0.94 > 0.913).

   ``compat_zero_var_init`` remains what it is: bit-faithful INIT parity
   with ``batchnorm2d.cpp:20`` (affects only the first ~dozens of steps,
   before the EMA converges), not the cause of the reference's eval gap.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu import optim
from cnn_tpu.models import AlexNet
from cnn_tpu.parallel import create_train_state, make_eval_step, make_train_step
from cnn_tpu.utils.checkpoint import import_reference_model, reference_param_count

LEGACY_DIR = "/root/reference/cpu/checkpoints/AlexNet_bn"


@pytest.mark.skipif(not os.path.isdir(LEGACY_DIR),
                    reason="reference legacy BN checkpoints unavailable")
def test_legacy_two_vector_bn_models_import():
    files = sorted(glob.glob(os.path.join(LEGACY_DIR, "*.model")))
    assert files, "expected committed AlexNet_bn checkpoints"
    model = AlexNet(num_classes=3, batch_norm=True)
    legacy_floats = reference_param_count(model.net, bn_vectors=2)
    for path in files:
        assert os.path.getsize(path) == legacy_floats * 4  # 446,988 B
        params, state = import_reference_model(path, model.net)
        # gamma/beta came from the file; moving stats default to identity
        assert params["bn_layer_1"]["gamma"].shape == (16,)
        np.testing.assert_array_equal(np.asarray(state["bn_layer_1"]["var"]),
                                      np.ones(16, np.float32))
        # the weights are usable end to end
        logits, _, _ = model.apply(params, state,
                                   jnp.ones((1, 224, 224, 3)) * 0.5)
        assert np.isfinite(np.asarray(logits)).all()


def test_current_format_still_asserts_on_garbage_size(tmp_path):
    model = AlexNet(num_classes=3, batch_norm=True)
    bad = os.path.join(tmp_path, "bad.model")
    np.zeros(12345, "<f4").tofile(bad)
    with pytest.raises(AssertionError):
        import_reference_model(bad, model.net)


DATASET = "/root/reference/datasets/animals"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(DATASET),
                    reason="reference dataset unavailable")
def test_reference_bn_eval_gap_reproduced_same_protocol():
    """The identical protocol bn_gap.cpp ran on the unmodified reference
    (fixed 72 real images, bs=4, plain SGD lr 1e-3, then score the SAME
    images in train mode vs eval mode). The C++ measured 1.000 vs 0.833;
    our framework must reproduce the gap DIRECTION: train-mode accuracy
    clearly above eval-mode accuracy at bs=4 (exact magnitudes differ —
    RNG init parity is impossible, SURVEY.md section 7)."""
    import cv2

    imgs, labels = [], []
    for c, cat in enumerate(["dog", "panda", "bird"]):
        kept = 0
        for f in sorted(glob.glob(os.path.join(DATASET, cat, "*"))):
            if kept >= 24:
                break
            im = cv2.imread(f)
            if im is None:
                continue
            imgs.append(cv2.resize(im, (224, 224)))
            labels.append(c)
            kept += 1
    x = jnp.asarray(np.stack(imgs).astype(np.float32) / 255.0)
    y = jnp.asarray(np.asarray(labels, np.int32))
    n, bs, steps = len(labels), 4, 400

    model = AlexNet(num_classes=3, batch_norm=True)
    opt = optim.sgd(1e-3)
    ts = create_train_state(model, opt, jax.random.key(0))
    step = make_train_step(model, opt, donate=False)
    for it in range(steps):
        idx = np.arange(it * bs, (it + 1) * bs) % n
        ts, _ = step(ts, x[idx], y[idx])

    ev = make_eval_step(model)
    eval_acc = int(ev(ts.params, ts.state, x, y)["correct"]) / n
    correct_t = 0
    for s0 in range(0, n - bs + 1, bs):
        logits, _, _ = model.apply(ts.params, ts.state, x[s0:s0 + bs],
                                   train=True)
        correct_t += int((jnp.argmax(logits, -1) == y[s0:s0 + bs]).sum())
    train_acc = correct_t / n
    # measured here: 1.000 vs 0.917 (C++ reference: 1.000 vs 0.833)
    assert train_acc >= 0.95
    assert train_acc - eval_acc >= 0.04, (train_acc, eval_acc)


def test_compat_zero_var_init_is_init_parity_only():
    """compat_zero_var_init reproduces batchnorm2d.cpp:20's zero init
    bit-for-bit; after the EMA converges it has no effect (the measured
    eval gap above is a batch-size phenomenon, not an init one)."""
    from cnn_tpu.ops.batchnorm import batch_norm2d, batch_norm2d_init
    p_c, s_c = batch_norm2d_init(8, compat_zero_var_init=True)
    p_f, s_f = batch_norm2d_init(8)
    np.testing.assert_array_equal(np.asarray(s_c["var"]), np.zeros(8))
    np.testing.assert_array_equal(np.asarray(s_f["var"]), np.ones(8))
    # both EMAs converge to the same statistics
    x = jnp.asarray(np.random.default_rng(0).random((16, 6, 6, 8), np.float32))
    for _ in range(120):
        _, s_c = batch_norm2d(p_c, s_c, x, train=True)
        _, s_f = batch_norm2d(p_f, s_f, x, train=True)
    np.testing.assert_allclose(np.asarray(s_c["var"]), np.asarray(s_f["var"]),
                               rtol=1e-4)
    y_c, _ = batch_norm2d(p_c, s_c, x, train=False)
    y_f, _ = batch_norm2d(p_f, s_f, x, train=False)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_f), rtol=1e-4,
                               atol=1e-6)
