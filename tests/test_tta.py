"""Test-time augmentation in the eval step (make_eval_step(tta=...)).

Superset: the reference evaluates the raw image only
(/root/reference/cpu/src/cnn.cpp:100-110); TTA averages class
probabilities over the flip set its own augment policy uses
(pipeline.cpp:36-44).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.models import get_model
from cnn_tpu.parallel import create_train_state, make_eval_step


def _setup(num_classes=3, image_size=64):
    model = get_model("alexnet", num_classes=num_classes, image_size=image_size)
    opt = optim.make_optimizer("sgd", 1e-3)
    ts = create_train_state(model, opt, jax.random.key(0))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 255, (4, image_size, image_size, 3),
                                    np.uint8))
    labels = jnp.asarray(rng.integers(0, num_classes, (4,), np.int32))
    return model, ts, imgs, labels


def test_tta_matches_manual_probability_average():
    model, ts, imgs, labels = _setup()
    base = make_eval_step(model)
    tta = make_eval_step(model, tta="hflip")
    m_id = base(ts.params, ts.state, imgs, labels)
    m_fl = base(ts.params, ts.state, jnp.flip(imgs, axis=2), labels)
    m_tta = tta(ts.params, ts.state, imgs, labels)
    # recover per-view probs through the model directly
    from cnn_tpu.parallel import make_forward
    fwd = make_forward(model)
    p = (np.asarray(fwd(ts.params, ts.state, imgs))
         + np.asarray(fwd(ts.params, ts.state, jnp.flip(imgs, axis=2)))) / 2.0
    want_pred = p.argmax(-1)
    assert np.array_equal(np.asarray(m_tta["pred"]), want_pred)
    want_loss = float(np.mean(-np.log(p[np.arange(4), np.asarray(labels)])))
    np.testing.assert_allclose(float(m_tta["loss"]), want_loss, rtol=1e-5)
    # sanity: the two single-view losses exist and differ from the ensemble
    assert float(m_id["loss"]) != float(m_tta["loss"]) or \
        float(m_fl["loss"]) != float(m_tta["loss"])


def test_tta_flips_runs_and_counts_correct():
    model, ts, imgs, labels = _setup()
    tta = make_eval_step(model, tta="flips")
    m = tta(ts.params, ts.state, imgs, labels)
    assert 0 <= int(m["correct"]) <= 4
    assert m["pred"].shape == (4,)
    assert np.isfinite(float(m["loss"]))


def test_tta_off_is_the_plain_step():
    model, ts, imgs, labels = _setup()
    a = make_eval_step(model)
    b = make_eval_step(model, tta="")
    ma = a(ts.params, ts.state, imgs, labels)
    mb = b(ts.params, ts.state, imgs, labels)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    assert np.array_equal(np.asarray(ma["pred"]), np.asarray(mb["pred"]))
