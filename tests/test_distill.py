"""Knowledge distillation (ops.losses.distillation_loss + the distill
hook in make_train_step / make_device_train_step).

Superset: the reference trains on hard labels only
(/root/reference/cpu/src/func.cpp:40-53); KD is the standard production
compression recipe (big teacher -> small serving student).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.models import get_model
from cnn_tpu.ops.losses import distillation_loss, softmax_cross_entropy
from cnn_tpu.parallel import create_train_state, make_train_step


def test_distillation_loss_math():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    T = 3.0
    got = float(distillation_loss(s, t, T))
    p_t = jax.nn.softmax(t / T, axis=-1)
    want = float(T * T * jnp.mean(jnp.sum(
        p_t * (jnp.log(p_t) - jax.nn.log_softmax(s / T, axis=-1)), axis=-1)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # KL(p||p) = 0: a student matching the teacher pays nothing
    assert abs(float(distillation_loss(t, t, T))) < 1e-5


def test_distillation_grad_ignores_teacher():
    s = jnp.ones((2, 3))
    t = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 5.0]])
    g_t = jax.grad(lambda tt: distillation_loss(s, tt, 2.0))(t)
    assert float(jnp.abs(g_t).max()) == 0.0  # stop_gradient on the teacher
    g_s = jax.grad(lambda ss: distillation_loss(ss, t, 2.0))(s)
    assert float(jnp.abs(g_s).max()) > 0.0


def _teacher_and_data(num_classes=3, image_size=64):
    teacher = get_model("resnet10", num_classes=num_classes,
                        image_size=image_size)
    t_opt = optim.make_optimizer("sgd", 1e-3)
    t_ts = create_train_state(teacher, t_opt, jax.random.key(5))
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 255, (8, image_size, image_size, 3),
                                    np.uint8))
    labels = jnp.asarray(rng.integers(0, num_classes, (8,), np.int32))
    return teacher, t_ts, imgs, labels


def test_train_step_with_distillation_trains():
    teacher, t_ts, imgs, labels = _teacher_and_data()
    student = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.make_optimizer("momentum", 1e-2, momentum=0.9)
    ts = create_train_state(student, opt, jax.random.key(1))
    step = make_train_step(
        student, opt, donate=False,
        distill=(teacher, t_ts.params, t_ts.state, 2.0, 0.5))
    losses = []
    for _ in range(5):
        ts, m = step(ts, imgs, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_distill_alpha_one_matches_plain_ce_loss():
    """alpha=1 keeps only the CE term -> metrics equal the plain step's."""
    teacher, t_ts, imgs, labels = _teacher_and_data()
    student = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-3)
    ts0 = create_train_state(student, opt, jax.random.key(1))
    plain = make_train_step(student, opt, donate=False)
    dist = make_train_step(
        student, opt, donate=False,
        distill=(teacher, t_ts.params, t_ts.state, 2.0, 1.0))
    _, m_plain = plain(ts0, imgs, labels)
    _, m_dist = dist(ts0, imgs, labels)
    np.testing.assert_allclose(float(m_plain["loss"]), float(m_dist["loss"]),
                               rtol=1e-6)


def test_device_dataset_distillation(tmp_path):
    """The device-resident path composes with distillation + steps_per_call."""
    import cv2
    from cnn_tpu.data.device_dataset import (DeviceDataset,
                                             make_device_train_step)
    rng = np.random.default_rng(3)
    samples = []
    for i in range(12):
        p = str(tmp_path / f"s{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (64, 64, 3), np.uint8))
        samples.append((p, i % 3))
    ds = DeviceDataset(samples, 64, 2)
    teacher, t_ts, _, _ = _teacher_and_data()
    student = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-2)
    ts = create_train_state(student, opt, jax.random.key(4))
    run = make_device_train_step(
        student, opt, ds, 8, donate=False, steps_per_call=2,
        distill=(teacher, t_ts.params, t_ts.state, 2.0, 0.5))
    ts, m = run(ts)
    assert int(ts.step) == 2
    assert np.isfinite(float(m["loss"]))


def test_distill_grad_accum_matches_full_batch():
    """KD composes with gradient accumulation: teacher softmax targets are
    per-sample and microbatches are equal-sized, so K=2 accumulation must
    reproduce the full-batch distilled step exactly (BN-free student —
    BN batch statistics are the one intentional microbatch difference)."""
    teacher, t_ts, imgs, labels = _teacher_and_data()
    student = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-2)
    ts0 = create_train_state(student, opt, jax.random.key(7))
    dist = (teacher, t_ts.params, t_ts.state, 3.0, 0.25)
    full = make_train_step(student, opt, donate=False, distill=dist)
    accum = make_train_step(student, opt, donate=False, distill=dist,
                            grad_accum=2)
    ts_f, m_f = full(ts0, imgs, labels)
    ts_a, m_a = accum(ts0, imgs, labels)
    np.testing.assert_allclose(float(m_f["loss"]), float(m_a["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts_f.params), jax.tree.leaves(ts_a.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_distill_dp_mesh_matches_single_device():
    """KD composes with the DP mesh: same inputs, same loss as unsharded."""
    from cnn_tpu.parallel import make_mesh, shard_train_state
    teacher, t_ts, imgs, labels = _teacher_and_data()
    student = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-2)
    ts = create_train_state(student, opt, jax.random.key(9))
    dist = (teacher, t_ts.params, t_ts.state, 2.0, 0.5)
    step1 = make_train_step(student, opt, donate=False, distill=dist)
    _, m1 = step1(ts, imgs, labels)
    mesh = make_mesh()
    ts_sh = shard_train_state(ts, mesh, student)
    step8 = make_train_step(student, opt, mesh=mesh, donate=False,
                            distill=dist)
    _, m8 = step8(ts_sh, imgs, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-5)
    assert int(m1["correct"]) == int(m8["correct"])


def test_ensemble_distill_list_of_one_matches_scalar_form():
    teacher, t_ts, imgs, labels = _teacher_and_data()
    student = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-3)
    ts = create_train_state(student, opt, jax.random.key(2))
    s1 = make_train_step(student, opt, donate=False,
                         distill=(teacher, t_ts.params, t_ts.state, 2.0, 0.5))
    s2 = make_train_step(student, opt, donate=False,
                         distill=([teacher], [t_ts.params], [t_ts.state],
                                  2.0, 0.5))
    _, m1 = s1(ts, imgs, labels)
    _, m2 = s2(ts, imgs, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_ensemble_distill_two_teachers_mixture_math():
    """The KD target is the MEAN of the teachers' tempered softmaxes."""
    from cnn_tpu.ops.losses import distillation_loss_from_probs
    from cnn_tpu.parallel import make_forward
    t1, ts1, imgs, labels = _teacher_and_data()
    t2 = get_model("vgg8", num_classes=3, image_size=64)
    ts2 = create_train_state(t2, optim.make_optimizer("sgd", 1e-3),
                             jax.random.key(8))
    student = get_model("alexnet", num_classes=3, image_size=64)
    opt = optim.make_optimizer("sgd", 1e-3)
    ts = create_train_state(student, opt, jax.random.key(3))
    T, alpha = 3.0, 0.25
    step = make_train_step(
        student, opt, donate=False,
        distill=([t1, t2], [ts1.params, ts2.params],
                 [ts1.state, ts2.state], T, alpha))
    _, m = step(ts, imgs, labels)
    # manual: student logits on normalized images, mixture target
    from cnn_tpu.ops.preprocess import uint8_to_float
    x = uint8_to_float(imgs, jnp.float32)
    s_logits, _, _ = student.apply(ts.params, ts.state, x, train=True,
                                   rng=jax.random.fold_in(ts.rng, 0))
    # the step folds rng differently; compare only the teacher mixture part
    # by recomputing the full loss with the same student logits obtained
    # through a zero-step eval forward instead
    fwd_logits = lambda mdl, p, s: mdl.apply(p, s, x, train=False)[0]
    p_mix = (jax.nn.softmax(fwd_logits(t1, ts1.params, ts1.state) / T)
             + jax.nn.softmax(fwd_logits(t2, ts2.params, ts2.state) / T)) / 2
    kd = distillation_loss_from_probs(fwd_logits(student, ts.params, ts.state),
                                      p_mix, T)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(kd))
    # and the loss-from-probs helper is exact against its definition
    lp = jnp.log(p_mix)
    s_T = jax.nn.log_softmax(
        fwd_logits(student, ts.params, ts.state).astype(jnp.float32) / T)
    want = float(T * T * jnp.mean(jnp.sum(p_mix * (lp - s_T), axis=-1)))
    np.testing.assert_allclose(float(kd), want, rtol=1e-5)


def test_tree_has_bn_detects_teacher_bn():
    """The train CLI auto-detects a teacher's BN-ness from its checkpoint
    param tree (utils.checkpoint.tree_has_bn) instead of assuming the student
    config's batch_norm — a BN-free teacher must construct a BN-free model."""
    from cnn_tpu.utils.checkpoint import tree_has_bn

    for bn in (False, True):
        mdl = get_model("alexnet", num_classes=3, image_size=64,
                        batch_norm=bn)
        ts = create_train_state(mdl, optim.make_optimizer("sgd", 1e-3),
                                jax.random.key(0))
        assert tree_has_bn(ts.params) is bn
    # structural detection: BN = a {gamma, beta} subtree, whatever the
    # layer is named; a 'bn'-ish NAME alone must not trigger it
    assert tree_has_bn({"stem": {"norm": {"gamma": 1, "beta": 0}}})
    assert not tree_has_bn({"bn_1": {"w": 0, "b": 0}})
    assert not tree_has_bn({"conv_1": {"w": 0, "b": 0}})
