"""Gradient-level numerical parity vs the reference's hand-written backward.

Fixtures (``tests/fixtures/grad_parity*.npz``) come from
``tools/reference_oracle/grad_dump.cpp``: the UNMODIFIED reference runs ONE
train step (forward -> softmax -> p-y delta -> backward -> SGD,
``cnn.cpp:77-96``) on a fixed 4-image batch and saves its weights before the
update, after ``update_gradients(1.0)`` (so dW == before - after, recovered
through the public save API), and after the real lr=1e-3 step.

This closes the last correctness hole round 1 left open: ``jax.grad`` of the
batch-mean CE loss is *measured* against the reference's hand-derived
gradients of ``conv2d.cpp:97-217``, ``linear.cpp:47-102``,
``batchnorm2d.cpp:100-166``, ``pool2d.cpp:92-109``, ``relu.cpp:30-44``.

One intentional semantic divergence is encoded here: the reference batch-
averages conv/linear weight grads (``conv2d.cpp:130,155``, ``linear.cpp:60``)
but NOT BatchNorm's dgamma/dbeta (``batchnorm2d.cpp:118-120`` accumulate raw
sums), so reference BN grads are exactly batch_size x the mean-loss gradient.
Our framework uses the consistent mean-loss convention everywhere; the tests
assert the exact B-factor relationship.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu.models import AlexNet
from cnn_tpu.ops.losses import softmax_cross_entropy
from cnn_tpu.utils.checkpoint import import_reference_model

HERE = os.path.dirname(__file__)
FIXTURES = {
    False: os.path.join(HERE, "fixtures", "grad_parity.npz"),
    True: os.path.join(HERE, "fixtures", "grad_parity_bn.npz"),
}

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in FIXTURES.values()),
    reason="grad parity fixtures unavailable")


def _import_raw(raw: np.ndarray, model) -> tuple[dict, dict]:
    """Import a raw .model f32 vector through the trusted layout converter."""
    with tempfile.NamedTemporaryFile(suffix=".model") as f:
        np.asarray(raw, "<f4").tofile(f.name)
        return import_reference_model(f.name, model.net)


def _sub(a: dict, b: dict) -> dict:
    return jax.tree_util.tree_map(
        lambda x, y: np.asarray(x, np.float64) - np.asarray(y, np.float64), a, b)


class Case:
    def __init__(self, bn: bool):
        fx = np.load(FIXTURES[bn], allow_pickle=False)
        self.bn = bn
        self.fx = fx
        self.model = AlexNet(num_classes=3, batch_norm=bn,
                             compat_bn=bn)  # zero-var init like the reference
        self.params0, self.state0 = _import_raw(fx["before"], self.model)
        self.batch = fx["images_u8"].shape[0]
        x = jnp.asarray(fx["images_u8"]).astype(jnp.float32) / 255.0
        labels = jnp.asarray(fx["labels"])

        def loss_fn(params):
            logits, new_state, _ = self.model.apply(params, self.state0, x,
                                                    train=True)
            return softmax_cross_entropy(logits, labels), (logits, new_state)

        (self.loss, (self.logits, self.new_state)), self.grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(self.params0))

        pa1, sa1 = _import_raw(fx["after_lr1"], self.model)
        self.ref_grads = _sub(self.params0, pa1)   # dW = before - after@lr1
        self.state_after = sa1
        self.params_sgd, _ = _import_raw(fx["after_sgd"], self.model)


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "bn"])
def case(request):
    return Case(request.param)


def test_forward_logits_and_loss_parity(case):
    np.testing.assert_allclose(np.asarray(case.logits), case.fx["logits"],
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(float(case.loss), float(case.fx["loss"]),
                               atol=1e-5, rtol=1e-5)


def test_gradient_parity_per_tensor(case):
    """jax.grad matches each hand-written layer backward.

    Tolerance is 1e-4 scaled by max(1, ||ref||_inf): the trained headline
    checkpoint has O(1e-2) grads and meets plain atol 1e-4; the BN-init case
    has O(10) grads where 1e-5 *relative* f32 accumulation noise (loop order
    differs between the serial C++ sums and XLA reductions) exceeds a fixed
    1e-4. Measured relative deviation is ~1e-5 on every tensor.
    """
    worst = {}
    for name, ours in case.grads.items():
        ref = case.ref_grads[name]
        scale = case.batch if name.startswith("bn") else 1.0
        for k in ours:
            r = np.asarray(ref[k], np.float64)
            o = scale * np.asarray(ours[k], np.float64)
            if case.bn and name.startswith("conv") and k == "b":
                # a conv bias feeding BatchNorm has an analytically ZERO
                # gradient (the BN VJP's dx sums to zero per channel), so
                # both sides measure only f32 cancellation noise — assert
                # both are noise-small instead of comparing noise to noise
                assert np.abs(r).max() < 5e-4 and np.abs(o).max() < 5e-4
                continue
            dev = np.abs(o - r).max()
            tol = 1e-4 * max(1.0, float(np.abs(r).max()))
            worst[f"{name}.{k}"] = float(dev)
            assert dev <= tol, (name, k, dev, tol)
    print("worst grad deviations:",
          {k: f"{v:.2e}" for k, v in sorted(worst.items(),
                                            key=lambda kv: -kv[1])[:5]})


def test_bn_grads_are_batch_scaled_sums(case):
    """The B-factor relationship is exact, not approximate: reference BN
    dgamma/dbeta are raw sums while conv/linear grads are batch means."""
    if not case.bn:
        pytest.skip("no BN layers in the plain config")
    name = next(n for n in case.grads if n.startswith("bn"))
    ours = np.asarray(case.grads[name]["gamma"], np.float64)
    ref = np.asarray(case.ref_grads[name]["gamma"], np.float64)
    # scaling by B-1 or B+1 must NOT fit: the factor is exactly B
    mag = np.abs(ref).max()
    err_b = np.abs(case.batch * ours - ref).max() / mag
    err_off = min(np.abs((case.batch - 1) * ours - ref).max(),
                  np.abs((case.batch + 1) * ours - ref).max()) / mag
    assert err_b <= 1e-4 < err_off


def test_post_sgd_weights_parity(case):
    """One full train step (grads + SGD at the reference lr=1e-3) lands on
    the reference's post-update weights."""
    lr = 1e-3
    for name, ours in case.grads.items():
        scale = case.batch if name.startswith("bn") else 1.0
        for k in ours:
            stepped = (np.asarray(case.params0[name][k], np.float64)
                       - lr * scale * np.asarray(ours[k], np.float64))
            ref = np.asarray(case.params_sgd[name][k], np.float64)
            dev = np.abs(stepped - ref).max()
            assert dev <= 1e-6, (name, k, dev)


def test_bn_moving_stats_parity(case):
    """Train-mode forward updates moving mean/var exactly like
    batchnorm2d.cpp:78-79 (biased variance, momentum 0.1)."""
    if not case.bn:
        pytest.skip("no BN layers in the plain config")
    for name, ref in case.state_after.items():
        ours = case.new_state[name]
        np.testing.assert_allclose(np.asarray(ours["mean"]),
                                   np.asarray(ref["mean"]), atol=1e-4, rtol=0)
        np.testing.assert_allclose(np.asarray(ours["var"]),
                                   np.asarray(ref["var"]), atol=1e-4, rtol=0)
