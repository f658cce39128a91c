"""MobileNet family + DepthwiseConv2D coverage (r3 advisor finding: the
seventh family landed with zero tests — depthwise correctness, the model's
train path, and the checkpoint branches were verified manually but not
encoded in the suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu import ops, optim
from cnn_tpu.models import get_model
from cnn_tpu.nn import BatchNorm2D, DepthwiseConv2D, Sequential
from cnn_tpu.nn.module import Conv2D, Flatten, Linear, ReLU
from cnn_tpu.parallel import create_train_state, make_train_step
from cnn_tpu.utils.flops import forward_flops_per_image


@pytest.mark.parametrize("mult", [1, 2])
def test_depthwise_equals_masked_dense_conv(mult):
    """Oracle: a depthwise conv IS a dense conv whose filter bank is
    block-diagonal — w_dense[:, :, g, g*mult + m] = w_dw[:, :, 0, g*mult+m],
    zero elsewhere. Exact same math, so the outputs must match."""
    rng = np.random.default_rng(60)
    C, k = 6, 3
    x = jnp.asarray(rng.standard_normal((2, 12, 12, C)), jnp.float32)
    p = ops.depthwise_conv2d_init(jax.random.key(0), C, mult, k)
    w_dense = np.zeros((k, k, C, C * mult), np.float32)
    for g in range(C):
        for m in range(mult):
            w_dense[:, :, g, g * mult + m] = np.asarray(
                p["w"][:, :, 0, g * mult + m])
    dense = ops.conv2d({"w": jnp.asarray(w_dense), "b": p["b"]}, x,
                       stride=1, padding=1)
    dw = ops.depthwise_conv2d(p, x, stride=1, padding=1,
                              channel_multiplier=mult)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_depthwise_channel_mismatch_rejected():
    """r3 advisor: an input with FEWER channels than the bank was built for
    (but still dividing w.shape[3]) must error, not silently run as a
    grouped conv with a different multiplier."""
    p = ops.depthwise_conv2d_init(jax.random.key(1), 8, 1, 3)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)  # 8 % 4 == 0: divides!
    with pytest.raises(AssertionError):
        ops.depthwise_conv2d(p, x, stride=1, padding=1, channel_multiplier=1)
    layer = DepthwiseConv2D("dw", channels=8, channel_multiplier=1)
    with pytest.raises(AssertionError):
        layer.apply(p, None, x, train=False)


def test_mobilenet_forward_shape_and_training():
    model = get_model("mobilenet", num_classes=3, image_size=64, width=0.25)
    opt = optim.make_optimizer("momentum", 5e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(61))
    rng = np.random.default_rng(61)
    x = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 3, (8,), dtype=np.int32))

    logits, _, _ = model.apply(ts.params, ts.state,
                               x.astype(jnp.float32) / 255.0, train=False)
    assert logits.shape == (8, 3)

    step = make_train_step(model, opt, donate=False)
    ts, m0 = step(ts, x, y)
    # the depthwise filters receive gradient (their params moved)
    before = create_train_state(model, opt, jax.random.key(61)).params
    moved = float(jnp.max(jnp.abs(ts.params["dw_1"]["w"]
                                  - before["dw_1"]["w"])))
    assert moved > 0.0
    for _ in range(10):
        ts, m = step(ts, x, y)
    assert float(m["loss"]) < float(m0["loss"])


def test_depthwise_reference_model_roundtrip(tmp_path):
    """.model export -> C++-format bytes -> import is bit-exact for a net
    containing DepthwiseConv2D (the checkpoint branches the advisor
    flagged as untested)."""
    from cnn_tpu.utils.checkpoint import (export_reference_model,
                                          import_reference_model)
    net = Sequential([
        Conv2D("conv_1", in_channels=3, out_channels=8, kernel_size=3,
               stride=2),
        ReLU("relu_1"),
        DepthwiseConv2D("dw_1", channels=8, channel_multiplier=2,
                        kernel_size=3, stride=1, padding=1),
        BatchNorm2D("bn_1", num_channels=16),
        ReLU("relu_2"),
        Flatten("flatten"),
        Linear("linear_1", in_features=16 * 15 * 15, out_features=3),
    ])
    params, state = net.init(jax.random.key(62))
    path = str(tmp_path / "dw.model")
    export_reference_model(path, net, params, state)
    p2, s2 = import_reference_model(path, net)
    for a, b in zip(jax.tree.leaves((params, state)),
                    jax.tree.leaves((p2, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the round-tripped net computes identical logits
    x = jnp.asarray(np.random.default_rng(62).random((2, 32, 32, 3)),
                    jnp.float32)
    y1, _, _ = net.apply(params, state, x, train=False)
    y2, _, _ = net.apply(p2, s2, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_depthwise_flops_counted():
    """r3 advisor: mobilenet MFU must include the depthwise MACs."""
    a = get_model("mobilenet", num_classes=3, image_size=64, width=0.25)
    f = forward_flops_per_image(a)
    # hand count the first depthwise: 32x32 out, 3x3, 8 channels (width .25)
    dw1 = 2.0 * 32 * 32 * 9 * 8
    assert f > 0
    # removing the branch would drop every dw_i term; assert the counter
    # sees at least the first one beyond the dense/pointwise sum
    from cnn_tpu.utils import flops as fl
    dense_only = 0.0
    shape = (64, 64, 3)
    for layer in a.net.layers:
        if isinstance(layer, (Conv2D, Linear)):
            dense_only, _, _, _ = fl._walk([layer], shape, dense_only, 0.0,
                                           False)
        shape = layer.out_shape(shape)
    assert f >= dense_only + dw1
