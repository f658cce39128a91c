"""Space-to-depth conv execution (ops/conv.py:conv2d_s2d).

The repack must be EXACT: same multiply-adds as the direct conv, so logits
and gradients match the untransformed model to float-reassociation noise.
This is the experiment VERDICT r2 asked for — the canonical TPU answer to
the reference's lane-starved conv1 (3 input channels, conv2d.cpp:69-92).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_tpu import ops
from cnn_tpu.models import get_model


@pytest.mark.parametrize("h,k,pad", [(224, 3, 0), (55, 3, 0), (64, 3, 1),
                                     (57, 1, 0), (33, 5, 2),
                                     # even kernels: no zero weight-pad ring
                                     # masks the odd-extent bottom/right pad;
                                     # the output slice must drop it
                                     (65, 2, 0), (64, 2, 0), (31, 4, 1)])
def test_conv2d_s2d_exact(rng, h, k, pad):
    cin, cout = 3, 16
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    # raw params, not conv2d_init: the init faithfully asserts the
    # reference's odd-kernel rule (conv2d.cpp:14) but the s2d/direct
    # equivalence must hold for even kernels too (the slice-extent case)
    params = {"w": jnp.asarray(rng.standard_normal((k, k, cin, cout)),
                               jnp.float32) * 0.1,
              "b": jnp.asarray(rng.standard_normal((cout,)),
                               jnp.float32) * 0.1}
    ref = ops.conv2d(params, x, stride=2, padding=pad)
    out = ops.conv2d_s2d(params, x, stride=2, padding=pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_space_to_depth_layout(rng):
    # channel layout contract: out[..., (py*2+px)*C + c] == in[2i+py, 2j+px, c]
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    y = ops.space_to_depth(x, 2)
    assert y.shape == (1, 2, 2, 8)
    for py in range(2):
        for px in range(2):
            for c in range(2):
                np.testing.assert_array_equal(
                    y[0, 1, 0, (py * 2 + px) * 2 + c], x[0, 2 + py, px, c])


def test_s2d_grads_match(rng):
    """Gradients flow back through the linear repack to the ORIGINAL
    [k,k,cin,cout] params — checkpoint layout untouched."""
    x = jnp.asarray(rng.standard_normal((2, 17, 17, 3)), jnp.float32)
    params = ops.conv2d_init(jax.random.key(1), 3, 8, 3)

    def loss(p, fn):
        return jnp.sum(fn(p, x, stride=2) ** 2)

    g_ref = jax.grad(loss)(params, ops.conv2d)
    g_s2d = jax.grad(loss)(params, ops.conv2d_s2d)
    assert g_s2d["w"].shape == params["w"].shape
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4,
                                                         rtol=1e-4),
                 g_ref, g_s2d)


def test_alexnet_s2d_logits_match(rng):
    """Full-model equivalence: same params, same logits either way."""
    model = get_model("alexnet", num_classes=3, batch_norm=True)
    model_s2d = get_model("alexnet", num_classes=3, batch_norm=True,
                          space_to_depth=True)
    # conv1 (cin 3) and conv2 (cin 16) repack; conv3/4 already fill the lanes
    s2d_flags = [l.s2d for l in model_s2d.net.layers
                 if l.name.startswith("conv")]
    assert s2d_flags == [True, True, False, False]
    params, state = model.init(jax.random.key(2))
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)
    ref, _, _ = model.apply(params, state, x, train=False)
    out, _, _ = model_s2d.apply(params, state, x, train=False)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)
