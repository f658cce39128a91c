"""Unit tests for ops vs. NumPy oracles implementing the reference semantics.

Each oracle is an independent re-derivation of the documented behavior in
SURVEY.md §2 (conv2d.cpp / pool2d.cpp / relu.cpp / linear.cpp /
batchnorm2d.cpp / dropout.cpp / func.cpp) — the tests the reference never had.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import ops


# ------------------------------------------------------------- oracles ------

def np_conv2d_valid(x_nhwc, w_hwio, b, stride):
    """Direct NHWC VALID conv, scalar-loop oracle."""
    B, H, W, Cin = x_nhwc.shape
    kh, kw, _, Cout = w_hwio.shape
    Ho = (H - kh) // stride + 1
    Wo = (W - kw) // stride + 1
    out = np.zeros((B, Ho, Wo, Cout), np.float32)
    for bidx in range(B):
        for i in range(Ho):
            for j in range(Wo):
                patch = x_nhwc[bidx, i * stride:i * stride + kh,
                               j * stride:j * stride + kw, :]
                out[bidx, i, j, :] = np.tensordot(patch, w_hwio, axes=3) + b
    return out


def np_maxpool(x, k, s):
    B, H, W, C = x.shape
    Ho = (H - k) // s + 1
    Wo = (W - k) // s + 1
    out = np.zeros((B, Ho, Wo, C), x.dtype)
    for i in range(Ho):
        for j in range(Wo):
            out[:, i, j, :] = x[:, i * s:i * s + k, j * s:j * s + k, :].max(axis=(1, 2))
    return out


def np_maxpool_bwd_first_max(x, g, k, s):
    """Reference backward: route each window's grad to the FIRST max in
    row-major window scan order (pool2d.cpp:69-75 strict '<' compare)."""
    B, H, W, C = x.shape
    Ho = (H - k) // s + 1
    Wo = (W - k) // s + 1
    dx = np.zeros_like(x)
    for bi in range(B):
        for c in range(C):
            for i in range(Ho):
                for j in range(Wo):
                    win = x[bi, i * s:i * s + k, j * s:j * s + k, c]
                    flat = win.reshape(-1)
                    idx = int(np.argmax(flat))  # first max wins
                    di, dj = divmod(idx, k)
                    dx[bi, i * s + di, j * s + dj, c] += g[bi, i, j, c]
    return dx


# --------------------------------------------------------------- tests ------

def test_conv2d_matches_direct_oracle(rng):
    x = rng.standard_normal((2, 17, 17, 3), dtype=np.float32)
    key = jax.random.key(0)
    params = ops.conv2d_init(key, 3, 8, 3)
    out = ops.conv2d(params, jnp.asarray(x), stride=2)
    ref = np_conv2d_valid(x, np.asarray(params["w"]), np.asarray(params["b"]), 2)
    assert out.shape == ref.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_conv_out_size_matches_reference_chain():
    # 224 -> 111 -> 55(pool) -> 27 -> 13 -> 6 (alexnet.cpp:11-32)
    s = 224
    s = ops.conv_out_size(s, 3, 2); assert s == 111
    s = ops.conv_out_size(s, 2, 2); assert s == 55
    s = ops.conv_out_size(s, 3, 2); assert s == 27
    s = ops.conv_out_size(s, 3, 2); assert s == 13
    s = ops.conv_out_size(s, 3, 2); assert s == 6


def test_conv2d_grads_match_numerical(rng):
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 2), dtype=np.float32))
    params = ops.conv2d_init(jax.random.key(1), 2, 4, 3)
    cot = jnp.asarray(rng.standard_normal((2, 4, 4, 4), dtype=np.float32))

    def f(p, xx):
        return jnp.sum(ops.conv2d(p, xx, stride=2) * cot)

    grads_p, grads_x = jax.grad(f, argnums=(0, 1))(params, x)
    eps = 1e-3
    # spot-check a few coordinates with central differences
    for idx in [(0, 0, 0, 0), (1, 2, 1, 3), (2, 2, 0, 2)]:
        w0 = params["w"]
        dw = np.zeros(w0.shape, np.float32); dw[idx] = eps
        f_plus = f({"w": w0 + dw, "b": params["b"]}, x)
        f_minus = f({"w": w0 - dw, "b": params["b"]}, x)
        num = (f_plus - f_minus) / (2 * eps)
        np.testing.assert_allclose(grads_p["w"][idx], num, rtol=2e-2, atol=1e-3)
    dx = np.zeros(x.shape, np.float32); dx[0, 4, 4, 1] = eps
    num = (f(params, x + dx) - f(params, x - dx)) / (2 * eps)
    np.testing.assert_allclose(grads_x[0, 4, 4, 1], num, rtol=2e-2, atol=1e-3)


def test_maxpool_forward(rng):
    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    out = ops.max_pool2d(jnp.asarray(x), 2, 2)
    np.testing.assert_array_equal(np.asarray(out), np_maxpool(x, 2, 2))


def test_maxpool_backward_first_max_wins_on_ties(rng):
    # Construct windows full of exact ties (zeros, as after ReLU).
    x = np.zeros((1, 6, 6, 2), np.float32)
    x[0, 0, 0, 0] = 0.0   # all-tied window -> grad goes to offset (0,0)
    x[0, 2, 3, 1] = 5.0   # unique max
    x[0, 4, 4, 0] = 1.0
    x[0, 4, 5, 0] = 1.0   # tie inside one window -> first (row-major) wins
    g = np.ones((1, 3, 3, 2), np.float32)

    def pooled(xx):
        return jnp.sum(ops.max_pool2d(xx, 2, 2) * g)

    dx = np.asarray(jax.grad(pooled)(jnp.asarray(x)))
    ref = np_maxpool_bwd_first_max(x, g, 2, 2)
    np.testing.assert_array_equal(dx, ref)


def test_relu_grad_semantics():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    y, vjp = jax.vjp(ops.relu, x)
    np.testing.assert_array_equal(np.asarray(y), [0.0, 0.0, 2.0])
    (dx,) = vjp(jnp.ones(3))
    # reference relu.cpp:30-44 masks grad where output <= 0 (incl. x == 0)
    np.testing.assert_array_equal(np.asarray(dx), [0.0, 0.0, 1.0])


def test_linear(rng):
    x = rng.standard_normal((4, 10), dtype=np.float32)
    p = ops.linear_init(jax.random.key(2), 10, 3)
    out = ops.linear(p, jnp.asarray(x))
    ref = x @ np.asarray(p["w"]) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_linear_flattens_like_reference(rng):
    x = rng.standard_normal((2, 3, 3, 4), dtype=np.float32)
    p = ops.linear_init(jax.random.key(3), 36, 5)
    out = ops.linear(p, jnp.asarray(x))
    ref = x.reshape(2, -1) @ np.asarray(p["w"]) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_softmax_cross_entropy_matches_reference_math(rng):
    logits = rng.standard_normal((4, 3), dtype=np.float32)
    labels = np.array([0, 2, 1, 1])
    loss = ops.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    # reference func.cpp:56-73: loss = -mean_b sum_i y*log p
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    ref_loss = -np.mean(np.log(p[np.arange(4), labels]))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    # gradient wrt logits must be (p - y)/B (reference delta=(p-y), /B folded
    # into per-layer weight grads)
    grad = jax.grad(lambda l: ops.softmax_cross_entropy(l, jnp.asarray(labels)))(
        jnp.asarray(logits))
    y = np.eye(3, dtype=np.float32)[labels]
    np.testing.assert_allclose(np.asarray(grad), (p - y) / 4, rtol=1e-5, atol=1e-6)


def test_batchnorm_train_and_eval(rng):
    x = rng.standard_normal((4, 5, 5, 8), dtype=np.float32)
    params, state = ops.batch_norm2d_init(8)
    y, new_state = ops.batch_norm2d(params, state, jnp.asarray(x), train=True)
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    ref = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    # moving stats: (1-m)*old + m*new with old var init 1 (our fix)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), 0.1 * mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), 0.9 + 0.1 * var, rtol=1e-4, atol=1e-5)
    # eval normalizes with moving stats
    y_eval, same_state = ops.batch_norm2d(params, new_state, jnp.asarray(x), train=False)
    ref_eval = (x - np.asarray(new_state["mean"])) / np.sqrt(np.asarray(new_state["var"]) + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval), ref_eval, rtol=1e-4, atol=1e-4)
    assert same_state is new_state


def test_batchnorm_compat_zero_var_init():
    _, state = ops.batch_norm2d_init(4, compat_zero_var_init=True)
    np.testing.assert_array_equal(np.asarray(state["var"]), np.zeros(4))


def test_batchnorm_state_dtype_stable_across_steps(rng):
    """The returned state pytree keeps the input state's dtype — a promote
    to f32 on step 1 would retrace the jitted step and break buffer
    donation / scan carries. Fresh inits carry f32 stats even under bf16
    params (a bf16 EMA at momentum 0.1 visibly degrades eval)."""
    x = jnp.asarray(rng.standard_normal((2, 3, 3, 4), dtype=np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        params, state = ops.batch_norm2d_init(4, dt)
        assert state["mean"].dtype == jnp.float32
        _, s2 = ops.batch_norm2d(params, state, x.astype(dt), train=True)
        assert jax.tree.map(lambda a: a.dtype, s2) \
            == jax.tree.map(lambda a: a.dtype, state)
    # a restored legacy bf16 state keeps ITS dtype, too
    bstate = jax.tree.map(lambda a: a.astype(jnp.bfloat16), state)
    _, s3 = ops.batch_norm2d(params, bstate, x, train=True)
    assert s3["mean"].dtype == jnp.bfloat16


def test_batchnorm_grads_match_numerical(rng):
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 2), dtype=np.float32))
    params, state = ops.batch_norm2d_init(2)
    cot = jnp.asarray(rng.standard_normal((3, 4, 4, 2), dtype=np.float32))

    def f(p, xx):
        y, _ = ops.batch_norm2d(p, state, xx, train=True)
        return jnp.sum(y * cot)

    gp, gx = jax.grad(f, argnums=(0, 1))(params, x)
    eps = 1e-3
    dx = np.zeros(x.shape, np.float32); dx[1, 2, 2, 1] = eps
    num = (f(params, x + dx) - f(params, x - dx)) / (2 * eps)
    np.testing.assert_allclose(gx[1, 2, 2, 1], num, rtol=5e-2, atol=1e-3)
    dg = np.zeros(2, np.float32); dg[0] = eps
    num = (f({"gamma": params["gamma"] + dg, "beta": params["beta"]}, x)
           - f({"gamma": params["gamma"] - dg, "beta": params["beta"]}, x)) / (2 * eps)
    np.testing.assert_allclose(gp["gamma"][0], num, rtol=5e-2, atol=1e-3)


def test_channel_dropout_reference_compat(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 10), dtype=np.float32))
    # train: first int(0.4*10)=4 channel indices zeroed (dropout.cpp:24-37)
    y = ops.channel_dropout(x, 0.4, train=True, compat="reference")
    np.testing.assert_array_equal(np.asarray(y[..., :4]), 0.0)
    np.testing.assert_array_equal(np.asarray(y[..., 4:]), np.asarray(x[..., 4:]))
    # eval: * (1-p) vanilla scaling (dropout.cpp:39-48)
    y_eval = ops.channel_dropout(x, 0.4, train=False, compat="reference")
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(x) * 0.6, rtol=1e-6)


def test_channel_dropout_sampled(rng):
    x = jnp.ones((1, 2, 2, 10), jnp.float32)
    y = ops.channel_dropout(x, 0.4, train=True, rng=jax.random.key(0),
                            compat="sampled")
    per_channel = np.asarray(y)[0, 0, 0, :]
    assert (per_channel == 0).sum() == 4  # exactly int(p*C) channels dropped
    # inverted: kept channels scaled by 1/keep_frac
    y2 = ops.channel_dropout(x, 0.4, train=True, rng=jax.random.key(0),
                             compat="inverted")
    kept = np.asarray(y2)[0, 0, 0, :]
    np.testing.assert_allclose(kept[kept > 0], 1.0 / 0.6, rtol=1e-6)
    # inverted eval = identity
    y3 = ops.channel_dropout(x, 0.4, train=False, rng=jax.random.key(0),
                             compat="inverted")
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(x))


def test_uint8_preprocess(rng):
    from cnn_tpu.ops.preprocess import preprocess_batch
    raw = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    out = preprocess_batch(jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(out), raw.astype(np.float32) / 255,
                               rtol=1e-6, atol=1e-7)


def test_channel_dropout_eval_needs_no_rng():
    """Eval must not require an rng key (regression: assert fired before the
    eval shortcut and crashed validation of dropout-enabled models)."""
    x = jnp.ones((1, 2, 2, 10), jnp.float32)
    out = ops.channel_dropout(x, 0.3, train=False, rng=None, compat="inverted")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out2 = ops.channel_dropout(x, 0.3, train=False, rng=None, compat="sampled")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x) * 0.7, rtol=1e-6)


def test_channel_dropout_rejects_unknown_compat():
    """A typo'd compat string must raise, not silently fall through to
    mismatched train/eval scaling."""
    import pytest
    x = jnp.ones((1, 2, 2, 10), jnp.float32)
    with pytest.raises(ValueError, match="compat"):
        ops.channel_dropout(x, 0.3, train=True, rng=jax.random.key(0),
                            compat="invert")
