"""Gradient clipping (optim.make_optimizer grad_clip): global-norm math."""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim


def test_clip_by_global_norm_math():
    opt = optim.make_optimizer("sgd", 1.0, grad_clip=1.0)
    params = {"a": jnp.zeros(3), "b": jnp.zeros(4)}
    s = opt.init(params)
    grads = {"a": jnp.full(3, 2.0), "b": jnp.full(4, 2.0)}
    gnorm = float(np.sqrt(3 * 4.0 + 4 * 4.0))
    new_params, s = opt.update(grads, s, params)
    # update = -lr * g * (clip / gnorm)
    np.testing.assert_allclose(np.asarray(new_params["a"]),
                               -2.0 / gnorm * np.ones(3), rtol=1e-6)


def test_no_clip_below_threshold():
    opt = optim.make_optimizer("sgd", 1.0, grad_clip=100.0)
    params = {"a": jnp.zeros(2)}
    s = opt.init(params)
    new_params, s = opt.update({"a": jnp.full(2, 0.5)}, s, params)
    np.testing.assert_allclose(np.asarray(new_params["a"]), -0.5, rtol=1e-6)


def test_clip_composes_with_momentum_and_decay():
    opt = optim.make_optimizer("momentum", 1e-2, 0.9, weight_decay=1e-4,
                               grad_clip=1.0)
    params = {"a": jnp.ones(3)}
    s = opt.init(params)
    new_params, s = opt.update({"a": jnp.full(3, 10.0)}, s, params)
    assert np.all(np.isfinite(np.asarray(new_params["a"])))
    assert float(new_params["a"][0]) < 1.0


def test_weight_decay_does_not_change_optimizer_family():
    """'momentum' must default to momentum 0.9 with OR without weight
    decay: two identical-gradient steps accelerate (velocity builds) in
    both configurations — adding --weight-decay must not silently degrade
    to plain SGD."""
    for wd in (0.0, 1e-4):
        opt = optim.make_optimizer("momentum", 1e-2, weight_decay=wd)
        params = {"a": jnp.zeros(2)}
        s = opt.init(params)
        g = {"a": jnp.ones(2)}
        p1, s = opt.update(g, s, params)
        d1 = float(params["a"][0] - p1["a"][0])
        p2, s = opt.update(g, s, p1)
        d2 = float(p1["a"][0] - p2["a"][0])
        assert d2 > d1 * 1.5, (wd, d1, d2)  # velocity accumulated
