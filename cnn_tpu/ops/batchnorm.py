"""BatchNorm2D (per-channel over B*H*W).

Reference (``cpu/src/batchnorm2d.cpp``): learnable gamma (init 1) / beta
(init 0), eps 1e-5, momentum 0.1 (``batchnorm2d.cpp:17-21``). Train path
normalizes by batch stats and updates
``moving = (1-m)*moving + m*batch`` (``batchnorm2d.cpp:44-80``); eval path
uses moving stats (``:81-94``). Its hand-derived backward
(``:100-158``) is the standard BN VJP, so autograd matches.

The reference's eval mode is acknowledged broken (``README.md:15``): it
initializes ``moving_var`` to ZERO (``batchnorm2d.cpp:20``) and uses plain
(biased-at-start) EMA, so early-eval statistics are tiny and wrong. We fix
this by initializing ``moving_var`` to 1. A ``compat_zero_var_init`` flag
reproduces the reference behavior for parity studies.

Functional design: batch stats are *state*, not params — ``batch_norm2d``
returns ``(y, new_state)`` and takes ``train: bool`` explicitly, replacing
the reference's global ``no_grad`` flag (``architectures.h:19-30``).
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_norm2d_init(num_channels: int, dtype=jnp.float32,
                      compat_zero_var_init: bool = False) -> tuple[dict, dict]:
    """Returns (params, state)."""
    params = {
        "gamma": jnp.ones((num_channels,), dtype),
        "beta": jnp.zeros((num_channels,), dtype),
    }
    state = {
        "mean": jnp.zeros((num_channels,), dtype),
        "var": (jnp.zeros if compat_zero_var_init else jnp.ones)((num_channels,), dtype),
    }
    return params, state


def batch_norm2d(params: dict, state: dict, x: jnp.ndarray, *,
                 train: bool, eps: float = 1e-5,
                 momentum: float = 0.1) -> tuple[jnp.ndarray, dict]:
    """NHWC batch norm. Returns (y, new_state).

    Stats are computed in f32 regardless of compute dtype (bf16-safe).
    """
    gamma = params["gamma"].astype(jnp.float32)
    beta = params["beta"].astype(jnp.float32)
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        # biased variance (divides by N), as the reference does
        var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2))
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = gamma * jnp.reciprocal(jnp.sqrt(var + eps))
    y = x.astype(jnp.float32) * inv + (beta - mean * inv)
    return y.astype(x.dtype), new_state
