"""BatchNorm2D (per-channel over B*H*W).

Reference (``cpu/src/batchnorm2d.cpp``): learnable gamma (init 1) / beta
(init 0), eps 1e-5, momentum 0.1 (``batchnorm2d.cpp:17-21``). Train path
normalizes by batch stats and updates
``moving = (1-m)*moving + m*batch`` (``batchnorm2d.cpp:44-80``); eval path
uses moving stats (``:81-94``). Its hand-derived backward
(``:100-158``) is the standard BN VJP, so autograd matches.

The reference's eval mode is acknowledged broken (``README.md:15``). We
MEASURED the mechanism (``tools/reference_oracle/bn_gap.cpp``, r2): after
400 iters at the reference's bs=4, the unmodified C++ scores the SAME 72
images at 1.000 in train mode but 0.833 in eval mode. The momentum-0.1 EMA
is long converged by then, so the zero ``moving_var`` init
(``batchnorm2d.cpp:20``) is NOT the cause — the gap is the tiny-batch
statistics mismatch (features co-adapt to 4-sample normalization).
``tests/test_bn_compat.py`` reproduces the gap direction under the same
protocol; our flagship runs train BN at bs=256 where it vanishes. We still
initialize ``moving_var`` to 1 (sane early-eval); ``compat_zero_var_init``
reproduces the reference's zero init bit-for-bit for init-parity studies
(it only matters in the first ~dozens of steps).

Functional design: batch stats are *state*, not params — ``batch_norm2d``
returns ``(y, new_state)`` and takes ``train: bool`` explicitly, replacing
the reference's global ``no_grad`` flag (``architectures.h:19-30``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def batch_norm2d_init(num_channels: int, dtype=jnp.float32,
                      compat_zero_var_init: bool = False) -> tuple[dict, dict]:
    """Returns (params, state)."""
    params = {
        "gamma": jnp.ones((num_channels,), dtype),
        "beta": jnp.zeros((num_channels,), dtype),
    }
    # moving stats are always f32: they're [C]-sized (off the hot path),
    # computed in f32, and a bf16 EMA (momentum 0.1) visibly degrades eval;
    # batch_norm2d keeps whatever dtype the state carries (e.g. restored
    # legacy checkpoints), so this only sets the default for fresh inits
    state = {
        "mean": jnp.zeros((num_channels,), jnp.float32),
        "var": (jnp.zeros if compat_zero_var_init
                else jnp.ones)((num_channels,), jnp.float32),
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
        # single-pass stats: E[x^2] - E[x]^2 lets XLA compute both
        # reductions in ONE read of x (the two-pass formula re-reads the
        # whole activation for the centered-square pass); biased variance
        # (divides by N), as the reference does
        mean = jnp.mean(x32, axis=(0, 1, 2))
        # clamp at 0: unlike the two-pass form, E[x^2]-E[x]^2 can go
        # (slightly) negative from f32 cancellation on a near-constant
        # channel with |mean| >> std, and sqrt(var+eps) would then be NaN
        var = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean), 0.0)
        # [C]-sized stats are named saveable for selective remat
        # (StackedBlocks remat='conv'): costing bytes, they spare the
        # backward pass a full re-reduction over every conv output
        mean = checkpoint_name(mean, "bn_stats")
        var = checkpoint_name(var, "bn_stats")
        # keep the EMA in the state's own dtype: mixing a non-f32 state
        # with the f32 batch stats would promote, changing the state
        # pytree's dtype on the first train step (jit retrace, broken
        # buffer donation, scan carry mismatch)
        sdt = state["mean"].dtype
        new_state = {
            "mean": ((1.0 - momentum) * state["mean"].astype(jnp.float32)
                     + momentum * mean).astype(sdt),
            "var": ((1.0 - momentum) * state["var"].astype(jnp.float32)
                    + momentum * var).astype(sdt),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = gamma * jnp.reciprocal(jnp.sqrt(var + eps))
    y = x.astype(jnp.float32) * inv + (beta - mean * inv)
    return y.astype(x.dtype), new_state
