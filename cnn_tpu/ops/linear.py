"""Dense layer.

Reference (``cpu/src/linear.cpp``): ``y = xW + b`` with W stored flat
``[in][out]`` (``linear.cpp:40``), init N(0,1)/10 seed 1998
(``linear.cpp:14-18``). Its hand-written backward (dW = xT d / B, db = mean d,
dx = d WT, ``linear.cpp:47-93``) is the VJP of this forward under a
batch-mean loss, so autograd reproduces it.

Layout note for checkpoint parity: the reference flattens conv features in
CHW order before the dense layer; we run NHWC on device, so the reference
``.model`` importer permutes the dense in-dim (see utils/checkpoint.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(key: jax.Array, in_features: int, out_features: int,
                dtype=jnp.float32, init_scale: float = 0.1) -> dict:
    k_w, k_b = jax.random.split(key)
    w = jax.random.normal(k_w, (in_features, out_features), dtype) * init_scale
    b = jax.random.normal(k_b, (out_features,), dtype) * init_scale
    return {"w": w, "b": b}


def linear(params: dict, x: jnp.ndarray, compute_dtype=None,
           precision=None) -> jnp.ndarray:
    """[B, ..., in] -> [B, out]; flattens trailing dims (reference flattens CHW)."""
    w, b = params["w"], params["b"]
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if precision is None and x.dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
    out = jnp.dot(x, w, precision=precision)
    return out + b.astype(out.dtype)
