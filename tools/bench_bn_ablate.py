"""Decompose the deep-trunk BN cost (BASELINE.md §r3 follow-up).

At w256/L8 the selective-remat trunk measures 62.3% MFU with BN and 73.8%
without — BN costs ~11.5 MFU points even after the single-pass-stats fix.
This tool splits that gap into its mechanical parts by monkeypatching
``cnn_tpu.ops.batch_norm2d`` with semantically-degraded variants (NOT
product code — a measurement instrument):

  full            the shipped op (fwd stats reduction + full BN VJP)
  stopgrad_stats  stats wrapped in stop_gradient: removes the backward's
                  d_var/d_mean chain, keeps the forward reduction
  frozen_stats    normalize by moving stats even in train: removes the
                  forward reduction too (gamma/beta still learned)
  affine_only     y = x*gamma + beta: the pure elementwise floor
  none            batch_norm=False (no op at all)

full-stopgrad = cost of the stats backward; stopgrad-frozen = cost of the
forward reduction; frozen-affine ~ 0 (same traffic); affine-none = the
FMA's traffic. Run from the repo root: ``python -m tools.bench_bn_ablate``.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# runnable both as `python -m tools.<name>` (repo root on path) and
# as a direct script (only tools/ on path): make repo-root imports
# (bench, cnn_tpu) resolve either way
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import functools
import json

import numpy as np


def _variant(mode: str):
    import jax
    import jax.numpy as jnp
    from jax.ad_checkpoint import checkpoint_name

    def bn(params, state, x, *, train, eps=1e-5, momentum=0.1):
        gamma = params["gamma"].astype(jnp.float32)
        beta = params["beta"].astype(jnp.float32)
        if mode == "affine_only":
            y = x.astype(jnp.float32) * gamma + beta
            return y.astype(x.dtype), state
        if train and mode != "frozen_stats":
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
            if mode == "stopgrad_stats":
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
            mean = checkpoint_name(mean, "bn_stats")
            var = checkpoint_name(var, "bn_stats")
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

    return bn


def measure(mode: str, width=256, n_blocks=8, batch_size=256, iters=12):
    import time

    import jax
    import jax.numpy as jnp

    import cnn_tpu.ops as ops_pkg
    from bench import peak_bf16_flops
    from cnn_tpu import optim
    from cnn_tpu.models import get_model
    from cnn_tpu.parallel import create_train_state, make_train_step
    from cnn_tpu.utils.flops import train_flops_per_image

    orig = ops_pkg.batch_norm2d
    if mode not in ("full", "none"):
        ops_pkg.batch_norm2d = _variant(mode)
    try:
        model = get_model("pipecnn", num_classes=3, width=width,
                          n_blocks=n_blocks, remat="conv",
                          batch_norm=(mode != "none"))
        opt = optim.make_optimizer("momentum", 1e-2, 0.9)
        ts = create_train_state(model, opt, jax.random.key(0))
        step = make_train_step(model, opt, compute_dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (batch_size, 224, 224, 3), dtype=np.uint8))
        y = jnp.asarray(np.arange(batch_size, dtype=np.int32) % 3)
        ts, m = step(ts, x, y)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, m = step(ts, x, y)
        float(m["loss"])
        ips = batch_size * iters / (time.perf_counter() - t0)
        # MFU against the full model's FLOPs so rows are comparable work
        ref_model = get_model("pipecnn", num_classes=3, width=width,
                              n_blocks=n_blocks, batch_norm=True)
        mfu = ips * train_flops_per_image(ref_model) / peak_bf16_flops()
        return round(ips, 1), round(100 * mfu, 2)
    finally:
        ops_pkg.batch_norm2d = orig


@functools.cache
def _cache_cfg():
    from bench import enable_compile_cache
    enable_compile_cache()


def main():
    _cache_cfg()
    out = {}
    for mode in ("full", "stopgrad_stats", "frozen_stats",
                 "affine_only", "none"):
        out[mode] = measure(mode)
        print(json.dumps({mode: out[mode]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
