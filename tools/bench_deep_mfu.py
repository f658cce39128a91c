"""Deep-model MFU sweep (VERDICT r2 item 8: 52% -> 60%, or a measured stop).

The prime suspect is remat: ``jax.checkpoint`` over the scanned trunk
recomputes each block's forward during the backward — 4 forward-equivalents
of executed FLOPs per step while MFU counts the useful 3, capping MFU at
0.75x the kernel-level efficiency. At width 256 the activations may simply
fit in HBM without remat, returning that 25%.

Run from the repo root: ``python -m tools.bench_deep_mfu``.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# runnable both as `python -m tools.<name>` (repo root on path) and
# as a direct script (only tools/ on path): make repo-root imports
# (bench, cnn_tpu) resolve either way
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import json
import time

import numpy as np


def _enable_compile_cache():
    from bench import enable_compile_cache
    enable_compile_cache()


def measure(width: int, n_blocks: int, batch_size: int, remat,
            batch_norm: bool = True, steps_per_call: int = 1,
            iters: int = 12, grad_accum: int = 1):
    import jax
    import jax.numpy as jnp
    from cnn_tpu import optim
    from cnn_tpu.models import get_model
    from cnn_tpu.parallel import create_train_state, make_train_step
    from cnn_tpu.utils.flops import train_flops_per_image
    from bench import peak_bf16_flops

    del steps_per_call  # dispatch is negligible at these step sizes
    model = get_model("pipecnn", num_classes=3, width=width,
                      n_blocks=n_blocks, remat=remat,
                      batch_norm=batch_norm)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(0))
    step = make_train_step(model, opt, compute_dtype=jnp.bfloat16,
                           grad_accum=grad_accum)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch_size, 224, 224, 3), dtype=np.uint8))
    y = jnp.asarray(np.arange(batch_size, dtype=np.int32) % 3)

    try:
        ts, m = step(ts, x, y)
        float(m["loss"])
    except Exception as e:  # OOM etc.
        return None, str(e)[:120]
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, m = step(ts, x, y)
    float(m["loss"])
    ips = batch_size * iters / (time.perf_counter() - t0)
    mfu = ips * train_flops_per_image(model) / peak_bf16_flops()
    return (round(ips, 1), round(100 * mfu, 2)), None


def main():
    _enable_compile_cache()
    results = {}
    for tag, cfg in {
        # round 1 (measured): full remat beats NO remat at w128 (43.5% vs
        # 36.1% — the trunk goes HBM-bound when every intermediate is
        # saved); w256 full remat = 52.4%.
        # round 2 (measured): remat='conv' (save conv outputs, recompute
        # the elementwise tail) beats full remat at every width — w256
        # 56.5%, w384 65.1%, w128 a wash (43.0).
        # round 3 (measured): BN was the binding resource at w256 — 73.8%
        # without BN vs 56.5% with; w512 71.3%; bs512@w256 and bs256@w384
        # exceed HBM (the saved conv outputs alone are 13.2/9.9 GB).
        # round 4: re-measure after the BN fix (single-pass E[x^2]-E[x]^2
        # stats + [C]-sized stats named saveable under remat='conv').
        "w256_L8_bs256_conv": (256, 8, 256, "conv"),
        "w384_L8_bs128_conv": (384, 8, 128, "conv"),
        "w512_L8_bs128_conv": (512, 8, 128, "conv"),
        "w256_L16_bs128_conv": (256, 16, 128, "conv"),
        # past-the-HBM-limit batches via gradient accumulation: bs512@w256
        # and bs256@w384 fail to compile at K=1 (saved conv outputs 13.2 /
        # 9.9 GB); K sequential microbatches of the proven size restore
        # the effective batch at one microbatch's activation footprint
        "w256_L8_bs512_conv_ga2": (256, 8, 512, "conv", True, 1, 12, 2),
        "w384_L8_bs256_conv_ga2": (384, 8, 256, "conv", True, 1, 12, 2),
        "w256_L8_bs1024_conv_ga4": (256, 8, 1024, "conv", True, 1, 6, 4),
    }.items():
        out, err = measure(*cfg)
        results[tag] = out or err
        print(json.dumps({tag: results[tag]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
