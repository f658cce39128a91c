"""Space-to-depth conv1 experiment (VERDICT r2 item 1).

Measures AlexNet train throughput/MFU with and without s2d execution of
the lane-starved stride-2 convs (ops/conv.py:conv2d_s2d) on the real TPU.
Run from the repo root: ``python -m tools.bench_s2d``.
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


def measure(space_to_depth: bool, batch_size: int, iters: int = 40,
            repeats: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    from cnn_tpu import optim
    from cnn_tpu.models import get_model
    from cnn_tpu.parallel import create_train_state, make_train_step

    model = get_model("alexnet", num_classes=3,
                      space_to_depth=space_to_depth)
    opt = optim.sgd(1e-3)
    ts = create_train_state(model, opt, jax.random.key(0))
    step = make_train_step(model, opt, compute_dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch_size, 224, 224, 3), dtype=np.uint8))
    y = jnp.asarray(np.arange(batch_size, dtype=np.int32) % 3)
    ts, m = step(ts, x, y)
    float(m["loss"])  # compile + sync
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, m = step(ts, x, y)
        float(m["loss"])
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    return best


def main():
    from cnn_tpu.models import get_model
    from cnn_tpu.utils.flops import train_flops_per_image
    from bench import peak_bf16_flops

    flops = train_flops_per_image(get_model("alexnet", num_classes=3))
    peak = peak_bf16_flops()
    out = {}
    for bs in (256, 1024, 4096):
        base = measure(False, bs)
        s2d = measure(True, bs)
        out[f"bs{bs}"] = {
            "base_img_s": round(base, 1), "s2d_img_s": round(s2d, 1),
            "speedup": round(s2d / base, 3),
            "base_mfu_pct": round(100 * base * flops / peak, 2),
            "s2d_mfu_pct": round(100 * s2d * flops / peak, 2),
        }
        print(json.dumps({f"bs{bs}": out[f"bs{bs}"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
