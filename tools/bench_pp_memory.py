"""Measure the pipeline schedules' memory scaling in the microbatch count.

The 1F1B schedule's whole point (parallel/pipeline.py:_make_1f1b_device_fn)
is the live-activation bound: GPipe-through-autodiff saves every tick's
residuals — O(M) microbatches live through the backward — while 1F1B holds
a ring buffer of ``2S - 1`` stage inputs — O(S), independent of M. This
script turns that arithmetic into a compiler measurement: XLA's buffer
assignment (``compiled.memory_analysis().temp_size_in_bytes``) is the
actual peak temp allocation of the step program, so the claim is checked
against what the compiler will really allocate, not against hand math.

Run on the 8-virtual-device CPU mesh (measures allocation, not speed):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m tools.bench_pp_memory

Prints one row per (schedule, M) and a final JSON line with the fitted
per-microbatch slope of each schedule's temp memory, at the default trunk
depth and at 2x depth. Measured (8-block pipecnn w32, 4 stages, CPU XLA):
GPipe 3.58 MB/microbatch vs 1F1B 1.86; at 16 blocks GPipe grows to 5.09
while 1F1B stays 1.74 — the trunk's O(M) live set is gone under 1F1B, and
the residual slope is the full-batch stem/head path both schedules share
(the batch itself scales with M in this constant-per-microbatch setup).
"""

from __future__ import annotations

import json
import os

# sitecustomize imports jax at interpreter startup, so env vars alone are
# too late — update the live config too (same pattern as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (
        _xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def measure(schedule: str, n_mb: int, *, stages: int = 4, width: int = 32,
            n_blocks: int = 8, image_size: int = 64, per_mb: int = 4,
            virtual_stages: int = 1) -> int:
    """Peak temp bytes of one compiled PP train step (batch = M * per_mb,
    so the per-microbatch work is CONSTANT across M — exactly the regime
    where GPipe's live set grows and 1F1B's must not)."""
    from cnn_tpu import optim
    from cnn_tpu.models import PipeCNN
    from cnn_tpu.parallel import (create_train_state, make_pp_train_step,
                                  shard_pp_train_state)

    model = PipeCNN(num_classes=3, width=width, n_blocks=n_blocks,
                    image_size=image_size, remat=False)
    opt = optim.sgd(1e-2)
    mesh = Mesh(np.array(jax.devices()[:stages]).reshape(stages), ("stage",))
    ts = shard_pp_train_state(
        create_train_state(model, opt, jax.random.key(0)), mesh, model)
    step = make_pp_train_step(model, opt, mesh, n_microbatches=n_mb,
                              donate=False, schedule=schedule,
                              virtual_stages=virtual_stages)
    bs = n_mb * per_mb
    x = jax.ShapeDtypeStruct((bs, image_size, image_size, 3), np.uint8)
    y = jax.ShapeDtypeStruct((bs,), np.int32)
    compiled = step.lower(ts, x, y).compile()
    stats = compiled.memory_analysis()
    return int(stats.temp_size_in_bytes)


def main():
    ms = [1, 2, 4, 8, 16]
    rows = {}
    for schedule in ("gpipe", "1f1b"):
        rows[schedule] = [measure(schedule, m) for m in ms]
    print(f"{'M':>4}  {'gpipe temp MB':>14}  {'1f1b temp MB':>13}")
    for i, m in enumerate(ms):
        print(f"{m:>4}  {rows['gpipe'][i] / 2**20:>14.1f}  "
              f"{rows['1f1b'][i] / 2**20:>13.1f}")
    # least-squares slope of temp bytes vs M — the O(M) vs O(S) check
    slopes = {s: float(np.polyfit(ms, rows[s], 1)[0]) / 2**20
              for s in rows}
    # Depth attribution: both schedules share an irreducible O(M) term —
    # the FULL-BATCH stem/head path and the batch itself scale with M.
    # What 1F1B removes is the TRUNK's O(M) live set, so doubling trunk
    # depth must raise GPipe's slope and leave 1F1B's flat.
    deep_ms = [1, 8, 16]
    deep_slopes = {}
    for schedule in ("gpipe", "1f1b"):
        deep = [measure(schedule, m, n_blocks=16) for m in deep_ms]
        deep_slopes[schedule] = float(np.polyfit(deep_ms, deep, 1)[0]) / 2**20
    # interleaved 1F1B: the ring holds 2*V*S - 1 chunk inputs (~V x the
    # V=1 ring) — the documented memory price of the 1/V bubble cut;
    # still O(S) in M (the slope must stay 1F1B-flat)
    ms_i = [4, 8, 16]
    v2 = [measure("1f1b", m, virtual_stages=2) for m in ms_i]
    v2_slope = float(np.polyfit(ms_i, v2, 1)[0]) / 2**20
    print(f"1f1b V=2 temp MB at M={ms_i}: "
          f"{[round(v / 2**20, 1) for v in v2]}")
    print(json.dumps({
        "metric": "pp_temp_mem_slope_mb_per_microbatch",
        "gpipe": round(slopes["gpipe"], 3),
        "1f1b": round(slopes["1f1b"], 3),
        "ratio": round(slopes["gpipe"] / max(slopes["1f1b"], 1e-9), 1),
        "gpipe_2x_depth": round(deep_slopes["gpipe"], 3),
        "1f1b_2x_depth": round(deep_slopes["1f1b"], 3),
        "1f1b_v2": round(v2_slope, 3),
        "1f1b_v2_temp_mb": [round(v / 2**20, 1) for v in v2],
        "temp_mb": {s: [round(v / 2**20, 1) for v in rows[s]]
                    for s in rows},
    }))


if __name__ == "__main__":
    main()
