"""Measure the 1F1B schedule's wall cost against its bubble arithmetic.

The round-4 rewrite of ``parallel/pipeline.py:_make_1f1b_device_fn``
replaced the uniform-tick eager schedule (one F and one B chunk-apply
every tick, ``T = M + 2S - 2`` ticks, so ``2M + 4S - 4`` chunk-applies
per stage) with the classic warmup/steady/drain 1F1B as three
static-length scans (``2M + 2S - 2`` applies per stage) — half the
bubble. The predicted step-time ratio eager/classic is

    (2M + 4S - 4) / (2M + 2S - 2)

(1.43x at S=4 M=4, 1.27x at M=8, 1.16x at M=16 — shrinking as the
steady state amortizes the bubble, exactly a bubble should). This
script times BOTH schedules' PP train step on the virtual CPU mesh and
prints measured vs predicted. To time the replaced eager schedule for
an A/B, run it from a git worktree at the pre-rewrite commit with
PYTHONPATH pointing there.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python -m tools.bench_pp_schedule
"""

from __future__ import annotations

import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (
        _xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def time_step(schedule: str, n_mb: int, *, stages: int = 4,
              width: int = 64, n_blocks: int = 8, image_size: int = 64,
              per_mb: int = 8, reps: int = 5, virtual_stages: int = 1) -> float:
    """Best-of-reps seconds per PP train step at constant per-microbatch
    work (batch = M * per_mb) — the regime where only the schedule's
    bubble differs across M."""
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
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 255, (bs, image_size, image_size, 3),
                                    dtype=np.uint8))
    y = jax.device_put(rng.integers(0, 3, (bs,), dtype=np.int32))
    ts2, m = step(ts, x, y)   # compile + warmup
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _, m = step(ts, x, y)
        jax.block_until_ready(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    S = 4
    ms = [4, 8, 16]
    out = {"metric": "pp_schedule_step_seconds", "stages": S, "ms": ms}
    for schedule in ("gpipe", "1f1b"):
        ts = [time_step(schedule, m, stages=S) for m in ms]
        out[schedule] = [round(t, 4) for t in ts]
        print(f"{schedule:>6}: " + "  ".join(
            f"M={m}: {t * 1e3:7.1f} ms" for m, t in zip(ms, ts)))
    out["eager_over_classic_predicted"] = [
        round((2 * m + 4 * S - 4) / (2 * m + 2 * S - 2), 3) for m in ms]
    # interleaved 1F1B (V=2): predicted classic/interleaved wall =
    # (2M + 2S - 2) / (2M + (2S - 2)/V) — the bubble's 1/V cut, everything
    # else equal. M must divide by S.
    V = 2
    ms_i = [m for m in ms if m % S == 0]
    ts = [time_step("1f1b", m, stages=S, virtual_stages=V) for m in ms_i]
    out["1f1b_v2"] = [round(t, 4) for t in ts]
    out["classic_over_interleaved_predicted"] = [
        round((2 * m + 2 * S - 2) / (2 * m + (2 * S - 2) / V), 3)
        for m in ms_i]
    print(f"1f1bV2: " + "  ".join(
        f"M={m}: {t * 1e3:7.1f} ms" for m, t in zip(ms_i, ts)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
