"""Tracing / profiling.

The reference has none (SURVEY.md §5.1 — only printf progress lines). Here:
- ``StepTimer``: wall-clock + images/sec accounting for the train loop.
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace directory (pass ``--profile DIR`` to the train CLI).
- ``device_memory_stats``: live HBM usage (where the backend exposes it).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.images = 0
        self.steps = 0

    def tick(self, batch_size: int):
        self.images += batch_size
        self.steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def images_per_sec(self) -> float:
        dt = self.elapsed
        return self.images / dt if dt > 0 else 0.0

    @property
    def ms_per_step(self) -> float:
        return 1e3 * self.elapsed / self.steps if self.steps else 0.0


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                if stats and k in stats}
    except Exception:
        return {}
