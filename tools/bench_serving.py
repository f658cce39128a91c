"""Re-measure ONLY the RPC-bound serving metrics, median-of-N + spread.

VERDICT r4 item 1: `infer_stream_ms_per_image` drifted 7.37 (r3) -> 13.83
(r4) with zero serving-code change between the rounds, and the single-shot
bench could not say whether that was a regression or tunnel state. This
tool runs the same three measurements bench.py now reports (median of 5
runs each, with [min, max] spread) without paying for the full training
bench — so the serving claim can be re-established (or honestly re-
published) from several independent process launches.

    python -m tools.bench_serving            # one JSON line

Reference latency being beaten: the C++ inference loop at
/root/reference/cpu/src/inference.cpp:53-72 (29.91 ms/image measured,
BASELINE.md).
"""

from __future__ import annotations

import json


def main():
    import bench  # repo-root bench.py

    bench.enable_compile_cache()
    import jax

    watchdog = bench._backend_watchdog()
    backend = jax.default_backend()
    jax.devices()
    watchdog.clear()

    p50, p50_lo, p50_hi = bench.measure_infer_p50()
    stream, s_lo, s_hi = bench.measure_infer_stream()
    dev, d_lo, d_hi = bench.measure_infer_device_ms()
    print(json.dumps({
        "metric": "infer_stream_ms_per_image",
        "value": round(stream, 2),
        "unit": "ms",
        "vs_baseline": round(bench.BASELINE_INFER_P50_MS / stream, 2),
        "backend": backend,
        "infer_p50_ms": round(p50, 2),
        "infer_p50_ms_spread": [round(p50_lo, 2), round(p50_hi, 2)],
        "infer_stream_ms_spread": [round(s_lo, 2), round(s_hi, 2)],
        "infer_device_ms": round(dev, 3),
        "infer_device_ms_spread": [round(d_lo, 3), round(d_hi, 3)],
    }))


if __name__ == "__main__":
    main()
