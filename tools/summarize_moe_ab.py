"""Summarize the MoE balance-loss A/B (VERDICT r4 item 9).

Reads each run's history.jsonl (written by the train CLI with per-expert
dispatch fractions at every validation) and prints, per run: final
valid/test-proxy accuracy, and the router-balance trajectory — the
max/min expert load fraction and the load coefficient of variation at
the start, middle, and end of training. The decision record lands in
BASELINE.md; the framework default stays whatever the measurement says.

Usage: python -m tools.summarize_moe_ab checkpoints/moecnn_balance_0.0 \
           checkpoints/moecnn_balance_0.01
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def load_history(run_dir: str):
    rows = []
    with open(os.path.join(run_dir, "history.jsonl")) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def balance_stats(loads) -> dict:
    """loads: {layer_name: [fraction...]} -> aggregate balance metrics."""
    fr = np.concatenate([np.asarray(v, np.float64) for v in loads.values()])
    per_layer_cv = [float(np.std(v) / max(np.mean(v), 1e-9))
                    for v in (np.asarray(v) for v in loads.values())]
    n_experts = len(next(iter(loads.values())))
    return {"max": float(fr.max()), "min": float(fr.min()),
            "cv": float(np.mean(per_layer_cv)), "uniform": 1.0 / n_experts}


def summarize(run_dir: str) -> dict:
    rows = load_history(run_dir)
    with_loads = [r for r in rows if "moe_load" in r]
    if not with_loads:
        raise SystemExit(f"{run_dir}: no moe_load entries in history")
    first, mid, last = (with_loads[0], with_loads[len(with_loads) // 2],
                        with_loads[-1])
    acc = [r.get("valid_accuracy") for r in rows
           if r.get("valid_accuracy") is not None]
    return {
        "run": os.path.basename(run_dir.rstrip("/")),
        "best_valid": max(acc) if acc else None,
        "final_valid": acc[-1] if acc else None,
        "balance": {tag: balance_stats(r["moe_load"])
                    for tag, r in (("start", first), ("mid", mid),
                                   ("end", last))},
    }


def main(argv=None):
    dirs = (argv or sys.argv[1:])
    if not dirs:
        raise SystemExit(__doc__)
    out = [summarize(d) for d in dirs]
    for s in out:
        b = s["balance"]
        print(f"{s['run']}: best valid {s['best_valid']:.3f} "
              f"final {s['final_valid']:.3f}")
        for tag in ("start", "mid", "end"):
            st = b[tag]
            print(f"  {tag:>5}: expert load max {st['max']:.3f} "
                  f"min {st['min']:.3f} cv {st['cv']:.3f} "
                  f"(uniform = {st['uniform']:.3f})")
    print(json.dumps({"metric": "moe_balance_ab", "runs": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
