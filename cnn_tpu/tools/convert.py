"""Checkpoint conversion CLI: native ``.ckpt`` <-> reference ``.model``.

Lets a reference user bring their committed ``.model`` files here and export
ours back for the C++ loader (``alexnet.cpp:69-90`` format).

Usage:
  python -m cnn_tpu.tools.convert in.model out.ckpt   [--batch-norm true]
  python -m cnn_tpu.tools.convert in.ckpt  out.model  [--batch-norm true]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from cnn_tpu.models import get_model
from cnn_tpu import optim
from cnn_tpu.parallel.train_step import TrainState
from cnn_tpu.utils.checkpoint import (export_reference_model,
                                      import_reference_model, load_checkpoint,
                                      save_checkpoint)


def main(argv=None):
    ap = argparse.ArgumentParser(description="cnn_tpu checkpoint converter")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--num-classes", type=int, default=3)
    ap.add_argument("--batch-norm", type=lambda s: s.lower() in ("1", "true"),
                    default=False)
    ap.add_argument("--use-ema", action="store_true",
                    help="export the EMA weights (paired with the EMA'd BN "
                         "stats) from an --ema training run")
    args = ap.parse_args(argv)

    model = get_model("alexnet", num_classes=args.num_classes,
                      batch_norm=args.batch_norm)
    if args.src.endswith(".model"):
        params, state = import_reference_model(args.src, model.net)
        ts = TrainState(params=params, state=state,
                        opt_state=optim.sgd(0.0).init(params),
                        step=jnp.zeros((), jnp.int32),
                        rng=jax.random.key(0))
        save_checkpoint(args.dst, ts)
        print(f"imported {args.src} -> {args.dst}")
    else:
        ts = load_checkpoint(args.src)
        params, state = ts.params, ts.state
        if args.use_ema:
            params = optim.ema_params(ts.opt_state)
            if params is None:
                sys.exit(f"{args.src} has no EMA state (trained without "
                         "--ema)")
            state = optim.ema_model_state(ts.opt_state, ts.state)
        export_reference_model(args.dst, model.net, params, state)
        print(f"exported {args.src} -> {args.dst} (reference .model format)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
