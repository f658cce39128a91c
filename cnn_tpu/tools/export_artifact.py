"""Export an AOT serving artifact from a checkpoint.

The deployment counterpart of the reference's weights-plus-binary scheme
(``inference.cpp:32-35``): the output file carries the compiled program
AND the weights, serves any batch size, and loads with jax alone (see
``cnn_tpu/export.py``).

Usage:
  python -m cnn_tpu.tools.export_artifact ckpt.ckpt out.ctsa \
      --name alexnet [--num-classes 3] [--compute-dtype bfloat16] \
      [--int8 calib1.jpg calib2.jpg ...] [--platforms tpu cpu]

``.model`` reference checkpoints are accepted too (imported through the
flat-binary reader).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

DEFAULT_CLASSES = ["dog", "panda", "bird"]  # cnn.cpp:43 category order


def _load(src: str, model, use_ema: bool = False):
    from cnn_tpu.tools.infer import load_params
    return load_params(src, model, use_ema=use_ema)


def _read_calib(paths, image_size):
    import cv2
    imgs = []
    for p in paths:
        img = cv2.imread(p)
        if img is None:
            print(f"warning: unreadable calibration image {p}",
                  file=sys.stderr)
            continue
        imgs.append(cv2.resize(img, (image_size, image_size)))
    if not imgs:
        raise SystemExit("--int8 given but no calibration images loaded")
    return np.stack(imgs)


def main(argv=None):
    import jax.numpy as jnp

    from cnn_tpu.export import export_serving_artifact
    from cnn_tpu.models import get_model

    ap = argparse.ArgumentParser(description="cnn_tpu serving-artifact export")
    ap.add_argument("src", help=".ckpt or reference .model checkpoint")
    ap.add_argument("dst", help="output artifact path (.ctsa)")
    ap.add_argument("--name", default="alexnet")
    ap.add_argument("--num-classes", type=int, default=3)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch-norm", type=lambda s: s.lower() in ("1", "true"),
                    default=False, help="for .model imports of BN nets")
    ap.add_argument("--compute-dtype", default=None,
                    choices=[None, "float32", "bfloat16"])
    ap.add_argument("--int8", nargs="+", metavar="IMG", default=None,
                    help="calibration images; exports the int8 graph")
    ap.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    ap.add_argument("--class-names", nargs="+", default=None)
    ap.add_argument("--use-ema", action="store_true",
                    help="export the EMA weights from an --ema training run")
    args = ap.parse_args(argv)

    kwargs = {"num_classes": args.num_classes,
              "image_size": args.image_size}
    if args.name == "alexnet":
        kwargs["batch_norm"] = args.batch_norm
    model = get_model(args.name, **kwargs)
    params, state = _load(args.src, model, use_ema=args.use_ema)
    calib = (_read_calib(args.int8, model.image_size)
             if args.int8 else None)
    names = args.class_names or (
        DEFAULT_CLASSES if args.num_classes == 3 else None)
    meta = export_serving_artifact(
        model, params, state, args.dst,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
        else (jnp.float32 if args.compute_dtype == "float32" else None),
        int8_calib=calib, platforms=tuple(args.platforms),
        class_names=names)
    size = os.path.getsize(args.dst)
    print(f"exported {args.src} -> {args.dst} "
          f"({size/1e6:.2f} MB, platforms={meta['platforms']}, "
          f"int8={meta['int8']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
