"""Single-image inference CLI — the reference's ``inference`` binary
(``cpu/src/inference.cpp``): load checkpoint, per image decode -> resize ->
forward -> softmax -> argmax -> print class + prob. Accepts either a native
``.ckpt`` or a reference ``.model`` file. Also reports p50 latency (one of
the BASELINE.json configs).

Usage:
  python -m cnn_tpu.tools.infer --checkpoint path.[ckpt|model] img1 [img2 ...]
"""

from __future__ import annotations

import argparse
import sys
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu.models import get_model
from cnn_tpu.parallel import make_forward
from cnn_tpu.utils.checkpoint import import_reference_model, load_checkpoint

DEFAULT_CKPT = ("/root/reference/cpu/checkpoints/AlexNet_aug_1e-3/"
                "iter_395000_train_0.918_valid_0.913.model")
DEFAULT_IMAGES = [
    "/root/reference/datasets/images/dog.jpg",
    "/root/reference/datasets/images/panda.jpg",
    "/root/reference/datasets/images/bird.jpg",
]


def load_params(checkpoint: str, model, use_ema: bool = False):
    """``use_ema``: serve the EMA weights a ``--ema`` training run tracked
    in its optimizer state (cnn_tpu/optim.py ``with_ema``)."""
    if checkpoint.endswith(".model"):
        return import_reference_model(checkpoint, model.net)
    ts = load_checkpoint(checkpoint)
    if use_ema:
        from cnn_tpu.optim import ema_model_state, ema_params
        ema = ema_params(ts.opt_state)
        if ema is None:
            raise ValueError(f"{checkpoint} has no EMA state "
                             "(trained without --ema)")
        return ema, ema_model_state(ts.opt_state, ts.state)
    return ts.params, ts.state


def main(argv=None):
    ap = argparse.ArgumentParser(description="cnn_tpu inference")
    ap.add_argument("images", nargs="*", default=DEFAULT_IMAGES)
    ap.add_argument("--checkpoint", default=DEFAULT_CKPT)
    ap.add_argument("--categories", default="dog,panda,bird")
    ap.add_argument("--model", default="alexnet",
                    help="model family (alexnet | vgg8 | resnet10 | ...)")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch-norm", action="store_true",
                    help="checkpoint was trained with BatchNorm layers")
    ap.add_argument("--bench", action="store_true", help="report p50 latency")
    ap.add_argument("--use-ema", action="store_true",
                    help="use the EMA weights from an --ema training run")
    args = ap.parse_args(argv)
    categories = args.categories.split(",")

    model = get_model(args.model, num_classes=len(categories),
                      image_size=args.image_size, batch_norm=args.batch_norm)
    params, state = load_params(args.checkpoint, model, use_ema=args.use_ema)
    fwd = make_forward(model)

    images = args.images or DEFAULT_IMAGES
    for path in images:
        img = cv2.imread(path)
        if img is None:
            print(f"Failed to read image file  {path}")
            continue
        img = cv2.resize(img, (args.image_size, args.image_size))
        x = jnp.asarray(img[None])  # uint8; normalized on device
        probs = np.asarray(fwd(params, state, x))[0]
        k = int(probs.argmax())
        print(f"{path}===> [classification: {categories[k]}] [prob: {probs[k]:.6f}]")

        if args.bench:
            lat = []
            for _ in range(50):
                t0 = time.perf_counter()
                jax.block_until_ready(fwd(params, state, x))
                lat.append(time.perf_counter() - t0)
            print(f"  p50 latency: {1e3 * float(np.percentile(lat, 50)):.3f} ms "
                  f"(p90 {1e3 * float(np.percentile(lat, 90)):.3f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
