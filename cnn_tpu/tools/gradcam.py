"""Grad-CAM CLI — the reference's ``gradCAM`` binary (``cpu/src/grad_cam.cpp``).

Two CAM modes:

- ``mode='reference'``: bit-faithful to what the C++ actually computes
  (``AlexNet::grad_cam``, alexnet.cpp:95-142): although it back-propagates a
  delta seeded with the raw logits, the propagated delta is never read —
  channel weights are the *spatial mean of the target layer's activations*.
  cam = relu(sum_o w_o * fmap_o), min-max normalized. No gradients needed.

- ``mode='gradcam'`` (default): canonical Grad-CAM (Selvaraju et al.) the
  reference *intended*: weights = spatial mean of d score[class] / d fmap,
  obtained with ``jax.grad`` through the captured activation. This is the
  north-star behavior (BASELINE.json).

The CLI post-processing mirrors grad_cam.cpp:80-94: invert (255-cam),
resize to input size, JET colormap, blend with the input, save PNG.
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu.models import get_model
from cnn_tpu.tools.infer import DEFAULT_CKPT, load_params

DEFAULT_IMAGES = [
    "/root/reference/datasets/images/dog.jpg",
    "/root/reference/datasets/images/bird_2.jpg",
    "/root/reference/datasets/images/panda.jpg",
    "/root/reference/datasets/images/dog_3.jpg",
    "/root/reference/datasets/images/panda_2.jpg",
    "/root/reference/datasets/images/bird.jpg",
]


from cnn_tpu.ops.tensor import minmax_normalize as _minmax


def compute_cam(model, params, state, x: jnp.ndarray, layer_name: str,
                mode: str = "gradcam", class_idx: int | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Returns (cam [H,W] in 0..1, probs [C]) for a single image [1,H,W,C]."""

    def forward_with_capture(xx):
        logits, _, captured = model.apply(params, state, xx, train=False,
                                          capture=(layer_name,))
        return logits, captured[layer_name]

    logits, fmap = forward_with_capture(x)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0]

    if mode == "reference":
        # weights = spatial mean of ACTIVATIONS (alexnet.cpp:105-119)
        weights = jnp.mean(fmap[0], axis=(0, 1))
    elif mode == "gradcam":
        k = int(jnp.argmax(probs)) if class_idx is None else class_idx

        def score_from_act(act):
            # replay the network tail from the captured activation, so the
            # grad is d score[k] / d fmap (canonical Grad-CAM weights)
            out = act
            seen = False
            for layer in model.net.layers:
                if seen:
                    out, _ = layer.apply(params.get(layer.name),
                                         state.get(layer.name), out,
                                         train=False)
                if layer.name == layer_name:
                    seen = True
            return out[0, k]

        grads = jax.grad(score_from_act)(fmap)
        weights = jnp.mean(grads[0], axis=(0, 1))
    else:
        raise ValueError(f"unknown CAM mode '{mode}'")

    cam = jax.nn.relu(jnp.sum(fmap[0] * weights, axis=-1))
    cam = _minmax(cam)
    return np.asarray(cam, np.float32), np.asarray(probs, np.float32)


def render_heatmap(img_bgr: np.ndarray, cam01: np.ndarray) -> np.ndarray:
    """grad_cam.cpp:80-94 post-processing: invert, resize, JET, blend."""
    cam_u8 = np.uint8(np.clip(255 * cam01, 0, 255))
    cam_u8 = 255 - cam_u8
    cam_u8 = cv2.resize(cam_u8, (img_bgr.shape[1], img_bgr.shape[0]))
    heat = cv2.applyColorMap(cam_u8, cv2.COLORMAP_JET).astype(np.float32)
    blend = heat / 255.0 + img_bgr.astype(np.float32) / 255.0
    blend = blend / blend.max() * 255.0
    return blend.astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser(description="cnn_tpu Grad-CAM")
    ap.add_argument("images", nargs="*", default=DEFAULT_IMAGES)
    ap.add_argument("--checkpoint", default=DEFAULT_CKPT)
    ap.add_argument("--categories", default="dog,panda,bird")
    ap.add_argument("--model", default="alexnet",
                    help="model family (alexnet | vgg8 | resnet10 | ...)")
    ap.add_argument("--layer", default="conv_layer_3",
                    help="capture layer (e.g. block_4 for resnet10)")
    ap.add_argument("--mode", default="gradcam", choices=["gradcam", "reference"])
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--output-dir", default="output")
    ap.add_argument("--batch-norm", action="store_true",
                    help="checkpoint was trained with BatchNorm layers")
    args = ap.parse_args(argv)
    categories = args.categories.split(",")

    model = get_model(args.model, num_classes=len(categories),
                      image_size=args.image_size, batch_norm=args.batch_norm)
    layer_names = [l.name for l in model.net.layers]
    if args.layer not in layer_names:
        ap.error(f"--layer '{args.layer}' not in model '{args.model}'; "
                 f"choose one of: {', '.join(layer_names)}")
    params, state = load_params(args.checkpoint, model)
    os.makedirs(args.output_dir, exist_ok=True)

    images = args.images or DEFAULT_IMAGES
    for i, path in enumerate(images):
        img = cv2.imread(path)
        if img is None:
            print(f"Failed to read image file  {path}")
            continue
        img = cv2.resize(img, (args.image_size, args.image_size))
        x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
        cam, probs = compute_cam(model, params, state, x, args.layer, args.mode)
        k = int(probs.argmax())
        print(f"{path}===> [classification: {categories[k]}] [prob: {probs[k]:.6f}]")
        out = render_heatmap(img, cam)
        out_path = os.path.join(args.output_dir, f"{i}.png")
        cv2.imwrite(out_path, out)
        print(f"  saved {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
