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


def _slice_block(tree, i: int):
    """Block ``i``'s params/state slice of a stacked ``[L, ...]`` pytree."""
    return jax.tree.map(lambda a: a[i], tree)


def _apply_layers(layers, params, state, h):
    for l in layers:
        h, _ = l.apply(params.get(l.name), (state or {}).get(l.name), h,
                       train=False)
    return h


def parse_layer_path(model, layer_path: str):
    """Validate a capture path against ``model``; raises ValueError.

    Accepted forms: a top-level layer name ('conv_layer_3'), or a position
    inside a scanned StackedBlocks trunk: 'trunk/block_<i>' (the block's
    output) or 'trunk/block_<i>/<body_layer>' (an activation inside the
    block's body, e.g. 'trunk/block_3/b_conv1').
    """
    from cnn_tpu.nn.module import ResidualBlock, StackedBlocks
    names = [l.name for l in model.net.layers]
    parts = layer_path.split("/")
    if parts[0] not in names:
        raise ValueError(f"layer '{parts[0]}' not in model; "
                         f"choose one of: {', '.join(names)}")
    if len(parts) == 1:
        return (parts[0], None, None)
    trunk = model.net[parts[0]]
    if not isinstance(trunk, StackedBlocks):
        raise ValueError(f"'{parts[0]}' is not a scanned trunk; nested "
                         "paths address StackedBlocks layers only")
    if len(parts) > 3 or not parts[1].startswith("block_"):
        raise ValueError(f"bad trunk path '{layer_path}' (want "
                         f"'{parts[0]}/block_<i>[/<body_layer>]')")
    i = int(parts[1].split("_")[-1])
    if not 0 <= i < trunk.n_blocks:
        raise ValueError(f"block index {i} out of range "
                         f"[0, {trunk.n_blocks})")
    sub = parts[2] if len(parts) == 3 else None
    if sub is not None:
        if not isinstance(trunk.block, ResidualBlock):
            raise ValueError("body-layer capture needs a ResidualBlock "
                             f"trunk block, got {type(trunk.block).__name__}")
        body_names = [l.name for l in trunk.block.body.layers]
        if sub not in body_names:
            raise ValueError(f"'{sub}' not in the trunk block's body; "
                             f"choose one of: {', '.join(body_names)}")
    return (parts[0], i, sub)


def _forward_with_capture(model, params, state, x, layer_path: str):
    """Forward with activation capture at ``layer_path``.

    Returns ``(logits, fmap, resume)`` where ``resume(act)`` replays the
    network tail from the capture point (the canonical Grad-CAM weights
    are ``jax.grad`` of ``resume(act)[0, class]``).

    A plain layer name captures that top-level layer's output (the
    reference's only capability, alexnet.cpp:95-142 — its model is a flat
    list). A 'trunk/block_<i>[/<body_layer>]' path captures INSIDE a
    scanned StackedBlocks trunk: the scan is unrolled at the requested
    index so per-block conv activations of deep trunks (pipecnn) are
    addressable — the r3 verdict's Grad-CAM gap.
    """
    name, i, sub = parse_layer_path(model, layer_path)
    layers = list(model.net.layers)
    names = [l.name for l in layers]

    if i is None:  # top-level capture: the original flat-model path
        logits, _, captured = model.apply(params, state, x, train=False,
                                          capture=(name,))
        fmap = captured[name]
        after = layers[names.index(name) + 1:]

        def resume(act):
            return _apply_layers(after, params, state, act)

        return logits, fmap, resume

    trunk = model.net[name]
    ti = names.index(name)
    h = _apply_layers(layers[:ti], params, state, x)
    tp, tst = params[name], (state or {}).get(name)
    for j in range(i):
        h, _ = trunk.block.apply(
            _slice_block(tp, j), _slice_block(tst, j) if tst else None, h,
            train=False)
    block_in = h
    bp = _slice_block(tp, i)
    bs = _slice_block(tst, i) if tst else None
    tail = layers[ti + 1:]

    def finish_blocks(hh, start):
        for j in range(start, trunk.n_blocks):
            hh, _ = trunk.block.apply(
                _slice_block(tp, j), _slice_block(tst, j) if tst else None,
                hh, train=False)
        return _apply_layers(tail, params, state, hh)

    if sub is None:  # the block's output
        fmap, _ = trunk.block.apply(bp, bs, block_in, train=False)

        def resume(act):
            return finish_blocks(act, i + 1)
    else:  # an activation inside the block's body
        block = trunk.block
        body = list(block.body.layers)
        k = [l.name for l in body].index(sub)
        body_p, body_s = bp["body"], (bs or {}).get("body")
        fmap = _apply_layers(body[:k + 1], body_p, body_s, block_in)

        def resume(act):
            y = _apply_layers(body[k + 1:], body_p, body_s, act)
            if block.proj is not None:
                sc, _ = block.proj.apply(bp["proj"], None, block_in,
                                         train=False)
            else:
                sc = block_in
            return finish_blocks(block.combine(y, sc), i + 1)

    return resume(fmap), fmap, resume


def compute_cam(model, params, state, x: jnp.ndarray, layer_name: str,
                mode: str = "gradcam", class_idx: int | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Returns (cam [H,W] in 0..1, probs [C]) for a single image [1,H,W,C].

    ``layer_name`` may address a top-level layer or a position inside a
    scanned trunk — see ``_forward_with_capture``.
    """
    logits, fmap, resume = _forward_with_capture(model, params, state, x,
                                                 layer_name)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0]

    if mode == "reference":
        # weights = spatial mean of ACTIVATIONS (alexnet.cpp:105-119)
        weights = jnp.mean(fmap[0], axis=(0, 1))
    elif mode == "gradcam":
        k = int(jnp.argmax(probs)) if class_idx is None else class_idx
        # replay the network tail from the captured activation, so the
        # grad is d score[k] / d fmap (canonical Grad-CAM weights)
        grads = jax.grad(lambda act: resume(act)[0, k])(fmap)
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
                    help="capture layer: a top-level name (block_4 for "
                         "resnet10), or inside a scanned trunk: "
                         "trunk/block_3 or trunk/block_3/b_conv1 (pipecnn)")
    ap.add_argument("--mode", default="gradcam", choices=["gradcam", "reference"])
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--output-dir", default="output")
    ap.add_argument("--batch-norm", action="store_true",
                    help="checkpoint was trained with BatchNorm layers")
    ap.add_argument("--width", type=int, default=0,
                    help="trunk width (pipecnn checkpoints; 0 = family default)")
    ap.add_argument("--n-blocks", type=int, default=0,
                    help="trunk depth (pipecnn checkpoints; 0 = family default)")
    args = ap.parse_args(argv)
    categories = args.categories.split(",")

    kwargs = {}
    if args.width:
        kwargs["width"] = args.width
    if args.n_blocks:
        kwargs["n_blocks"] = args.n_blocks
    model = get_model(args.model, num_classes=len(categories),
                      image_size=args.image_size, batch_norm=args.batch_norm,
                      **kwargs)
    try:
        parse_layer_path(model, args.layer)
    except ValueError as e:
        ap.error(f"--layer '{args.layer}': {e}")
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
