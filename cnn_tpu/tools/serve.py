"""Serving CLI — stream image paths (stdin or args) through the AOT engine.

The reference's interactive loop (``inference.cpp:53-72``) reloads and runs
one image at a time on the CPU; this drives ``serving.InferenceEngine``
either in pipelined streaming mode (``--stream``, overlapped dispatch) or
through the dynamic micro-batching ``BatchingServer`` (default), printing
one ``path<TAB>label<TAB>prob`` line per request.

Usage:
    python -m cnn_tpu.tools.serve img1.jpg img2.jpg ...
    find dir/ -name '*.jpg' | python -m cnn_tpu.tools.serve --checkpoint ck
"""

from __future__ import annotations

import argparse
import sys

import cv2
import numpy as np

from cnn_tpu.models import get_model
from cnn_tpu.serving import BatchingServer, InferenceEngine
from cnn_tpu.tools.infer import DEFAULT_CKPT, load_params


def _read(path: str, size: int):
    img = cv2.imread(path)
    if img is None:
        return None
    return cv2.resize(img, (size, size))


def main(argv=None):
    ap = argparse.ArgumentParser(description="cnn_tpu serving")
    ap.add_argument("images", nargs="*",
                    help="image paths ('-' or empty: read paths from stdin)")
    ap.add_argument("--checkpoint", default=DEFAULT_CKPT)
    ap.add_argument("--categories", default="dog,panda,bird")
    ap.add_argument("--model", default="alexnet")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch-norm", action="store_true")
    ap.add_argument("--stream", action="store_true",
                    help="pipelined single-request streaming instead of "
                         "micro-batching")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--batch-timeout-ms", type=float, default=2.0)
    ap.add_argument("--int8", action="store_true",
                    help="serve the post-training-quantized graph (BN "
                         "folded, s8 matmuls on the MXU); the request "
                         "images themselves calibrate activation scales")
    args = ap.parse_args(argv)
    categories = args.categories.split(",")

    model = get_model(args.model, num_classes=len(categories),
                      image_size=args.image_size, batch_norm=args.batch_norm)
    params, state = load_params(args.checkpoint, model)
    buckets = (1,) if args.stream else (1, 8, args.max_batch)

    paths = args.images
    if not paths or paths == ["-"]:
        paths = [line.strip() for line in sys.stdin if line.strip()]
    loaded = [(p, _read(p, args.image_size)) for p in paths]
    for p, img in loaded:
        if img is None:
            print(f"{p}\tERROR\tunreadable", flush=True)
    loaded = [(p, img) for p, img in loaded if img is not None]

    int8_calib = None
    if args.int8 and loaded:
        int8_calib = np.stack([img for _, img in loaded[:64]])
    engine = InferenceEngine(model, params, state, buckets=buckets,
                             int8_calib=int8_calib)

    def emit(path, label, probs):
        print(f"{path}\t{categories[label]}\t{probs[label]:.6f}", flush=True)

    if args.stream:
        engine.warmup()
        results = engine.predict_stream((img for _, img in loaded))
        for (path, _), (label, probs) in zip(loaded, results):
            emit(path, label, probs)
    else:
        with BatchingServer(engine, max_batch=args.max_batch,
                            batch_timeout_ms=args.batch_timeout_ms) as srv:
            futs = [(path, srv.submit(img)) for path, img in loaded]
            for path, fut in futs:
                label, probs = fut.result()
                emit(path, label, probs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
