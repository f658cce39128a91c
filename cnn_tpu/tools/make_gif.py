"""Assemble PNGs into a GIF — parity with the reference's only Python
utility (``cpu/output/ppt/make_gif.py``): it globbed a directory of frames,
resized them to a common size, and wrote an animated GIF for the docs.

Usage: python -m cnn_tpu.tools.make_gif <frames_dir> <out.gif> [--fps 2]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="frames -> GIF")
    ap.add_argument("frames_dir")
    ap.add_argument("out_gif")
    ap.add_argument("--fps", type=float, default=2.0)
    ap.add_argument("--size", type=int, default=0, help="resize frames to NxN")
    args = ap.parse_args(argv)

    import cv2
    import imageio

    frames = sorted(glob.glob(os.path.join(args.frames_dir, "*.png")) +
                    glob.glob(os.path.join(args.frames_dir, "*.jpg")))
    if not frames:
        print(f"no frames in {args.frames_dir}")
        return 1
    images = []
    for f in frames:
        img = cv2.imread(f)
        if img is None:
            continue
        if args.size:
            img = cv2.resize(img, (args.size, args.size))
        images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    imageio.mimsave(args.out_gif, images, fps=args.fps)
    print(f"wrote {args.out_gif} ({len(images)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
