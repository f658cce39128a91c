"""Image augmentation.

Reference (``pipeline.cpp:40-77``, config at ``pipeline.h:34``): four ops —
hflip(p=.5), vflip(p=.2), crop(p=.7, keep-ratio 0.7 + U(0,0.25), uniform
position), rotate(p=.5, angle U(15,75) with random sign, expand-canvas
warpAffine) — applied in *shuffled order* on the decoded ``cv::Mat`` before
the final resize. An op fires when ``U(0,1) >= 1 - p``.

This reimplements the same distributions with one NumPy generator (the
reference uses four independent seeded C++ engines whose streams can't be
reproduced — core/rng.py note).
"""

from __future__ import annotations

import cv2
import numpy as np


def rotate_expand(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate without cropping (expand canvas) — reference pipeline.cpp:23-33."""
    h, w = img.shape[:2]
    center = ((w - 1) / 2.0, (h - 1) / 2.0)
    rot = cv2.getRotationMatrix2D(center, angle_deg, 1.0)
    cos, sin = abs(rot[0, 0]), abs(rot[0, 1])
    new_w = int(h * sin + w * cos)
    new_h = int(h * cos + w * sin)
    rot[0, 2] += new_w / 2.0 - w / 2.0
    rot[1, 2] += new_h / 2.0 - h / 2.0
    return cv2.warpAffine(img, rot, (new_w, new_h))


class ImageAugmentor:
    DEFAULT_OPS = (("hflip", 0.5), ("vflip", 0.2), ("crop", 0.7), ("rotate", 0.5))

    def __init__(self, ops=DEFAULT_OPS, seed: int = 212):
        self.ops = list(ops)
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: np.ndarray,
                 rng: np.random.Generator | None = None) -> np.ndarray:
        """Augment one image. Pass ``rng`` for thread-safe deterministic use
        (the loader derives one per (seed, epoch, sample))."""
        rng = rng if rng is not None else self.rng
        order = rng.permutation(len(self.ops))
        for idx in order:
            name, p = self.ops[idx]
            if rng.uniform() < 1.0 - p:
                continue
            if name == "hflip":
                img = img[:, ::-1]
            elif name == "vflip":
                img = img[::-1]
            elif name == "crop":
                h, w = img.shape[:2]
                ratio = 0.7 + rng.uniform(0.0, 0.25)
                ch, cw = int(h * ratio), int(w * ratio)
                y0 = rng.integers(0, h - ch + 1)
                x0 = rng.integers(0, w - cw + 1)
                img = img[y0:y0 + ch, x0:x0 + cw]
            elif name == "rotate":
                angle = rng.uniform(15.0, 75.0)
                if rng.integers(1, 11) & 1:
                    angle = -angle
                img = rotate_expand(np.ascontiguousarray(img), angle)
            else:
                raise ValueError(f"unknown augment op '{name}'")
        return img
