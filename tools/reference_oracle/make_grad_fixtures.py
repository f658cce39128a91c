"""Convert grad_dump raw output into tests/fixtures/grad_parity*.npz.

Like make_fixtures.py, the batch images are stored as resized uint8 BGR
(the reference tensor is exactly those bytes / 255, data_format.cpp:13-23)
after verifying Python cv2 byte-matches the C++ build. The three weight
snapshots (before / after update_gradients(1.0) / after the real lr=1e-3
SGD step) are stored as raw little-endian f32 vectors in the reference
.model layout — the test imports them through the same layout converter
the parity suite already trusts.

usage: make_grad_fixtures.py <raw_dir> <out.npz>
"""

import os
import sys

import cv2
import numpy as np

RAW = sys.argv[1]
OUT = sys.argv[2]

data = {}
images, labels = [], []
with open(os.path.join(RAW, "manifest.txt")) as f:
    for line in f:
        stem, path, label = line.split()
        img = cv2.resize(cv2.imread(path), (224, 224))
        chw = np.fromfile(os.path.join(RAW, f"input_{stem}.f32"),
                          "<f4").reshape(3, 224, 224)
        rebuilt = (img.astype(np.float32) / 255.0).transpose(2, 0, 1)
        dev = np.abs(rebuilt - chw).max()
        print(f"{path}: preprocess max dev = {dev:.2e}")
        assert dev == 0.0, "cv2 python does not byte-match the C++ build"
        images.append(img)
        labels.append(int(label))

data["images_u8"] = np.stack(images)            # [B,224,224,3] BGR
data["labels"] = np.asarray(labels, np.int32)
data["logits"] = np.fromfile(os.path.join(RAW, "logits.f32"),
                             "<f4").reshape(len(labels), -1)
data["loss"] = np.fromfile(os.path.join(RAW, "loss.f32"), "<f4")[0]
for snap in ("before", "after_lr1", "after_sgd"):
    data[snap] = np.fromfile(os.path.join(RAW, f"{snap}.model"), "<f4")

os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **data)
print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB)")
