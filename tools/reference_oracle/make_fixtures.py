"""Convert fixture_gen raw dumps into tests/fixtures/reference_parity.npz.

Stores the *resized uint8 BGR images* instead of the f32 tensors: the
reference's tensor is exactly ``uint8 / 255`` of those bytes
(data_format.cpp:13-23), so the f32 input reconstructs losslessly and the
archive stays small. Also cross-checks that Python cv2's imread+resize
byte-matches the C++ OpenCV build that produced the dumps (the 'bit-level
preprocessing parity' hazard in SURVEY.md §7).
"""

import os
import sys

import cv2
import numpy as np

RAW = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/build/fixtures_raw"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tests/fixtures/reference_parity.npz"

entries = {}
images = []
with open(os.path.join(RAW, "manifest.txt")) as f:
    for line in f:
        stem, path, argmax = line.split()[:3]
        images.append((stem, path, int(argmax)))

data = {}
names = []
for stem, path, argmax in images:
    # reference preprocessing in C++: imread (BGR) -> resize 224 bilinear
    img = cv2.resize(cv2.imread(path), (224, 224))
    chw = np.fromfile(os.path.join(RAW, f"input_{stem}.f32"), "<f4").reshape(3, 224, 224)
    # reconstruct: chw[c] = img[:, :, c] / 255
    rebuilt = (img.astype(np.float32) / 255.0).transpose(2, 0, 1)
    max_dev = np.abs(rebuilt - chw).max()
    print(f"{path}: cv2-python vs C++ preprocess max dev = {max_dev:.2e}")
    assert max_dev == 0.0, "Python cv2 resize does not byte-match the C++ build"

    data[f"image_u8_{stem}"] = img
    data[f"logits_{stem}"] = np.fromfile(os.path.join(RAW, f"logits_{stem}.f32"), "<f4")
    data[f"probs_{stem}"] = np.fromfile(os.path.join(RAW, f"probs_{stem}.f32"), "<f4")
    cam = np.fromfile(os.path.join(RAW, f"gradcam_{stem}.f32"), "<f4")
    hw = int(round(len(cam) ** 0.5))
    data[f"gradcam_{stem}"] = cam.reshape(hw, hw)
    data[f"label_{stem}"] = np.int32(argmax)
    names.append(os.path.basename(path))

data["names"] = np.array(names)
data["checkpoint"] = np.array(
    "/root/reference/cpu/checkpoints/AlexNet_aug_1e-3/iter_395000_train_0.918_valid_0.913.model")
os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **data)
print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB, {len(names)} images)")
