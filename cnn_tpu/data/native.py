"""ctypes binding to the native C++ data loader (csrc/dataloader.cpp).

The reference's data path is C++/OpenCV (``pipeline.cpp``); this is its
TPU-framework equivalent: a multithreaded C++ decode+resize engine exposed
through a C ABI (no pybind11 in this image). Built by ``csrc/build.sh`` to
``build/libcnn_data.so``. The Python loader falls back gracefully when the
library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "build", "libcnn_data.so"),
    "/root/repo/build/libcnn_data.so",
]


def _find_lib():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            return p
    raise FileNotFoundError("libcnn_data.so not built (run csrc/build.sh)")


class NativeLoader:
    """Decode + bilinear-resize one image to HxWx3 uint8 BGR, in C++."""

    def __init__(self, image_size: int):
        lib = ctypes.CDLL(_find_lib())
        lib.cnn_decode_resize.restype = ctypes.c_int
        lib.cnn_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.cnn_load_batch.restype = ctypes.c_int
        lib.cnn_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        self._lib = lib
        self.image_size = image_size

    def load(self, path: str) -> np.ndarray | None:
        s = self.image_size
        out = np.empty((s, s, 3), np.uint8)
        ok = self._lib.cnn_decode_resize(
            path.encode(), s, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out if ok == 0 else None

    def load_batch(self, paths: list[str], num_threads: int = 4) -> np.ndarray | None:
        s = self.image_size
        n = len(paths)
        out = np.empty((n, s, s, 3), np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        ok = self._lib.cnn_load_batch(
            arr, n, s, num_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out if ok == 0 else None
