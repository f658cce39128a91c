"""AOT serving artifacts: the compiled inference program as one file.

The reference deploys by shipping a weights file plus the C++ binary that
rebuilds the graph around it (``inference.cpp:32-35`` hard-codes the
architecture; the ``.model`` file is meaningless without that exact
source). The TPU-native deployment story inverts this: ``jax.export``
serializes the *lowered program itself* (StableHLO) with the weights
embedded as constants, so the serving host needs no model class, no
checkpoint importer, not even this package — just ``jax`` and the
artifact file.

Properties:
- **one artifact, any batch size** — the batch dimension is exported
  symbolically (shape-polymorphic StableHLO); the runtime refines and
  compiles per concrete shape on first use, so the serving engine's
  bucket logic still applies but the file does not bake in a batch size;
- **multi-platform** — lowered for both ``tpu`` and ``cpu`` by default,
  so the same file serves on a chip and in a CPU CI job;
- **quantization-transparent** — pass ``int8_calib`` and the artifact
  contains the BN-folded int8 graph (``cnn_tpu/quant.py``); the consumer
  cannot tell, the interface stays ``uint8 images -> (labels, probs)``.

File format: ``b"CTSA"`` magic, u32 little-endian JSON-header length, the
JSON header (class names, image size, platforms, int8 flag), then the
``jax.export`` payload. Everything after the header is opaque to us and
versioned by jax's own calling-convention machinery.
"""

from __future__ import annotations

import json
import struct

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"CTSA"


def _serving_fn(model, params, state, *, compute_dtype=None,
                int8_calib=None):
    """Close params over a pure uint8-images -> (labels, probs) function.

    Embedding the weights as constants is deliberate here (unlike the
    train path, where closure capture is a pitfall): the artifact must be
    self-contained.
    """
    if int8_calib is not None:
        from cnn_tpu.quant import quantize_int8, quantized_apply
        qmodel, qparams = quantize_int8(model, params, state, int8_calib)

        def forward(images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            logits = quantized_apply(qmodel, qparams, x)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        return forward

    def forward(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        logits, _, _ = model.apply(params, state, x, train=False,
                                   compute_dtype=compute_dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(probs, axis=-1), probs

    return forward


def export_serving_artifact(model, params, state, path: str, *,
                            compute_dtype=None, int8_calib=None,
                            platforms=("tpu", "cpu"),
                            class_names=None) -> dict:
    """Serialize the full inference program for ``model`` to ``path``.

    Returns the artifact's metadata header (also written into the file).
    """
    from jax import export as jexp

    fwd = _serving_fn(model, params, state, compute_dtype=compute_dtype,
                      int8_calib=int8_calib)
    (b,) = jexp.symbolic_shape("b")
    s = model.image_size
    spec = jax.ShapeDtypeStruct((b, s, s, 3), jnp.uint8)
    exp = jexp.export(jax.jit(fwd), platforms=tuple(platforms))(spec)
    payload = exp.serialize()

    meta = {
        "format": "cnn_tpu-serving-artifact",
        "version": 1,
        "image_size": int(s),
        "num_classes": int(getattr(model, "num_classes", 0)) or None,
        "class_names": list(class_names) if class_names else None,
        "platforms": list(platforms),
        "int8": int8_calib is not None,
        "compute_dtype": str(np.dtype(compute_dtype).name)
        if compute_dtype is not None else None,
    }
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(payload)
    return meta


class ServingArtifact:
    """A deserialized serving program: ``uint8 [N,H,W,3] -> (labels, probs)``.

    Needs only jax — no model classes, no checkpoint files. Each distinct
    batch size compiles once on first call (shape-polymorphic program);
    pad to fixed buckets for latency-critical serving (the TCP server and
    ``InferenceEngine`` already do).
    """

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self._exported = exported

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        from jax import export as jexp

        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != _MAGIC:
                raise ValueError(f"{path}: not a cnn_tpu serving artifact "
                                 f"(magic {magic!r})")
            (hlen,) = struct.unpack("<I", f.read(4))
            meta = json.loads(f.read(hlen).decode())
            payload = f.read()
        return cls(meta, jexp.deserialize(payload))

    @property
    def image_size(self) -> int:
        return self.meta["image_size"]

    def __call__(self, images_u8) -> tuple[np.ndarray, np.ndarray]:
        labels, probs = self._exported.call(jnp.asarray(images_u8))
        return labels, probs

    def predict(self, images_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        labels, probs = self(images_u8)
        return np.asarray(labels), np.asarray(probs)
