"""Production inference engine.

The reference's inference path recompiles nothing (it's interpreted C++),
but pays full model cost per image on the CPU (~30 ms, BASELINE.md). Here:
an AOT-compiled engine with static shape buckets — requests of any batch
size are padded up to the nearest compiled bucket (XLA requires static
shapes; compiling per odd size would stall serving), executed in one
launch, and the padding discarded. Weights live on-device once.

Usage:
    engine = InferenceEngine(model, params, state, buckets=(1, 8, 64))
    engine.warmup()
    labels, probs = engine.predict(images_uint8)   # [N,H,W,C] BGR uint8
"""

from __future__ import annotations

import bisect
import queue
import threading
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np


class InferenceEngine:
    def __init__(self, model, params, state, buckets=(1, 8, 64),
                 compute_dtype=None, int8_calib=None):
        """``int8_calib``: a [N,H,W,3] uint8 batch of representative images
        switches the engine to the post-training-quantized graph
        (cnn_tpu/quant.py): BatchNorm folded away, every conv/dense running
        s8 x s8 -> s32 on the MXU with calibrated activation scales."""
        self._quantized = int8_calib is not None
        self._artifact = None
        if self._quantized:
            from cnn_tpu.quant import quantize_int8
            model, params = quantize_int8(model, params, state, int8_calib)
            state = {}
        self.model = model
        self.params = jax.device_put(params)
        self.state = jax.device_put(state)
        self.buckets = tuple(sorted(buckets))
        self.compute_dtype = compute_dtype
        self._compiled: dict[int, object] = {}

    @classmethod
    def from_artifact(cls, artifact, buckets=(1, 8, 64)) -> "InferenceEngine":
        """Serve a pre-exported program (``cnn_tpu/export.py``): the weights
        and the graph live inside the artifact, so no model class or
        checkpoint is involved — the engine only supplies bucketing,
        streaming, and micro-batching around ``Exported.call`` (which jax
        traces like any other computation, so the AOT bucket compiles
        below still apply)."""
        eng = cls.__new__(cls)
        eng._quantized = bool(artifact.meta.get("int8"))
        eng._artifact = artifact
        eng.model = artifact          # only .image_size is used
        eng.params = {}
        eng.state = {}
        eng.buckets = tuple(sorted(buckets))
        eng.compute_dtype = None
        eng._compiled = {}
        return eng

    def _fn(self):
        model, compute_dtype = self.model, self.compute_dtype

        if self._artifact is not None:
            exported = self._artifact

            def forward(params, state, images_u8):
                del params, state
                return exported(images_u8)

            return forward

        if self._quantized:
            from cnn_tpu.quant import quantized_apply

            def forward(qparams, state, images_u8):
                del state
                x = images_u8.astype(jnp.float32) / 255.0
                logits = quantized_apply(model, qparams, x)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.argmax(probs, axis=-1), probs

            return forward

        def forward(params, state, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            logits, _, _ = model.apply(params, state, x, train=False,
                                       compute_dtype=compute_dtype)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        return forward

    def _get_compiled(self, bucket: int):
        if bucket not in self._compiled:
            s = self.model.image_size
            example = jax.ShapeDtypeStruct((bucket, s, s, 3), jnp.uint8)
            lowered = jax.jit(self._fn()).lower(self.params, self.state, example)
            self._compiled[bucket] = lowered.compile()
        return self._compiled[bucket]

    def warmup(self) -> None:
        """AOT-compile every bucket up front (first compile is ~20-40 s),
        then execute ONE throwaway batch and block on its result: the first
        execution after an AOT compile can stall for minutes while the
        remote compile helper drains its queue, and that stall must land
        here — not on the first real request, which (in the TCP server)
        carries a client-facing timeout."""
        for b in self.buckets:
            self._get_compiled(b)
        s = self.model.image_size
        self.predict(np.zeros((1, s, s, 3), np.uint8))

    def predict(self, images_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """[N,H,W,3] uint8 -> (labels [N] int, probs [N,C] f32)."""
        n = images_u8.shape[0]
        assert n >= 1
        idx = bisect.bisect_left(self.buckets, n)
        labels_out, probs_out = [], []
        pos = 0
        if idx >= len(self.buckets):           # larger than the top bucket:
            top = self.buckets[-1]             # stream full top-sized chunks
            while n - pos >= top:
                l, p = self._run(self.buckets[-1], images_u8[pos:pos + top])
                labels_out.append(l)
                probs_out.append(p)
                pos += top
        if pos < n:                            # remainder -> smallest bucket >= rem
            rem = n - pos
            b = self.buckets[min(bisect.bisect_left(self.buckets, rem),
                                 len(self.buckets) - 1)]
            l, p = self._run(b, images_u8[pos:])
            labels_out.append(l[:rem])
            probs_out.append(p[:rem])
        return (np.concatenate(labels_out), np.concatenate(probs_out))

    def predict_stream(self, images_iter, depth: int = 8):
        """Pipelined request stream: dispatch each request WITHOUT blocking,
        start its device->host copy asynchronously, and only materialize a
        result once ``depth`` requests are in flight. Steady-state per-image
        latency is then bounded by max(dispatch, compute, link throughput)
        instead of the full blocking round trip per request — on tunneled
        setups the blocking path pays a ~30 ms RPC per fetch that this
        overlaps. Yields (label int, probs [C]) in submission order.
        """
        from collections import deque

        inflight: deque = deque()

        def drain_one():
            labels, probs = inflight.popleft()
            return int(np.asarray(labels)[0]), np.asarray(probs)[0]

        # smallest CONFIGURED bucket, padded: warmup() has already compiled
        # and first-executed it — a hard-coded bucket 1 would AOT-compile
        # (plus the minutes-long first-execute stall) on the first real
        # streamed request whenever 1 is not in self.buckets
        b = self.buckets[0]
        compiled = self._get_compiled(b)
        shape = (b,) + (self.model.image_size,) * 2 + (3,)
        for img in images_iter:
            # a FRESH buffer per request: jax caches host->device transfers
            # by array identity, so mutating one reused buffer would serve
            # every request the last image's pixels
            batch = np.zeros(shape, np.uint8)
            batch[0] = img
            out = compiled(self.params, self.state, jnp.asarray(batch))
            for a in out:
                try:
                    a.copy_to_host_async()
                except Exception:  # backends without async D2H
                    pass
            inflight.append(out)
            if len(inflight) >= depth:
                yield drain_one()
        while inflight:
            yield drain_one()

    def _run(self, bucket: int, chunk: np.ndarray):
        rem = chunk.shape[0]
        assert rem <= bucket, (rem, bucket)
        if rem < bucket:
            pad = np.zeros((bucket - rem, *chunk.shape[1:]), chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        compiled = self._get_compiled(bucket)
        labels, probs = compiled(self.params, self.state, jnp.asarray(chunk))
        return np.asarray(labels)[:rem], np.asarray(probs)[:rem]


class BatchingServer:
    """Dynamic micro-batching on top of an ``InferenceEngine``.

    The standard online-serving pattern: callers ``submit(image)`` from any
    thread and get a ``Future``; one worker thread drains the queue, groups
    up to ``max_batch`` requests that arrive within ``batch_timeout_ms`` of
    the first, runs ONE padded engine call, and resolves each future. Per-
    request latency is bounded by timeout + one batched forward; throughput
    approaches batched inference (~82k img/s at bs=256 on one v5e) instead
    of one forward per request.

    Usage:
        with BatchingServer(engine, batch_timeout_ms=2.0) as srv:
            fut = srv.submit(image_u8)          # [H,W,3] uint8
            label, probs = fut.result()
    """

    _STOP = object()

    def __init__(self, engine: InferenceEngine, max_batch: int | None = None,
                 batch_timeout_ms: float = 2.0):
        self.engine = engine
        self.max_batch = max_batch or engine.buckets[-1]
        self.timeout = batch_timeout_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._worker: threading.Thread | None = None

    def start(self) -> "BatchingServer":
        assert self._worker is None, "already started"
        self.engine.warmup()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        return self

    def stop(self) -> None:
        if self._worker is not None:
            self._q.put(self._STOP)
            self._worker.join()
            self._worker = None

    __enter__ = start

    def __exit__(self, *exc):
        self.stop()

    def submit(self, image_u8: np.ndarray) -> Future:
        assert self._worker is not None, "server not started"
        fut: Future = Future()
        self._q.put((image_u8, fut))
        return fut

    def _run(self) -> None:
        import time

        while True:
            item = self._q.get()
            if item is self._STOP:
                return
            batch = [item]
            deadline = time.monotonic() + self.timeout
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    nxt = self._q.get(timeout=max(remaining, 0.0))
                except queue.Empty:
                    break
                if nxt is self._STOP:
                    self._flush(batch)
                    return
                batch.append(nxt)
            self._flush(batch)

    def _flush(self, batch) -> None:
        try:
            # np.stack INSIDE the try: a single malformed-shape submit must
            # fail its window's futures, not kill the worker thread (which
            # would hang every later fut.result() forever)
            imgs = np.stack([b[0] for b in batch])
            labels, probs = self.engine.predict(imgs)
        except Exception as e:                      # surface, don't hang
            for _, fut in batch:
                fut.set_exception(e)
            return
        for i, (_, fut) in enumerate(batch):
            fut.set_result((int(labels[i]), probs[i]))
