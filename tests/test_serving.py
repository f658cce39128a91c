"""InferenceEngine tests (AOT buckets, padding, chunking) + remat step."""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.models import AlexNet
from cnn_tpu.parallel import create_train_state, make_train_step
from cnn_tpu.serving import InferenceEngine


def _engine(buckets=(1, 4)):
    model = AlexNet(num_classes=3, image_size=64)
    params, state = model.init(jax.random.key(0))
    return InferenceEngine(model, params, state, buckets=buckets), model


def test_predict_shapes_and_padding(rng):
    engine, _ = _engine()
    engine.warmup()
    for n in (1, 2, 3, 4, 5, 9):
        imgs = rng.integers(0, 256, (n, 64, 64, 3), dtype=np.uint8)
        labels, probs = engine.predict(imgs)
        assert labels.shape == (n,)
        assert probs.shape == (n, 3)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_padding_does_not_change_results(rng):
    engine, model = _engine(buckets=(4,))
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    labels, probs = engine.predict(imgs)
    # reference result straight through the model
    x = jnp.asarray(imgs).astype(jnp.float32) / 255.0
    logits, _, _ = model.apply(engine.params, engine.state, x)
    ref = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(probs, ref, rtol=1e-5, atol=1e-6)


def test_large_batch_chunks(rng):
    engine, _ = _engine(buckets=(1, 4))
    imgs = rng.integers(0, 256, (11, 64, 64, 3), dtype=np.uint8)
    labels, probs = engine.predict(imgs)
    assert labels.shape == (11,)
    # element-wise equal to one-at-a-time prediction
    solo = np.concatenate([engine.predict(imgs[i:i + 1])[0] for i in range(11)])
    np.testing.assert_array_equal(labels, solo)


def test_remat_train_step_matches_plain(rng):
    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)
    x = jnp.asarray(rng.random((4, 64, 64, 3)), jnp.float32)
    y = jnp.arange(4, dtype=jnp.int32) % 3

    ts1 = create_train_state(model, opt, jax.random.key(1))
    ts2 = create_train_state(model, opt, jax.random.key(1))
    out1, m1 = make_train_step(model, opt, donate=False)(ts1, x, y)
    out2, m2 = make_train_step(model, opt, donate=False, remat=True)(ts2, x, y)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out1.params),
                    jax.tree_util.tree_leaves(out2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_predict_stream_matches_blocking_path(rng):
    """Pipelined streaming returns the same results in submission order."""
    engine, _ = _engine(buckets=(1,))
    engine.warmup()
    imgs = rng.integers(0, 256, (7, 64, 64, 3), dtype=np.uint8)
    ref_labels, ref_probs = engine.predict(imgs)   # 7 single-image calls
    out = list(engine.predict_stream(iter(imgs), depth=3))
    assert len(out) == 7
    np.testing.assert_array_equal([l for l, _ in out], ref_labels)
    np.testing.assert_allclose(np.stack([p for _, p in out]), ref_probs,
                               rtol=1e-6)


def test_batching_server_groups_and_matches(rng):
    """Concurrent submissions resolve with the same results as direct
    predict; micro-batching must not mix up request order/pairing."""
    from cnn_tpu.serving import BatchingServer

    engine, _ = _engine(buckets=(1, 4, 8))
    imgs = rng.integers(0, 256, (10, 64, 64, 3), dtype=np.uint8)
    ref_labels, ref_probs = engine.predict(imgs)
    with BatchingServer(engine, batch_timeout_ms=20.0) as srv:
        futs = [srv.submit(img) for img in imgs]
        results = [f.result(timeout=60) for f in futs]
    np.testing.assert_array_equal([l for l, _ in results], ref_labels)
    np.testing.assert_allclose(np.stack([p for _, p in results]), ref_probs,
                               rtol=1e-5, atol=1e-6)


def test_batching_server_surfaces_errors():
    from cnn_tpu.serving import BatchingServer

    engine, _ = _engine(buckets=(1,))
    with BatchingServer(engine, batch_timeout_ms=1.0) as srv:
        fut = srv.submit(np.zeros((3, 3), np.uint8))   # wrong rank
        with np.testing.assert_raises(Exception):
            fut.result(timeout=60)
    # server still serves after a poisoned batch
    with BatchingServer(engine, batch_timeout_ms=1.0) as srv:
        ok = srv.submit(np.zeros((64, 64, 3), np.uint8)).result(timeout=60)
        assert ok[0] in (0, 1, 2)


def test_tcp_serving_end_to_end():
    """--listen: length-prefixed encoded images over a real socket, two
    concurrent clients sharing the micro-batching server."""
    import os
    import socket
    import struct
    import threading

    import cv2

    if not os.path.isdir("/root/reference/datasets/images"):
        import pytest
        pytest.skip("reference images absent")

    from cnn_tpu.models import get_model
    from cnn_tpu.serving import InferenceEngine
    from cnn_tpu.tools.infer import DEFAULT_CKPT, load_params
    from cnn_tpu.tools.serve import serve_tcp

    categories = ["dog", "panda", "bird"]
    model = get_model("alexnet", num_classes=3)
    params, state = load_params(DEFAULT_CKPT, model)
    engine = InferenceEngine(model, params, state, buckets=(1, 4))

    ready, stop = threading.Event(), threading.Event()
    port_out = []
    th = threading.Thread(target=serve_tcp,
                          args=(engine, 0, 224, categories, 4, 5.0,
                                ready, stop, port_out), daemon=True)
    th.start()
    assert ready.wait(timeout=120)
    port = port_out[0]  # OS-assigned: no clash with parallel runs

    def recv_exact(c, n):
        buf = b""
        while len(buf) < n:
            chunk = c.recv(n - len(buf))
            assert chunk, "server closed mid-reply"
            buf += chunk
        return buf

    def ask(path):
        with socket.create_connection(("127.0.0.1", port), timeout=60) as c:
            payload = open(path, "rb").read()
            c.sendall(struct.pack(">I", len(payload)) + payload)
            (n,) = struct.unpack(">I", recv_exact(c, 4))
            return recv_exact(c, n).decode().split("\t")

    results = {}

    def client(name):
        results[name] = ask(f"/root/reference/datasets/images/{name}.jpg")

    threads = [threading.Thread(target=client, args=(n,))
               for n in ("dog", "panda", "bird")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    stop.set()
    th.join(timeout=10)

    assert results["dog"][0] == "dog"
    assert results["panda"][0] == "panda"
    assert results["bird"][0] == "bird"
    assert all(float(v[1]) > 0.5 for v in results.values())
