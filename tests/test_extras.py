"""Tests for superset components (the reference's own TODO list, cnn.cpp:15-24):
avg/global pooling (#7), padded conv (#8), confusion matrix + history (#9),
momentum/Adam (#2 — covered in test_model), profiling utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import ops
from cnn_tpu.nn import AvgPool2D, GlobalAvgPool
from cnn_tpu.utils.history import HistoryWriter, plot_history, read_history
from cnn_tpu.utils.metrics import ConfusionMatrix
from cnn_tpu.utils.profiling import StepTimer, device_memory_stats, trace


def test_avg_pool(rng):
    x = rng.standard_normal((2, 6, 6, 4), dtype=np.float32)
    out = ops.avg_pool2d(jnp.asarray(x), 2, 2)
    ref = x.reshape(2, 3, 2, 3, 2, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
    layer = AvgPool2D("ap", kernel_size=2, stride=2)
    assert layer.out_shape((6, 6, 4)) == (3, 3, 4)


def test_global_avg_pool(rng):
    x = rng.standard_normal((2, 5, 5, 8), dtype=np.float32)
    out = ops.global_avg_pool(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x.mean(axis=(1, 2)), rtol=1e-5)
    assert GlobalAvgPool("gap").out_shape((5, 5, 8)) == (8,)


def test_padded_conv(rng):
    """padding=1 k3 s1 conv preserves spatial extent (reference TODO #8)."""
    x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
    p = ops.conv2d_init(jax.random.key(0), 3, 4, 3)
    out = ops.conv2d(p, jnp.asarray(x), stride=1, padding=1)
    assert out.shape == (1, 8, 8, 4)
    # interior must equal the unpadded conv
    inner = ops.conv2d(p, jnp.asarray(x), stride=1, padding=0)
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-1], np.asarray(inner),
                               rtol=1e-5, atol=1e-5)
    assert ops.conv_out_size(8, 3, 1, padding=1) == 8


def test_confusion_matrix():
    cm = ConfusionMatrix(3)
    cm.compute([0, 1, 2, 0], [0, 1, 1, 2])
    m = cm.get()
    assert m[0, 0] == 1 and m[1, 1] == 1 and m[1, 2] == 1 and m[2, 0] == 1
    acc = cm.per_class_accuracy()
    np.testing.assert_allclose(acc, [1.0, 0.5, 0.0])
    s = cm.pretty(["dog", "panda", "bird"])
    assert "dog" in s and "panda" in s
    cm.clear()
    assert cm.get().sum() == 0


def test_history_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "hist.jsonl")
    w = HistoryWriter(path)
    for i in range(5):
        w.log(step=i * 1000, loss=1.0 / (i + 1), accuracy=0.2 * i)
    w.close()
    hist = read_history(path)
    assert len(hist) == 5 and hist[2]["loss"] == 1.0 / 3
    out = plot_history(path, os.path.join(tmp_path, "hist.png"))
    # matplotlib present -> png; absent -> ascii chart
    assert out.endswith(".png") and os.path.exists(out) or "loss" in out


def test_step_timer():
    t = StepTimer()
    t.tick(32)
    t.tick(32)
    assert t.steps == 2 and t.images == 64
    assert t.images_per_sec > 0


def test_trace_noop_and_memory_stats(tmp_path):
    with trace(None):
        pass
    stats = device_memory_stats()
    assert isinstance(stats, dict)
