"""Data pipeline tests (discovery/split/augment/loader)."""

import os

import numpy as np
import pytest

from cnn_tpu.data import DataLoader, ImageAugmentor, discover_dataset, split_dataset

DATASET = "/root/reference/datasets/animals"
have_dataset = os.path.isdir(DATASET)


def _fake_samples(n=100):
    return [(f"/fake/img_{i}.jpg", i % 3) for i in range(n)]


def test_split_ratios_and_determinism():
    samples = _fake_samples(1000)
    s1 = split_dataset(samples, 0.8, 0.1, seed=212)
    s2 = split_dataset(samples, 0.8, 0.1, seed=212)
    # 8:1:1 sizes in train/test/valid slice order (pipeline.cpp:100-105)
    assert len(s1["train"]) == 800 and len(s1["test"]) == 100 and len(s1["valid"]) == 100
    assert s1 == s2  # deterministic
    s3 = split_dataset(samples, 0.8, 0.1, seed=213)
    assert s3 != s1  # seed-sensitive
    # a sample never appears in two splits
    all_items = s1["train"] + s1["test"] + s1["valid"]
    assert len(set(all_items)) == len(samples)


def test_split_rejects_bad_ratios():
    with pytest.raises(AssertionError):
        split_dataset(_fake_samples(), 0.9, 0.2)


def test_augmentor_determinism_and_shapes(rng):
    img = rng.integers(0, 256, (100, 120, 3), dtype=np.uint8)
    a = ImageAugmentor(seed=212)
    b = ImageAugmentor(seed=212)
    out_a = a(img.copy())
    out_b = b(img.copy())
    np.testing.assert_array_equal(out_a, out_b)
    # per-call rng gives thread-order-independent determinism
    r1 = np.random.default_rng((212, 0, 5))
    r2 = np.random.default_rng((212, 0, 5))
    np.testing.assert_array_equal(a(img.copy(), r1), b(img.copy(), r2))


def test_augmentor_ops_distributions(rng):
    """Over many draws every op must fire with roughly its configured p."""
    img = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    aug = ImageAugmentor(seed=0)
    changed_shape = 0
    n = 200
    for _ in range(n):
        out = aug(img.copy())
        if out.shape != img.shape:
            changed_shape += 1
    # crop p=.7 or rotate p=.5 both change shape; P(neither) = .3*.5 = .15
    assert 0.6 < changed_shape / n <= 1.0


@pytest.mark.skipif(not have_dataset, reason="reference dataset unavailable")
def test_discover_and_loader_end_to_end():
    samples = discover_dataset(DATASET, ["dog", "panda", "bird"])
    assert len(samples) >= 2900  # ~1000 per category
    labels = {l for _, l in samples}
    assert labels == {0, 1, 2}

    splits = split_dataset(samples)
    loader = DataLoader(splits["valid"][:8], batch_size=4, augment=False,
                        shuffle=False, image_size=64)
    batches = list(loader)
    assert len(batches) == 2
    imgs, lbls = batches[0]
    assert imgs.shape == (4, 64, 64, 3) and imgs.dtype == np.uint8
    assert lbls.shape == (4,) and lbls.dtype == np.int32


@pytest.mark.skipif(not have_dataset, reason="reference dataset unavailable")
def test_loader_stream_and_epoch_shuffle():
    samples = discover_dataset(DATASET, ["dog"])[:6]
    loader = DataLoader(samples, batch_size=2, augment=True, shuffle=True,
                        image_size=32, seed=7)
    try:
        b1 = loader.generate_batch()
        assert b1[0].shape == (2, 32, 32, 3)
        # stream survives epoch wrap (6 samples / bs 2 = 3 batches/epoch)
        for _ in range(5):
            loader.generate_batch()
    finally:
        loader.close()
    # epoch orders differ by default, identical in compat mode
    l2 = DataLoader(samples, batch_size=2, seed=7)
    assert not np.array_equal(l2._epoch_order(0), l2._epoch_order(1))
    l3 = DataLoader(samples, batch_size=2, seed=7, compat_fixed_epoch_shuffle=True)
    np.testing.assert_array_equal(l3._epoch_order(0), l3._epoch_order(1))


@pytest.mark.skipif(not os.path.exists("/root/repo/build/libcnn_data.so"),
                    reason="native loader not built")
def test_native_loader_matches_cv2():
    import cv2
    from cnn_tpu.data.native import NativeLoader
    path = "/root/reference/datasets/images/dog.jpg"
    nl = NativeLoader(128)
    out = nl.load(path)
    ref = cv2.resize(cv2.imread(path), (128, 128))
    np.testing.assert_array_equal(out, ref)
    batch = nl.load_batch([path, path], num_threads=2)
    np.testing.assert_array_equal(batch[0], ref)
    assert nl.load("/nonexistent.jpg") is None


def test_stream_raises_on_unreadable_image_instead_of_hanging():
    loader = DataLoader([("/nonexistent/img.jpg", 0)] * 4, batch_size=2)
    with pytest.raises(RuntimeError, match="data producer failed"):
        loader.generate_batch()
    loader.close()


def test_stream_rejects_batch_larger_than_dataset():
    loader = DataLoader([("/x.jpg", 0)] * 3, batch_size=8)
    with pytest.raises(AssertionError, match="would yield no"):
        loader.generate_batch()
