"""DataLoader RAM-cache tests."""

import os

import numpy as np
import pytest

from cnn_tpu.data import DataLoader, discover_dataset

DATASET = "/root/reference/datasets/animals"
have_dataset = os.path.isdir(DATASET)

pytestmark = pytest.mark.skipif(not have_dataset, reason="dataset unavailable")


def test_cache_decodes_once_and_matches_uncached():
    samples = discover_dataset(DATASET, ["dog"])[:4]
    cached = DataLoader(samples, batch_size=4, shuffle=False, image_size=48,
                        cache=True)
    plain = DataLoader(samples, batch_size=4, shuffle=False, image_size=48,
                       cache=False)
    (a, la) = next(iter(cached))
    (b, lb) = next(iter(plain))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)
    assert len(cached._cached) == 4
    # second pass hits the cache and yields identical bytes
    (a2, _) = next(iter(cached))
    np.testing.assert_array_equal(a, a2)


def test_cache_with_augmentation_is_deterministic():
    samples = discover_dataset(DATASET, ["panda"])[:2]
    l1 = DataLoader(samples, batch_size=2, shuffle=False, image_size=32,
                    cache=True, augment=True, seed=5)
    l2 = DataLoader(samples, batch_size=2, shuffle=False, image_size=32,
                    cache=False, augment=True, seed=5)
    (a, _), (b, _) = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(a, b)
