"""C++ staging library: builds, matches numpy gather and cv2 resize."""

import numpy as np
import pytest

from skinjax.data import native


def test_native_builds_and_loads():
    lib = native.load()
    assert lib is not None, "g++ is available in this image; build must succeed"


def test_gather_matches_numpy():
    rng = np.random.default_rng(0)
    cache = rng.integers(0, 256, (50, 8, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 50, 17)
    out = native.gather_u8(cache, idx, n_threads=4)
    np.testing.assert_array_equal(out, cache[idx])


def test_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (4, 37, 53, 3), dtype=np.uint8)
    out = native.resize_bilinear_u8(src, (24, 24), n_threads=2)
    ref = np.stack([
        cv2.resize(im, (24, 24), interpolation=cv2.INTER_LINEAR) for im in src
    ])
    # same half-pixel convention; cv2 rounds in fixed point, we in float —
    # every pixel must agree to within 1 LSB
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
