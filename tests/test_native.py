"""Native C++ data-plane parity tests."""

import numpy as np
import pytest

from gppvae_tpu.data.transforms import rotate_bilinear
from gppvae_tpu.native import native_available


@pytest.mark.skipif(not native_available(), reason="g++ build unavailable")
def test_native_rotation_matches_numpy():
    rng = np.random.default_rng(0)
    imgs = rng.random((5, 33, 31)).astype(np.float32)  # odd, non-square
    angles = rng.uniform(0, 2 * np.pi, size=5).astype(np.float32)
    ref = rotate_bilinear(imgs, angles, use_native=False)
    out = rotate_bilinear(imgs, angles, use_native=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.skipif(not native_available(), reason="g++ build unavailable")
def test_native_used_by_default_and_faster_or_equal():
    rng = np.random.default_rng(1)
    imgs = rng.random((64, 64, 64)).astype(np.float32)
    angles = rng.uniform(0, 2 * np.pi, size=64).astype(np.float32)
    out_default = rotate_bilinear(imgs, angles)
    out_numpy = rotate_bilinear(imgs, angles, use_native=False)
    np.testing.assert_allclose(out_default, out_numpy, atol=1e-5)
