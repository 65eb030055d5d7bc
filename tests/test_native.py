"""Native C++ data-plane kernels vs numpy reference."""

import numpy as np
import pytest

from ganslate_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native dataops library unavailable (no compiler)")


def test_clip_minmax_normalize():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2000, 3000, (64, 128, 128)).astype(np.float32)
    got = native.clip_minmax_normalize(x, -1000, 2000)
    xc = np.clip(x, -1000, 2000)
    want = 2 * (xc + 1000) / 3000 - 1
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mean_std():
    x = np.random.default_rng(1).normal(3, 2, (100, 100, 7)).astype(np.float32)
    mean, std = native.mean_std(x)
    assert np.isclose(mean, x.mean(), rtol=1e-5)
    assert np.isclose(std, x.std(), rtol=1e-4)


def test_z_score_normalize_matches_numpy():
    from ganslate_tpu.data.utils import normalization
    x = np.random.default_rng(2).uniform(0, 100, (32, 64, 64)).astype(np.float32)
    got = native.z_score_normalize(x, scale_to_range=(-1, 1))
    want = normalization.z_score_normalize(x, scale_to_range=(-1, 1))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_extract_patch():
    x = np.arange(6 * 7 * 8, dtype=np.float32).reshape(6, 7, 8)
    got = native.extract_patch(x, (1, 2, 3), (3, 4, 5))
    np.testing.assert_array_equal(got, x[1:4, 2:6, 3:8])


def test_masked_fill():
    x = np.random.default_rng(3).normal(size=(50, 50)).astype(np.float32)
    mask = x > 0
    got = native.masked_fill(x, mask, -1024.0)
    np.testing.assert_array_equal(got, np.where(mask, x, np.float32(-1024)))
