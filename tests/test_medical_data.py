"""Medical data path tests: NIfTI/NRRD round-trips, sitk_utils surface,
normalization, focal patching, body mask, FOV truncation, registration."""

import numpy as np
import pytest

from ganslate_tpu.data.utils import normalization
from ganslate_tpu.data.utils.body_mask import apply_body_mask, get_body_mask
from ganslate_tpu.data.utils.fov_truncate import truncate_CBCT_based_on_fov
from ganslate_tpu.data.utils.ops import pad
from ganslate_tpu.data.utils.registration_methods import (
    get_registration_transform, register_CT_to_CBCT, resample_to_reference)
from ganslate_tpu.data.utils.stochastic_focal_patching import \
    StochasticFocalPatchSampler
from ganslate_tpu.utils import medio, sitk_utils
from ganslate_tpu.utils.medio import MedicalImage


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz", ".nrrd"])
def test_medio_roundtrip(tmp_path, suffix):
    rng = np.random.default_rng(0)
    array = rng.integers(-1024, 2000, (12, 16, 20)).astype(np.int16)
    image = MedicalImage(array, origin=(1.5, -2.0, 30.0),
                         spacing=(0.9, 1.1, 3.0),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    path = tmp_path / f"vol{suffix}"
    medio.write(image, path)
    loaded = medio.load(path)
    np.testing.assert_array_equal(loaded.array, array)
    np.testing.assert_allclose(loaded.origin, image.origin, atol=1e-5)
    np.testing.assert_allclose(loaded.spacing, image.spacing, atol=1e-5)
    np.testing.assert_allclose(loaded.direction, image.direction, atol=1e-5)


def test_medio_float_and_2d_nifti(tmp_path):
    array = np.random.default_rng(1).normal(size=(8, 10, 12)).astype(np.float32)
    path = tmp_path / "f.nii.gz"
    medio.write(MedicalImage(array), path)
    np.testing.assert_allclose(medio.load(path).array, array, rtol=1e-6)


def test_sitk_utils_surface():
    array = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(np.int16)
    image = sitk_utils.tensor_to_sitk_image(array, origin=(0, 0, 0),
                                            spacing=(1, 1, 1))
    assert sitk_utils.get_size(image) == (4, 3, 2)          # (x, y, z)
    assert sitk_utils.get_torch_like_size(image) == (2, 4, 3)  # (z, x, y)
    assert sitk_utils.get_npy_dtype(image) == "int16"
    assert sitk_utils.is_image_smaller_than(image, (3, 5))   # xy check
    assert not sitk_utils.is_image_smaller_than(image, (2, 2))

    sliced = sitk_utils.slice_image(image, start=(1, 0, 0), end=(3, 2, 1))
    assert sliced.array.shape == (1, 2, 2)
    np.testing.assert_array_equal(sliced.array, array[0:1, 0:2, 1:3])

    mask = MedicalImage((array % 2).astype(np.uint8))
    masked = sitk_utils.apply_mask(image, mask, masking_value=-7)
    assert (masked.array[array % 2 == 0] == -7).all()
    assert (masked.array[array % 2 == 1] == array[array % 2 == 1]).all()


def test_normalization_roundtrip():
    x = np.random.default_rng(0).uniform(-1000, 2000, (4, 5)).astype(np.float32)
    normalized = normalization.min_max_normalize(x, -1000, 2000)
    assert normalized.min() >= -1 and normalized.max() <= 1
    np.testing.assert_allclose(
        normalization.min_max_denormalize(normalized.copy(), -1000, 2000), x,
        rtol=1e-4)

    z = normalization.z_score_normalize(x, scale_to_range=[-1, 1])
    assert -1.0001 <= z.min() and z.max() <= 1.0001

    z2 = normalization.z_score_normalize_with_precomputed_stats(
        x, (x.mean(), x.std()), original_scale=(x.min(), x.max()),
        scale_to_range=[-1, 1])
    np.testing.assert_allclose(z2, z, atol=1e-4)


def test_stochastic_focal_patching():
    rng = np.random.default_rng(0)
    vol_a = rng.normal(size=(20, 30, 30)).astype(np.float32)
    vol_b = rng.normal(size=(24, 36, 36)).astype(np.float32)

    sampler = StochasticFocalPatchSampler(patch_size=(8, 12, 12),
                                          focal_region_proportion=0.2,
                                          rng=np.random.default_rng(1))
    for _ in range(10):
        a, b = sampler.get_patch_pair(vol_a, vol_b)
        assert a.shape == (8, 12, 12) and b.shape == (8, 12, 12)

    sampler2d = StochasticFocalPatchSampler(patch_size=(12, 12),
                                            focal_region_proportion=0.1,
                                            rng=np.random.default_rng(2))
    a, b = sampler2d.get_patch_pair(vol_a, vol_b)
    assert a.shape == (12, 12) and b.shape == (12, 12)

    with pytest.raises(RuntimeError):
        StochasticFocalPatchSampler((64, 64, 64), 0.1).get_patch_pair(vol_a, vol_b)


def test_body_mask():
    # Synthetic CT: air (-1024) with a bright 'body' ellipse per slice.
    vol = np.full((4, 64, 64), -1024, dtype=np.int32)
    yy, xx = np.mgrid[:64, :64]
    body = ((yy - 32) ** 2 / 500 + (xx - 32) ** 2 / 300) < 1
    vol[:, body] = 50
    # A small separate noise blob (should be dropped: not largest component).
    vol[:, 2:4, 2:4] = 100

    mask = get_body_mask(vol, hu_threshold=-300)
    assert mask.shape == vol.shape
    assert mask[:, 32, 32].all()        # body interior kept
    assert not mask[:, 3, 3].any()      # noise blob removed

    masked = apply_body_mask(vol.copy(), masking_value=-1024, hu_threshold=-300)
    assert (masked[:, 3, 3] == -1024).all()
    assert (masked[:, 32, 32] == 50).all()


def test_fov_truncate():
    vol = np.full((10, 16, 16), -1024, dtype=np.int32)
    vol[3:8] = 100  # only slices 3..7 have full FOV
    image = MedicalImage(vol)
    truncated = truncate_CBCT_based_on_fov(image)
    assert truncated.array.shape[0] == 4  # slices 3,4,5,6 (reference's end-1)


def test_pad():
    vol = np.ones((3, 4, 5), dtype=np.float32)
    out = pad(vol, (5, 4, 7))
    assert out.shape == (5, 4, 7)
    assert out[0, 0, 0] == vol.min()
    assert out[2, 2, 3] == 1


def test_registration_recovers_translation():
    """Register a translated copy of a volume; transform should map fixed
    points to (approximately) their translated source position."""
    rng = np.random.default_rng(0)
    base = scipy_blur(rng.normal(size=(24, 32, 32)).astype(np.float32))
    moving = MedicalImage(base, origin=(0, 0, 0), spacing=(1, 1, 1))
    # Fixed = moving shifted by 3 voxels along x (origin offset by -3).
    fixed = MedicalImage(base[:, :, 3:], origin=(3.0, 0, 0), spacing=(1, 1, 1))

    transform = get_registration_transform(fixed, moving, "Rigid", n_samples=4000)
    # A fixed-space point p maps near p itself (same physical frame).
    moved = np.asarray(transform.TransformPoint((16.0, 16.0, 12.0)))
    assert np.linalg.norm(moved - np.array([16.0, 16.0, 12.0])) < 2.5

    resampled = register_CT_to_CBCT(moving, fixed)
    assert resampled.array.shape == fixed.array.shape
    # Central region should correlate strongly with the fixed volume.
    corr = np.corrcoef(resampled.array[4:-4, 4:-4, 4:-4].ravel(),
                       fixed.array[4:-4, 4:-4, 4:-4].ravel())[0, 1]
    assert corr > 0.8


def scipy_blur(x):
    import scipy.ndimage
    return scipy.ndimage.gaussian_filter(x, 1.5)
