"""FID tests: analytic gaussian cases, scipy.sqrtm cross-check, and the
streaming harness with a jitted flax encoder."""

import numpy as np
import pytest

from ganslate_tpu.utils.metrics.fid import (FID, compute_statistics,
                                            fid_from_features,
                                            frechet_distance)


def test_identical_distributions_zero(rng):
    feats = rng.normal(size=(500, 16))
    assert abs(fid_from_features(feats, feats)) < 1e-8


def test_analytic_diagonal_gaussians():
    """For diagonal covariances: d^2 = ||dmu||^2 + sum (sqrt(v1)-sqrt(v2))^2."""
    d = 8
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.5)
    v1 = np.linspace(1.0, 2.0, d)
    v2 = np.linspace(0.5, 1.5, d)
    expected = float(np.sum((mu1 - mu2) ** 2)
                     + np.sum((np.sqrt(v1) - np.sqrt(v2)) ** 2))
    got = frechet_distance(mu1, np.diag(v1), mu2, np.diag(v2))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_against_scipy_sqrtm(rng):
    scipy_linalg = pytest.importorskip("scipy.linalg")
    a = rng.normal(size=(300, 6))
    b = rng.normal(size=(300, 6)) * 1.5 + 0.3
    mu1, s1 = compute_statistics(a)
    mu2, s2 = compute_statistics(b)
    covmean = scipy_linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    expected = float((mu1 - mu2) @ (mu1 - mu2)
                     + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-8)


def test_monotonic_in_shift(rng):
    base = rng.normal(size=(400, 8))
    fids = [fid_from_features(base, base + shift) for shift in (0.1, 0.5, 1.0)]
    assert fids[0] < fids[1] < fids[2]


def test_streaming_harness_with_flax_encoder(rng):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ganslate_tpu.nn.layers import Conv

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = Conv(8, (3, 3), strides=2, padding=1, name="c")(x)
            return jnp.mean(h, axis=(1, 2))  # (N, 8) global-average features

    enc = Encoder()
    x0 = jnp.zeros((1, 16, 16, 1), jnp.float32)
    params = jax.jit(enc.init)(jax.random.key(0), x0)["params"]
    feature_fn = jax.jit(lambda x: enc.apply({"params": params}, x))

    metric = FID(lambda batch: feature_fn(jnp.asarray(batch)))
    for _ in range(4):
        real = rng.normal(size=(8, 16, 16, 1)).astype(np.float32)
        metric.update(real, which="real")
        metric.update(real + 0.8, which="fake")
    shifted = metric.compute()

    metric.reset()
    for _ in range(4):
        real = rng.normal(size=(8, 16, 16, 1)).astype(np.float32)
        metric.update(real, which="real")
        metric.update(real + np.random.default_rng(1).normal(
            size=real.shape, scale=1e-3).astype(np.float32), which="fake")
    near_identical = metric.compute()

    assert near_identical < shifted
    assert near_identical < 0.05
