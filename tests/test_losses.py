"""Loss tests: adversarial modes against hand-computed values, SSIM against
a straightforward numpy implementation of the reference formula, CycleGAN
loss wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage

from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.nn.losses.adversarial_loss import AdversarialLoss
from ganslate_tpu.nn.losses.cyclegan_losses import CycleGANLosses
from ganslate_tpu.nn.losses.utils.ssim import SSIMLoss, ssim


def test_lsgan():
    crit = AdversarialLoss("lsgan")
    pred = jnp.array([0.0, 0.5, 1.0])
    assert np.isclose(float(crit(pred, True)), np.mean((np.array([0, .5, 1]) - 1) ** 2))
    assert np.isclose(float(crit(pred, False)), np.mean(np.array([0, .5, 1]) ** 2))


def test_vanilla_bce_with_logits():
    crit = AdversarialLoss("vanilla")
    pred = np.array([-1.0, 0.0, 2.0], dtype=np.float32)
    expected_real = np.mean(np.log1p(np.exp(-pred)))
    expected_fake = np.mean(pred + np.log1p(np.exp(-pred)))
    assert np.isclose(float(crit(jnp.array(pred), True)), expected_real, atol=1e-6)
    assert np.isclose(float(crit(jnp.array(pred), False)), expected_fake, atol=1e-6)


def test_wgangp_and_nonsaturating():
    pred = jnp.array([1.0, -3.0])
    w = AdversarialLoss("wgangp")
    assert float(w(pred, True)) == 1.0
    assert float(w(pred, False)) == -1.0
    ns = AdversarialLoss("nonsaturating")
    expected = np.mean(np.log1p(np.exp(-np.array([1.0, -3.0]))))
    assert np.isclose(float(ns(pred, True)), expected, atol=1e-6)


def test_dict_prediction_averaging():
    crit = AdversarialLoss("lsgan")
    preds = {"s1": jnp.zeros((2, 4)), "s2": jnp.ones((2, 4))}
    # s1: mean((0-1)^2)=1 ; s2: mean((1-1)^2)=0 ; avg = 0.5
    assert np.isclose(float(crit(preds, True)), 0.5)


def _numpy_ssim_distance(x, y, win_size=11, sigma=1.5, data_range=1.0):
    """Direct numpy transcription of the SSIM-distance formula (NHWC)."""
    coords = np.arange(win_size) - win_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()

    def blur(img):  # img (H, W), VALID separable gaussian
        out = scipy.ndimage.convolve1d(img, g, axis=0, mode="constant")
        out = scipy.ndimage.convolve1d(out, g, axis=1, mode="constant")
        h = win_size // 2
        return out[h:-h, h:-h]

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    ds = []
    for n in range(x.shape[0]):
        for c in range(x.shape[-1]):
            xi, yi = x[n, :, :, c], y[n, :, :, c]
            mu1, mu2 = blur(xi), blur(yi)
            s1sq = blur(xi * xi) - mu1 ** 2
            s2sq = blur(yi * yi) - mu2 ** 2
            s12 = blur(xi * yi) - mu1 * mu2
            S1 = (2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1)
            S2 = (2 * s12 + c2) / (s1sq + s2sq + c2)
            ds.append(np.sqrt(np.maximum(2 - (S1 + S2), 0)))
    return np.mean(ds)


def test_ssim_identity_and_golden():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)

    loss = SSIMLoss()
    # identical images -> distance 0, ssim index 1
    assert float(loss(jnp.array(x), jnp.array(x))) < 1e-3
    assert float(ssim(jnp.array(x), jnp.array(x))) > 0.999

    got = float(loss(jnp.array(x), jnp.array(y), data_range=1.0))
    want = _numpy_ssim_distance(x, y)
    # sqrt near 0 amplifies fp32-vs-fp64 noise; 1% relative is tight enough.
    assert np.isclose(got, want, rtol=1e-2)


def _cyclegan_conf(proportion_ssim=0.0, lambda_identity=0.0):
    return Conf.create({
        "mode": "train",
        "train": {"gan": {"optimizer": {
            "lambda_AB": 10.0, "lambda_BA": 5.0,
            "lambda_identity": lambda_identity,
            "proportion_ssim": proportion_ssim,
        }}}})


def test_cyclegan_losses_l1_only():
    conf = _cyclegan_conf()
    crit = CycleGANLosses(conf)
    assert not crit.is_using_identity()
    visuals = {
        "real_A": jnp.zeros((1, 8, 8, 1)), "rec_A": jnp.ones((1, 8, 8, 1)),
        "real_B": jnp.zeros((1, 8, 8, 1)), "rec_B": 0.5 * jnp.ones((1, 8, 8, 1)),
    }
    losses = crit(visuals)
    assert np.isclose(float(losses["cycle_A"]), 10.0 * 1.0)
    assert np.isclose(float(losses["cycle_B"]), 5.0 * 0.5)


def test_cyclegan_identity_requires_visuals():
    conf = _cyclegan_conf(lambda_identity=0.5)
    crit = CycleGANLosses(conf)
    assert crit.is_using_identity()
    visuals = {
        "real_A": jnp.zeros((1, 8, 8, 1)), "rec_A": jnp.zeros((1, 8, 8, 1)),
        "real_B": jnp.zeros((1, 8, 8, 1)), "rec_B": jnp.zeros((1, 8, 8, 1)),
    }
    with pytest.raises(ValueError):
        crit(visuals)
    visuals.update({"idt_A": jnp.ones((1, 8, 8, 1)) * 0.2,
                    "idt_B": jnp.ones((1, 8, 8, 1)) * 0.4})
    losses = crit(visuals)
    # idt_B = lambda_AB * (0.5 * L1(idt_B, real_B)) = 10 * 0.5 * 0.4
    assert np.isclose(float(losses["idt_B"]), 10.0 * 0.5 * 0.4, atol=1e-6)
    assert np.isclose(float(losses["idt_A"]), 5.0 * 0.5 * 0.2, atol=1e-6)
