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


# ----------------------------------------------- standard InceptionV3 FID


def test_inception_forward_parity_and_import():
    """Flax InceptionV3 + name-keyed torch import reproduce the torch
    forward (tests/torch_inception.py mirrors torchvision's module tree and
    state_dict naming exactly, so a REAL torchvision checkpoint loads the
    same way). Verifies features AND logits."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from ganslate_tpu.nn.inception import InceptionV3, load_torch_inception
    from .torch_inception import InceptionV3 as TorchInceptionV3

    tnet = TorchInceptionV3()
    tnet.eval()
    # Randomize BN stats so the import is actually exercised.
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape,
                                               generator=g) + 0.5)

    params = load_torch_inception(tnet.state_dict())

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        t_feats, t_logits = tnet(torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    model = InceptionV3()
    f_feats, f_logits = jax.jit(
        lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(f_feats), t_feats.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(f_logits), t_logits.numpy(),
                               atol=1e-3, rtol=1e-3)


def test_fid_with_inception_features():
    """End-to-end standard-FID path on horse2zebra-shaped inputs: random
    (untrained) inception weights, FID(identical)=~0 < FID(shifted)."""
    import jax

    from ganslate_tpu.nn.inception import InceptionV3, fid_feature_fn

    model = InceptionV3()
    rng = np.random.default_rng(0)
    x0 = np.zeros((1, 75, 75, 3), np.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0)["params"]
    feature_fn = fid_feature_fn(params, resize_to=75)  # small for CPU test

    metric = FID(feature_fn)
    real = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    fake = np.clip(real + 0.5, -1, 1)
    metric.update(real, "real")
    metric.update(real, "fake")
    same = metric.compute()

    metric.reset()
    metric.update(real, "real")
    metric.update(fake, "fake")
    diff = metric.compute()
    assert same < 1e-6
    assert diff > same


def test_inception_golden_features():
    """Golden-value pin on the flax InceptionV3 WITHOUT torch: fixed
    deterministic params (init key 0) + fixed analytic inputs must
    reproduce checked-in pool3 feature constants. The forward-parity test
    above proves flax == torch-mirror, but both could drift together in a
    future edit; these constants freeze today's verified architecture so
    any structural change (layer order, padding, pooling, BN epsilon) is
    caught even in a torch-free environment."""
    import jax
    import jax.numpy as jnp

    from ganslate_tpu.nn.inception import InceptionV3

    model = InceptionV3()
    x0 = jnp.zeros((1, 75, 75, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0)["params"]

    h = w = 75
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img0 = np.stack([np.sin(yy / 5), np.cos(xx / 7),
                     np.sin((xx + yy) / 11)], -1)
    img1 = np.stack([np.tanh((xx - 37) / 20), np.sin(xx * yy / 301),
                     np.cos(yy / 3)], -1)
    x = jnp.asarray(np.stack([img0, img1]))

    feats, _ = jax.jit(
        lambda p, v: model.apply({"params": p}, v))(params, x)
    feats = np.asarray(feats, np.float64)

    # Constants generated 2026-08-19 from the torch-mirror-verified net
    # (top-8 |feature| indices; plus full-vector mean/std as a whole-net
    # checksum).
    idx = [94, 133, 147, 197, 201, 280, 283, 290]
    g0 = [0.0013047984102740884, 0.0008216078276745975,
          0.0010041375644505024, 0.0011666431091725826,
          0.0008182117599062622, 0.0008536138338968158,
          0.0007991061429493129, 0.0007160635432228446]
    g1 = [0.001108786789700389, 0.0006865719915367663,
          0.0008686591754667461, 0.0010119522921741009,
          0.0007198444218374789, 0.0007226384477689862,
          0.0007530197035521269, 0.000727022357750684]
    np.testing.assert_allclose(feats[0, idx], g0, rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(feats[1, idx], g1, rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(feats.mean(axis=1),
                               [5.425347820815253e-05,
                                4.811083775925831e-05],
                               rtol=2e-3, atol=1e-9)
    np.testing.assert_allclose(feats.std(axis=1),
                               [0.0001195202138845321,
                                0.0001051439787445814],
                               rtol=2e-3, atol=1e-9)


def test_fid_npz_engine_path_torch_free(tmp_path, monkeypatch):
    """The native .npz weight format reaches the engine FID hook WITHOUT a
    torch runtime: save flax params as .npz (the `ganslate
    convert-fid-weights` output format), poison `import torch`, and run the
    full `_init_fid` -> slice-update -> compute path for BOTH 2D batches
    and 3D volumes (slice-wise pool3 convention, `metrics.fid_3d_slicewise`)."""
    import sys

    import jax

    from ganslate_tpu.configs.omega import Conf
    from ganslate_tpu.engines.validator_tester import BaseValTestEngine
    from ganslate_tpu.nn.inception import (InceptionV3, load_inception_npz,
                                           save_inception_npz)

    model = InceptionV3()
    x0 = np.zeros((1, 75, 75, 3), np.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0)["params"]
    weights = tmp_path / "inception_v3.npz"
    save_inception_npz(params, str(weights))

    # Round-trip equality.
    loaded = load_inception_npz(str(weights))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])

    # No torch from here on: the eval/serving path must not import it.
    monkeypatch.setitem(sys.modules, "torch", None)

    conf = Conf.create({
        "mode": "val",
        "val": {"metrics": {"fid": True, "fid_weights": str(weights),
                            "fid_3d_slicewise": True}},
    })

    class _Engine(BaseValTestEngine):
        def _set_mode(self):
            pass

    eng = object.__new__(_Engine)
    eng.conf = conf
    eng.fid = BaseValTestEngine._init_fid(eng)
    assert eng.fid is not None

    rng = np.random.default_rng(0)
    # 2D batch path.
    real2d = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    eng.visuals = {"real_B": real2d, "fake_B": np.clip(real2d + 0.3, -1, 1)}
    eng._update_fid()
    assert eng.fid.num_samples("real") == 2
    assert np.isfinite(eng.fid.compute())
    eng.fid.reset()

    # 3D volume path: (N, D, H, W, C) streams D slices per volume.
    real3d = rng.uniform(-1, 1, (1, 5, 32, 32, 1)).astype(np.float32)
    eng.visuals = {"real_B": real3d, "fake_B": np.clip(real3d + 0.3, -1, 1)}
    eng._update_fid()
    assert eng.fid.num_samples("real") == 5
    assert np.isfinite(eng.fid.compute())

    # Gate off: 3D volumes skip FID.
    eng.fid.reset()
    conf.val.metrics.fid_3d_slicewise = False
    eng._update_fid()
    assert eng.fid.num_samples("real") == 0


def test_fid_config_reachable(tmp_path):
    """`metrics.fid` + `metrics.fid_weights` reach the engine hook: the
    weights file loads into the jitted inception feature_fn and the metric
    streams to a value."""
    torch = pytest.importorskip("torch")
    from ganslate_tpu.configs.omega import Conf
    from ganslate_tpu.engines.validator_tester import BaseValTestEngine
    from .torch_inception import InceptionV3 as TorchInceptionV3

    weights = tmp_path / "inception_v3.pth"
    torch.save(TorchInceptionV3().state_dict(), str(weights))

    conf = Conf.create({
        "mode": "val",
        "val": {"metrics": {"fid": True, "fid_weights": str(weights)}},
    })
    class _Engine(BaseValTestEngine):
        def _set_mode(self):
            pass

    eng = object.__new__(_Engine)
    eng.conf = conf
    fid = BaseValTestEngine._init_fid(eng)
    assert fid is not None

    rng = np.random.default_rng(0)
    real = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    fid.update(real, "real")
    fid.update(np.clip(real + 0.3, -1, 1), "fake")
    assert np.isfinite(fid.compute())
