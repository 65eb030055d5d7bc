"""Sliding-window inferer tests: identity reconstruction, gaussian vs
constant blending, 2D-over-3D squeeze path, window batching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.utils.sliding_window_inferer import (SlidingWindowInferer, _scan_interval,
                                                       dense_patch_slices,
                                                       gaussian_importance_map)


def test_dense_patch_slices():
    starts = dense_patch_slices((8, 8), (4, 4), (3, 3))
    # starts per dim: [0, 3, 4] -> 9 windows
    assert starts.shape == (9, 2)
    assert starts.min() == 0 and starts.max() == 4


def test_gaussian_importance_center_peak():
    imp = gaussian_importance_map((7, 7))
    assert imp[3, 3] == imp.max()
    assert imp.min() > 0


@pytest.mark.parametrize("mode", ["gaussian", "constant"])
def test_identity_network_reconstruction(mode):
    """Stitching an identity network's outputs must reproduce the input
    exactly (overlap-weighted average of identical values)."""
    inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=3,
                                   overlap=0.25, mode=mode)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 23, 3))
                    .astype(np.float32))
    out = inferer(x, lambda params, v: v, params={})
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_identity_3d():
    inferer = SlidingWindowInferer(roi_size=(4, 8, 8), sw_batch_size=2,
                                   overlap=0.5, mode="gaussian")
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6, 12, 12, 2))
                    .astype(np.float32))
    out = inferer(x, lambda params, v: v, params={})
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_2d_network_over_3d_volume():
    """A 2D ROI on a 3D volume runs the network slice-wise (depth squeeze)."""
    inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=4,
                                   overlap=0.25)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 5, 16, 16, 1))
                    .astype(np.float32))
    calls = []

    def net(params, v):
        calls.append(v.shape)
        return v * 2.0

    out = inferer(x, net, params={})
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(x), atol=1e-4)
    # The traced network saw 4D windows (depth squeezed).
    assert all(len(s) == 4 for s in calls)


def test_bf16_volume_input_parity():
    """A bf16 volume (the serving wire format, engines/base.py:_to_wire)
    must produce the same blend as the fp32 volume when the network casts
    to bf16 anyway — the down-cast commutes with the window gather."""
    inferer = SlidingWindowInferer(roi_size=(4, 8, 8), sw_batch_size=4,
                                   overlap=0.25, mode="gaussian")
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 6, 12, 12, 2))
                    .astype(np.float32))

    def net(params, v):
        return jnp.tanh(v.astype(jnp.bfloat16) * 0.5)

    out_f32 = inferer(x, net, params={})
    out_bf16 = inferer(x.astype(jnp.bfloat16), net, params={})
    assert out_f32.dtype == out_bf16.dtype
    np.testing.assert_allclose(np.asarray(out_bf16), np.asarray(out_f32),
                               atol=1e-6)


def test_small_volume_padded():
    """Volumes smaller than the ROI are padded with cval and cropped back."""
    inferer = SlidingWindowInferer(roi_size=(16, 16), sw_batch_size=1, cval=-1.0)
    x = jnp.ones((1, 10, 12, 1))
    out = inferer(x, lambda params, v: v, params={})
    assert out.shape == (1, 10, 12, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("mode", ["gaussian", "constant"])
def test_identity_single_device_blend(mode):
    """The static overlap-add path (distributed=False) must reconstruct the
    input exactly, same as the sharded scatter path."""
    inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=3,
                                   overlap=0.25, mode=mode, distributed=False)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 20, 23, 3))
                    .astype(np.float32))
    out = inferer(x, lambda params, v: v, params={})
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_single_device_matches_distributed_3d():
    """Static overlap-add == scatter path on a real (non-identity) network,
    3D grid with clamped last window (irregular starts)."""
    k = jnp.asarray(np.random.default_rng(4).normal(
        size=(3, 3, 3, 2, 2)).astype(np.float32)) * 0.3

    def net(params, v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                v.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC")))

    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 11, 13, 9, 2))
                    .astype(np.float32))
    args = dict(roi_size=(4, 8, 8), sw_batch_size=3, overlap=0.25,
                mode="gaussian")
    out_single = SlidingWindowInferer(distributed=False, **args)(x, net, {})
    out_dist = SlidingWindowInferer(distributed=True, **args)(x, net, {})
    np.testing.assert_allclose(np.asarray(out_single), np.asarray(out_dist),
                               atol=1e-5, rtol=1e-5)


def test_single_device_2d_over_3d():
    inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=4,
                                   overlap=0.25, distributed=False)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 5, 16, 16, 1))
                    .astype(np.float32))
    out = inferer(x, lambda params, v: 2.0 * v, params={})
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(x), atol=1e-4)


def _dense_reference(x, net, roi, overlap, mode, sigma_scale=0.125, cval=0.0):
    """Direct per-window weighted accumulation (the MONAI definition):
    pad, run every window, multiply the FULL importance map, accumulate
    canvas and weight canvas, divide, crop. No factorization — this is the
    ground truth the per-axis overlap-add must reproduce."""
    spatial = x.shape[1:-1]
    padded = tuple(max(s, r) for s, r in zip(spatial, roi))
    pad_cfg = [(0, 0)]
    for s, p in zip(spatial, padded):
        lo = (p - s) // 2
        pad_cfg.append((lo, p - s - lo))
    pad_cfg.append((0, 0))
    xp = np.pad(np.asarray(x), pad_cfg, constant_values=cval)
    starts = dense_patch_slices(padded, roi, _scan_interval(padded, roi, overlap))
    if mode == "gaussian":
        imp = gaussian_importance_map(roi, sigma_scale)
    else:
        imp = np.ones(roi, np.float32)
    canvas = np.zeros((*([x.shape[0]]), *padded, x.shape[-1]), np.float64)
    weights = np.zeros((*padded, 1), np.float64)
    for s in starts:
        region = tuple(slice(int(si), int(si) + r) for si, r in zip(s, roi))
        win = xp[(slice(None), *region, slice(None))]
        pred = np.asarray(net(None, jnp.asarray(win)))
        canvas[(slice(None), *region, slice(None))] += pred * imp[..., None]
        weights[(*region, slice(None))] += imp[..., None]
    out = canvas / weights
    crops = tuple(slice(lo, lo + s) for (lo, _), s in zip(pad_cfg[1:-1], spatial))
    return out[(slice(None), *crops, slice(None))]


@pytest.mark.parametrize("mode,force_full", [
    ("gaussian", False),   # separable fast path (per-axis weight folding)
    ("gaussian", True),    # full-map multiply fallback, same weights
    ("constant", False),
])
def test_blend_matches_dense_reference(mode, force_full):
    """The factorized overlap-add must equal the direct per-window weighted
    accumulation on a NON-identity network (identity tests cannot see
    weighting bugs: identical overlap predictions normalize any weights
    out)."""
    k = jnp.asarray(np.random.default_rng(7).normal(
        size=(3, 3, 2, 2)).astype(np.float32)) * 0.4

    def net(params, v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                v.shape, k.shape, ("NHWC", "HWIO", "NHWC")))

    x = jnp.asarray(np.random.default_rng(8).normal(size=(2, 19, 14, 2))
                    .astype(np.float32))
    roi = (8, 8)
    expected = _dense_reference(x, net, roi, 0.25, mode)
    inferer = SlidingWindowInferer(roi_size=roi, sw_batch_size=3, overlap=0.25,
                                   mode=mode, distributed=False,
                                   _force_full_map=force_full)
    out = inferer(x, net, params={})
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("sw_batch", [5,   # static gather, ragged tail group
                                      1])  # >4 groups -> lax.scan path
def test_identity_gather_paths(sw_batch):
    """Both gather paths (static unrolled slices vs traced-scan) must
    reconstruct identically."""
    inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=sw_batch,
                                   overlap=0.25, distributed=False)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(2, 20, 23, 3))
                    .astype(np.float32))
    out = inferer(x, lambda params, v: v, params={})
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_flat_batch_matches_vmap_path():
    """sw_flat_batch (all volumes' windows as one flat network batch) must
    equal the per-volume vmapped path: exact window routing (identity net)
    and a real conv net (batch-mixing bugs would show as cross-volume
    leakage)."""
    from ganslate_tpu import flags
    from ganslate_tpu.nn.layers import Conv

    x = jnp.asarray(np.random.default_rng(11).normal(size=(3, 20, 23, 2))
                    .astype(np.float32))
    # identity: reconstruction proves volume-major ordering is correct
    with flags.override(sw_flat_batch=True):
        inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=5,
                                       overlap=0.25, distributed=False)
        out = inferer(x, lambda params, v: v, params={})
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)

    net = Conv(4, (3, 3), padding=1)
    params = jax.jit(net.init)(jax.random.key(0), x[:1, :8, :8])

    def network(p, v):
        return net.apply(p, v)

    with flags.override(sw_flat_batch=False):
        inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=5,
                                       overlap=0.25, distributed=False)
        want = inferer(x, network, params=params)
    with flags.override(sw_flat_batch=True):
        inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=5,
                                       overlap=0.25, distributed=False)
        got = inferer(x, network, params=params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_cache_pins_network_identity_and_is_bounded():
    """Regression for the id(network) cache key: the cache entry must hold
    the network itself so a recycled id can never return a compiled program
    that closed over a DIFFERENT network; and the cache must not grow
    without bound across geometries/networks."""
    import weakref

    inferer = SlidingWindowInferer(roi_size=(4, 4), sw_batch_size=2,
                                   overlap=0.25, distributed=False)
    x = jnp.ones((1, 6, 6, 1), jnp.float32)

    def make_net(scale):
        def net(params, v):
            return v * scale
        return net

    net1 = make_net(2.0)
    out1 = inferer(x, net1, params={})
    ref1 = weakref.ref(net1)
    del net1, out1
    # The cache pins the network: its id cannot be recycled while cached.
    assert ref1() is not None

    # A different network object compiles (and returns) its own program.
    net2 = make_net(3.0)
    out2 = inferer(x, net2, params={})
    np.testing.assert_allclose(np.asarray(out2), 3.0 * np.asarray(x),
                               atol=1e-5)

    # LRU bound: many geometries don't grow the cache past the cap.
    for i in range(inferer._cache_max + 4):
        inferer(jnp.ones((1, 6 + i, 6, 1), jnp.float32), net2, params={})
    assert len(inferer._cache) <= inferer._cache_max
    # Evicting net1's entry released the pin.
    assert ref1() is None
