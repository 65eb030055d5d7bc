"""Distributed sliding-window inference: window grid sharded over the
8-device mesh must produce the same result as the single-device path."""

import numpy as np

import jax
import jax.numpy as jnp

from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer


def _net(params, v):
    return jnp.tanh(v * params["scale"])


def test_distributed_matches_single_device():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 12, 24, 24, 1))
                    .astype(np.float32))
    params = {"scale": jnp.float32(1.7)}

    single = SlidingWindowInferer(roi_size=(4, 8, 8), sw_batch_size=2,
                                  overlap=0.25, distributed=False)
    multi = SlidingWindowInferer(roi_size=(4, 8, 8), sw_batch_size=2,
                                 overlap=0.25, distributed=True)

    out_single = np.asarray(single(x, _net, params))
    out_multi = np.asarray(multi(x, _net, params))
    np.testing.assert_allclose(out_multi, out_single, atol=1e-5)


def test_distributed_identity():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 20, 20, 3))
                    .astype(np.float32))
    inferer = SlidingWindowInferer(roi_size=(8, 8), sw_batch_size=3,
                                   overlap=0.5, distributed=True)
    out = inferer(x, lambda p, v: v, params={})
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_distributed_on_spatial_mesh_uses_data_axis_only():
    """A mesh with extra axes (train.spatial_mesh produces {data, spatial})
    must still blend EVERY window group: the grid is sharded over the data
    axis only and replicated across the rest. Regression: splitting by total
    device count dropped 3/4 of the window groups here (weight-0 voxels ->
    NaN after the final out/w division)."""
    from ganslate_tpu.parallel import make_mesh
    from ganslate_tpu.parallel import mesh as mesh_mod

    saved = mesh_mod.get_mesh()
    try:
        mesh_mod.set_mesh(make_mesh({"data": 2, "spatial": 4}))
        x = jnp.asarray(np.random.default_rng(2)
                        .normal(size=(1, 12, 24, 24, 1)).astype(np.float32))
        params = {"scale": jnp.float32(1.7)}
        single = SlidingWindowInferer(roi_size=(4, 8, 8), sw_batch_size=2,
                                      overlap=0.25, distributed=False)
        multi = SlidingWindowInferer(roi_size=(4, 8, 8), sw_batch_size=2,
                                     overlap=0.25, distributed=True)
        out_single = np.asarray(single(x, _net, params))
        out_multi = np.asarray(multi(x, _net, params))
        assert np.isfinite(out_multi).all()
        np.testing.assert_allclose(out_multi, out_single, atol=1e-5)
    finally:
        mesh_mod.set_mesh(saved)
