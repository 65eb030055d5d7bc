"""Halo-exchange spatial sharding tests on the 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ganslate_tpu.parallel import get_mesh
from ganslate_tpu.parallel.spatial import (halo_exchange, sharded_conv,
                                           spatially_sharded_infer)


def test_halo_exchange_matches_gather():
    mesh = get_mesh()
    n = mesh.devices.size
    x = jnp.arange(n * 4 * 3, dtype=jnp.float32).reshape(n * 4, 3)

    def worker(x_local):
        return halo_exchange(x_local, 2, "data", 0)

    out = shard_map(worker, mesh=mesh, in_specs=P("data", None),
                    out_specs=P("data", None), check_vma=False)(x)
    # Each local shard is 4 rows -> with halo 2 each side -> 8 rows; the
    # sharded output dim is n*8. Check shard 1: rows 2..4 of global before,
    # its own 4..8, then 8..10.
    out = np.asarray(out).reshape(n, 8, 3)
    xg = np.asarray(x)
    np.testing.assert_array_equal(out[1, :2], xg[2:4])
    np.testing.assert_array_equal(out[1, 2:6], xg[4:8])
    np.testing.assert_array_equal(out[1, 6:], xg[8:10])
    # Global boundaries are zero-padded.
    np.testing.assert_array_equal(out[0, :2], np.zeros((2, 3)))
    np.testing.assert_array_equal(out[-1, 6:], np.zeros((2, 3)))


def test_sharded_conv_exact():
    mesh = get_mesh()
    n = mesh.devices.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, n * 4, 16, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 5, 3, 7)).astype(np.float32))

    # Reference: plain SAME conv.
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def worker(x_local):
        return sharded_conv(x_local, kernel, "data", dim=1)

    got = shard_map(worker, mesh=mesh, in_specs=P(None, "data", None, None),
                    out_specs=P(None, "data", None, None), check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_spatially_sharded_infer_conv_stack():
    """A 2-layer conv net sharded over depth with a sufficient halo matches
    the unsharded computation exactly."""
    mesh = get_mesh()
    n = mesh.devices.size
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, n * 2, 8, 8, 2)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 4)).astype(np.float32) * 0.2)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 2)).astype(np.float32) * 0.2)

    def net(params, v):
        dn = jax.lax.conv_dimension_numbers(v.shape, params["k1"].shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        h = jax.lax.conv_general_dilated(v, params["k1"], (1, 1, 1), "SAME",
                                         dimension_numbers=dn)
        h = jnp.tanh(h)
        dn = jax.lax.conv_dimension_numbers(h.shape, params["k2"].shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(h, params["k2"], (1, 1, 1), "SAME",
                                            dimension_numbers=dn)

    params = {"k1": k1, "k2": k2}
    # Defined semantic: equals the net on a halo-zero-padded volume, cropped.
    halo = 2  # receptive-field half-width of two k3 convs
    x_pad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0), (0, 0)))
    want = net(params, x_pad)[:, halo:-halo]
    got = spatially_sharded_infer(net, params, x, mesh, halo=halo, dim=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # And interior shard boundaries match the UNPADDED global computation.
    want_plain = np.asarray(net(params, x))
    got_np = np.asarray(got)
    np.testing.assert_allclose(got_np[:, halo:-halo], want_plain[:, halo:-halo],
                               atol=1e-4)


def test_engine_config_spatial_sharding_path(tmp_path):
    """`infer.spatial_sharding` in the YAML routes BaseEngineWithInference
    through the halo-exchange full-volume path (config-reachable, not just a
    library API)."""
    import copy

    from ganslate_tpu.configs.config import Config
    from ganslate_tpu.configs.omega import Conf
    from ganslate_tpu.configs.utils import init_config
    from ganslate_tpu.engines.inferer import Inferer

    raw = {
        "train": {
            "output_dir": str(tmp_path),
            "batch_size": 8,
            "cuda": False,
            "n_iters": 2,
            "n_iters_decay": 0,
            "dataset": {
                "_target_": "ganslate.data.UnpairedImageDataset",
                "root": str(tmp_path),
                "num_workers": 0,
            },
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.CycleGAN",
                # norm_type 'none' -> spatially sharded inference is EXACT
                # (instance-norm stats would be shard-local, see
                # SpatialShardingConfig).
                "norm_type": "none",
                "generator": {
                    "_target_": "ganslate.nn.generators.Resnet3D",
                    "n_residual_blocks": 1, "ngf": 4,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN3D",
                    "ndf": 4, "n_layers": 1, "in_channels": {"B": 1},
                },
            },
            "seed": 0,
        },
        "infer": {
            "is_deployment": True,
            "spatial_sharding": {"halo": 8, "dim": 0},
            "checkpointing": {"load_iter": 1},
        },
    }
    conf = init_config(Conf.create(raw), config_class=Config)

    # Give the inferer a live model (deployment mode skips loader/ckpt here).
    from ganslate_tpu.utils.builders import build_gan
    train_conf = copy.deepcopy(conf)
    train_conf.mode = "train"
    rng = np.random.default_rng(0)
    n = get_mesh().devices.size
    batch = {k: rng.uniform(-1, 1, (8, 8 * n, 8, 8, 1)).astype(np.float32)
             for k in ("A", "B")}
    model = build_gan(train_conf)
    model.setup(example_batch=batch)

    inferer = Inferer.__new__(Inferer)
    from ganslate_tpu.engines.base import BaseEngineWithInference
    BaseEngineWithInference.__init__(inferer, conf)
    inferer.model = model
    assert inferer.spatial_sharding is not None

    vol = rng.uniform(-1, 1, (1, 8 * n, 8, 8, 1)).astype(np.float32)
    got = np.asarray(inferer.infer(vol))
    want = np.asarray(model.infer(jnp.asarray(vol)))
    assert got.shape == want.shape
    # Norm-free generator + halo >= receptive-field half-width -> interior
    # voxels match the unsharded computation tightly (shard-boundary slices
    # see zero-halos at the volume edges, same as 'SAME' padding).
    np.testing.assert_allclose(got[:, 2:-2], want[:, 2:-2], atol=1e-4)


# ---------------------------------------- spatially-sharded TRAINING (GSPMD)


def test_spatial_train_gradient_parity():
    """Gradients of a V-Net objective with the volume sharded over a
    `spatial` mesh axis equal the unsharded gradients — XLA/GSPMD inserts
    the conv halo exchanges and globalizes the instance-norm reductions, so
    spatially-sharded training (configs/training.py `spatial_mesh`) is
    exact, not approximate."""
    from jax.sharding import NamedSharding
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.parallel.mesh import make_mesh

    model = Vnet3D(in_channels=1, out_channels=1, first_layer_channels=4,
                   down_blocks=(1, 1), up_blocks=(1, 1),
                   use_memory_saving=False, use_inverse=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 16, 8, 8, 1)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]

    def loss(params, x, y):
        return jnp.mean((model.apply({"params": params}, x) - y) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    l_ref, g_ref = grad_fn(params, x, y)

    mesh = make_mesh({"data": 2, "spatial": 4})
    spec = NamedSharding(mesh, P("data", "spatial"))
    l_sh, g_sh = grad_fn(params, jax.device_put(x, spec),
                         jax.device_put(y, spec))

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-6)
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_sh)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"grad mismatch at {pa}")


def test_spatial_mesh_train_step(tmp_path):
    """One fused CycleGAN train step on a {'data': 2, 'spatial': 4} mesh
    (config `train.spatial_mesh`) reproduces the 8-way-data losses — the
    full training algorithm is exact under volume sharding."""
    from ganslate_tpu.parallel import mesh as mesh_mod
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    rng = np.random.default_rng(0)
    batch = {k: rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)
             for k in ("A", "B")}

    def one_step(spatial):
        mesh_mod.set_mesh(
            mesh_mod.make_mesh({"data": 2, "spatial": 4} if spatial
                               else {"data": -1}))
        try:
            conf = make_cyclegan_conf(output_dir=str(tmp_path),
                                      batch_size=2, image_size=32, channels=1,
                                      n_residual_blocks=1, ngf=8, ndf=8,
                                      n_layers_D=1, pool_size=0,
                                      mixed_precision=False)
            model = build_gan(conf)
            model.setup(example_batch=batch)
            model.set_input(batch)
            model.optimize_parameters(sync=True)
            return {k: float(v) for k, v in model.losses.items()}
        finally:
            mesh_mod.set_mesh(mesh_mod.make_mesh())

    losses_plain = one_step(spatial=False)
    losses_spatial = one_step(spatial=True)
    assert losses_plain.keys() == losses_spatial.keys()
    for k in losses_plain:
        np.testing.assert_allclose(losses_spatial[k], losses_plain[k],
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_gspmd_spatial_infer_exact_with_instance_norm():
    """`spatially_sharded_infer_gspmd` equals the unsharded forward even for
    a net WITH instance norm — GSPMD globalizes the norm reductions, which
    is exactly the case where the manual-halo path is only approximate
    (parallel/spatial.py docstring). This lifts the per-shard-stats caveat
    for inference (engine method='gspmd', the default)."""
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.parallel.spatial import spatially_sharded_infer_gspmd

    mesh = get_mesh()
    n = mesh.devices.size
    model = Vnet3D(in_channels=1, out_channels=1, first_layer_channels=4,
                   down_blocks=(1, 1), up_blocks=(1, 1),
                   use_memory_saving=False, use_inverse=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 4 * n, 8, 8, 1)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]

    def fn(params, v):
        return model.apply({"params": params}, v)

    want = np.asarray(jax.jit(fn)(params, x))
    got = np.asarray(spatially_sharded_infer_gspmd(fn, params, x, mesh, dim=1))
    # Exact up to reduction-order float noise (instance-norm psum).
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
