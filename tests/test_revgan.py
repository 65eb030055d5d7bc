"""RevGAN tests: Piresnet3D forward/inverse geometry, memory-constant core
gradient flow, full fused train step on the mesh, inverse-direction infer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.nn.generators import Piresnet3D
from ganslate_tpu.utils.builders import build_gan


def test_piresnet_shapes_and_directions():
    model = Piresnet3D(in_channels=1, out_channels=1, depth=2,
                       first_layer_channels=4, spatial_dims=3)
    x = jnp.zeros((1, 8, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    # Both directions' convs exist (use_inverse=True default).
    assert {"down_ab", "up_ab", "down_ba", "up_ba", "core"} <= set(params.keys())

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    bwd = jax.jit(lambda p, x: model.apply({"params": p}, x, inverse=True))
    assert fwd(params, x).shape == (1, 8, 16, 16, 1)
    assert bwd(params, x).shape == (1, 8, 16, 16, 1)
    # Different directions use different convs -> different outputs.
    xr = jax.random.uniform(jax.random.key(1), x.shape, minval=-1)
    assert not np.allclose(np.asarray(fwd(params, xr)), np.asarray(bwd(params, xr)))


def test_piresnet_no_inverse_raises():
    model = Piresnet3D(in_channels=1, out_channels=1, depth=1,
                       first_layer_channels=4, use_inverse=False)
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    assert "down_ba" not in params
    with pytest.raises(ValueError):
        model.apply({"params": params}, x, inverse=True)


def _revgan_conf(tmp_dir):
    raw = {
        "train": {
            "output_dir": str(tmp_dir),
            "batch_size": 8,
            "cuda": False,
            "n_iters": 4, "n_iters_decay": 4,
            "logging": {"freq": 1},
            "dataset": {
                "_target_": "ganslate.data.UnpairedImageDataset",
                "root": str(tmp_dir), "num_workers": 0,
            },
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.RevGAN",
                "pool_size": 4,
                "generator": {
                    "_target_": "ganslate.nn.generators.Piresnet3D",
                    "depth": 2, "first_layer_channels": 4,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN3D",
                    "ndf": 8, "n_layers": 1, "in_channels": {"B": 1},
                },
                "optimizer": {"lambda_AB": 10.0, "lambda_BA": 10.0,
                              "lambda_identity": 0, "proportion_ssim": 0},
            },
            "seed": 0,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)


def test_revgan_step_and_infer(tmp_path):
    conf = _revgan_conf(tmp_path)
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.uniform(-1, 1, (8, 8, 16, 16, 1)).astype(np.float32),
        "B": rng.uniform(-1, 1, (8, 8, 16, 16, 1)).astype(np.float32),
    }
    model = build_gan(conf)
    model.setup(example_batch=batch)

    params_before = jax.device_get(model.state.params)
    model.set_input(batch)
    model.optimize_parameters(sync=True)

    expected = {"G_AB", "G_BA", "cycle_A", "cycle_B", "D_B", "D_A"}
    assert expected.issubset(model.losses)
    for name, value in model.losses.items():
        assert np.isfinite(float(value)), name

    params_after = jax.device_get(model.state.params)
    for net in ("G", "D_B", "D_A"):
        changed = any(not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(params_before[net]),
            jax.tree_util.tree_leaves(params_after[net])))
        assert changed, f"{net} did not update"
    # The shared invertible core must receive gradients from both cycles.
    core_changed = any(not np.allclose(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(params_before["G"]["core"]),
        jax.tree_util.tree_leaves(params_after["G"]["core"])))
    assert core_changed, "invertible core did not update"

    out_ab = model.infer(jnp.asarray(batch["A"]))
    out_ba = model.infer(jnp.asarray(batch["B"]), direction="BA")
    assert out_ab.shape == batch["A"].shape
    assert out_ba.shape == batch["B"].shape
