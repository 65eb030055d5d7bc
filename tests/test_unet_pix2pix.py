"""U-Net generator parity tests + Pix2Pix train-step tests on the 8-device
mesh (paired data, conditional D)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.nn.generators import Unet2D, Unet3D
from ganslate_tpu.utils.builders import build_gan

from .test_networks import n_params, out_shape, param_shapes


def test_unet2d_params_and_shape():
    model = Unet2D(in_channels=3, out_channels=3, num_downs=7)
    shapes = param_shapes(model, (1, 128, 128, 3))
    # Golden: torch Unet2D(3, 3, 7, 'instance', 64) has 41,825,667 params.
    assert n_params(shapes) == 41_825_667
    assert out_shape(model, shapes, (1, 128, 128, 3)) == (1, 128, 128, 3)

    model8 = Unet2D(in_channels=3, out_channels=3, num_downs=8)
    shapes8 = param_shapes(model8, (1, 256, 256, 3))
    # Golden: torch Unet2D(3, 3, 8, 'instance', 64) has 54,409,603 params.
    assert n_params(shapes8) == 54_409_603
    assert out_shape(model8, shapes8, (1, 256, 256, 3)) == (1, 256, 256, 3)


def test_unet3d_shape():
    model = Unet3D(in_channels=1, out_channels=1, num_downs=4, ngf=8)
    shapes = param_shapes(model, (1, 16, 16, 16, 1))
    assert out_shape(model, shapes, (1, 16, 16, 16, 1)) == (1, 16, 16, 16, 1)


def _pix2pix_conf(tmp_dir):
    raw = {
        "train": {
            "output_dir": str(tmp_dir),
            "batch_size": 8,
            "cuda": False,
            "n_iters": 4,
            "n_iters_decay": 4,
            "logging": {"freq": 1},
            "dataset": {
                "_target_": "ganslate.data.PairedImageDataset",
                "root": str(tmp_dir),
                "num_workers": 0,
            },
            "gan": {
                "_target_": "ganslate.nn.gans.paired.Pix2PixConditionalGAN",
                "generator": {
                    "_target_": "ganslate.nn.generators.Unet2D",
                    "num_downs": 5, "ngf": 8,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 8, "n_layers": 1,
                    # Conditional D input: ch(A) + ch(B).
                    "in_channels": {"B": 2},
                },
                "optimizer": {"lambda_pix2pix": 100.0},
            },
            "metrics": {"discriminator_evolution": True, "ssim": True},
            "seed": 0,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)


@pytest.fixture(scope="module")
def pix2pix(tmp_path_factory):
    conf = _pix2pix_conf(tmp_path_factory.mktemp("pix2pix"))
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
        "B": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
    }
    model = build_gan(conf)
    model.setup(example_batch=batch)
    return model, batch


def test_pix2pix_step(pix2pix):
    model, batch = pix2pix
    params_before = jax.device_get(model.state.params)
    model.set_input(batch)
    model.optimize_parameters(sync=True)

    assert {"G", "pix2pix", "D"}.issubset(model.losses)
    for name, value in model.losses.items():
        assert np.isfinite(float(value))
    # ssim_A/rec metrics absent (no cycle), but D evolution present.
    assert {"D_real", "D_fake"}.issubset(model.metrics)
    assert model.visuals["fake_B"].shape == (8, 32, 32, 1)

    params_after = jax.device_get(model.state.params)
    for net in ("G", "D"):
        changed = any(not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(params_before[net]),
            jax.tree_util.tree_leaves(params_after[net])))
        assert changed, f"{net} did not update"


def test_pix2pix_infer(pix2pix):
    model, batch = pix2pix
    out = model.infer(jnp.asarray(batch["A"]))
    assert out.shape == (8, 32, 32, 1)
    with pytest.raises(AssertionError):
        model.infer(jnp.asarray(batch["A"]), direction="BA")
