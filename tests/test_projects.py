"""Project extension contract tests: project dirs import as module `project`,
their `_target_` classes resolve, and a custom GAN subclass
(HX4CycleGANBalanced, with asymmetric channels and custom train graph)
trains on the mesh."""

from pathlib import Path

import numpy as np
import pytest

import jax

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.utils.builders import build_gan

REPO = Path(__file__).resolve().parents[1]


def test_all_experiment_yamls_parse():
    """Every project experiment YAML builds a fully-typed config tree."""
    yamls = sorted((REPO / "projects").glob("*/experiments/*.yaml"))
    assert len(yamls) >= 10
    for path in yamls:
        conf = Conf.load(path)
        conf.project = str(path.parents[1])
        conf = init_config(conf, config_class=Config)
        assert conf.train.gan._target_, path
        assert conf.train.dataset._target_, path


def _hx4_conf(tmp_dir):
    raw = {
        "project": str(REPO / "projects" / "maastro_hx4_pet_translation"),
        "train": {
            "output_dir": str(tmp_dir),
            "batch_size": 8,
            "cuda": False,
            "n_iters": 4, "n_iters_decay": 4,
            "logging": {"freq": 1,
                        "multi_modality_split": {"A": [1, 1], "B": [1, 1]}},
            "dataset": {
                "_target_": "project.datasets.train_dataset.HX4PETTranslationTrainDataset",
                "root": str(tmp_dir), "num_workers": 0,
            },
            "gan": {
                "_target_": "project.modules.HX4CycleGANBalanced",
                "pool_size": 4,
                "generator": {
                    "_target_": "ganslate.nn.generators.Unet3D",
                    "num_downs": 3, "ngf": 8,
                    "in_out_channels": {"AB": [2, 1], "BA": [2, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN3D",
                    "ndf": 8, "n_layers": 1,
                    "in_channels": {"B": 1, "A": 1},
                },
                "optimizer": {"lambda_AB": 10.0, "lambda_BA": 10.0,
                              "lambda_identity": 0, "proportion_ssim": 0},
            },
            "metrics": {"discriminator_evolution": True, "ssim": False},
            "seed": 0,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)


def test_hx4_custom_gan_trains(tmp_path):
    conf = _hx4_conf(tmp_path)
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.uniform(-1, 1, (8, 8, 16, 16, 2)).astype(np.float32),
        "B": rng.uniform(-1, 1, (8, 8, 16, 16, 2)).astype(np.float32),
    }
    model = build_gan(conf)
    assert type(model).__name__ == "HX4CycleGANBalanced"
    model.setup(example_batch=batch)

    params_before = jax.device_get(model.state.params)
    model.set_input(batch)
    model.optimize_parameters(sync=True)

    for name, value in model.losses.items():
        assert np.isfinite(float(value)), name
    # Visuals keep the 2-channel layout (PET + zero-filled CT channel).
    assert model.visuals["fake_B"].shape == (8, 8, 16, 16, 2)
    assert np.allclose(np.asarray(model.visuals["fake_B"])[..., 1], 0)

    params_after = jax.device_get(model.state.params)
    for net in ("G_AB", "G_BA", "D_B", "D_A"):
        changed = any(not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(params_before[net]),
            jax.tree_util.tree_leaves(params_after[net])))
        assert changed, f"{net} did not update"

    # Inference pads the dummy channel back.
    out = model.infer(jax.numpy.asarray(batch["A"]))
    assert out.shape == (8, 8, 16, 16, 2)
