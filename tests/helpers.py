"""Shared test fixtures: tiny experiment configs built programmatically."""

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config


def tiny_cyclegan_conf(tmp_dir, batch_size=8, image_size=32, channels=1,
                       pool_size=4, **overrides):
    """A minimal CycleGAN experiment config (tiny nets, tiny images)."""
    raw = {
        "train": {
            "output_dir": str(tmp_dir),
            "batch_size": batch_size,
            "cuda": False,
            "n_iters": 4,
            "n_iters_decay": 4,
            "logging": {"freq": 1},
            "checkpointing": {"freq": 2},
            "dataset": {
                "_target_": "ganslate.data.UnpairedImageDataset",
                "root": str(tmp_dir),
                "num_workers": 0,
                "image_channels": channels,
                "preprocess": ["resize"],
                "load_size": [image_size, image_size],
                "final_size": [image_size, image_size],
            },
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.CycleGAN",
                "pool_size": pool_size,
                "generator": {
                    "_target_": "ganslate.nn.generators.Resnet2D",
                    "n_residual_blocks": 1,
                    "ngf": 8,
                    "in_out_channels": {"AB": [channels, channels]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 8,
                    "n_layers": 1,
                    "in_channels": {"B": channels},
                },
                "optimizer": {
                    "lambda_AB": 10.0,
                    "lambda_BA": 10.0,
                    "lambda_identity": 0.0,
                    "proportion_ssim": 0.0,
                    "lr_D": 0.0002,
                    "lr_G": 0.0002,
                },
            },
            "metrics": {"discriminator_evolution": True, "ssim": True},
            "seed": 0,
        },
    }
    conf = Conf.create(raw)
    for path, value in overrides.items():
        conf.update(path, value)
    return init_config(conf, config_class=Config)
