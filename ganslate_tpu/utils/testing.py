"""Programmatic experiment configs for benchmarks, smoke tests and the graft
entry — a CycleGAN setup mirroring the reference's headline benchmark config
(/root/reference/projects/horse2zebra/experiments/default.yaml: Resnet2D with
9 residual blocks + 70x70 PatchGAN, LSGAN, lambda 10/10)."""

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config


def make_cyclegan_conf(output_dir: str = "/tmp/ganslate_tpu_bench",
                       batch_size: int = 1,
                       image_size: int = 256,
                       channels: int = 3,
                       n_residual_blocks: int = 9,
                       ngf: int = 64,
                       ndf: int = 64,
                       n_layers_D: int = 3,
                       pool_size: int = 50,
                       mixed_precision: bool = True,
                       n_iters: int = 100,
                       seed: int = 0):
    raw = {
        "train": {
            "output_dir": output_dir,
            "batch_size": batch_size,
            "cuda": True,
            "mixed_precision": mixed_precision,
            "n_iters": n_iters,
            "n_iters_decay": n_iters,
            "logging": {"freq": 1000000},
            "checkpointing": {"freq": 1000000},
            "dataset": {
                "_target_": "ganslate.data.UnpairedImageDataset",
                "root": output_dir,
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
                    "n_residual_blocks": n_residual_blocks,
                    "ngf": ngf,
                    "in_out_channels": {"AB": [channels, channels]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": ndf,
                    "n_layers": n_layers_D,
                    "in_channels": {"B": channels},
                },
                "optimizer": {
                    "lambda_AB": 10.0, "lambda_BA": 10.0,
                    "lambda_identity": 0, "proportion_ssim": 0,
                    "lr_D": 0.0002, "lr_G": 0.0002,
                },
            },
            "seed": seed,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)
