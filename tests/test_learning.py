"""Training-dynamics test: a tiny Pix2Pix must actually LEARN a synthetic
mapping (B = -A, channel inversion) — guards against sign-flipped losses and
broken gradient paths that finiteness-only tests cannot catch."""

import numpy as np

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.utils.builders import build_gan


def _conf(tmp_dir, n_iters):
    raw = {
        "train": {
            "output_dir": str(tmp_dir),
            "batch_size": 8,
            "cuda": False,
            "n_iters": n_iters,
            "n_iters_decay": 0,
            "logging": {"freq": 1000},
            "dataset": {
                "_target_": "ganslate.data.PairedImageDataset",
                "root": str(tmp_dir),
                "num_workers": 0,
            },
            "gan": {
                "_target_": "ganslate.nn.gans.paired.Pix2PixConditionalGAN",
                "generator": {
                    "_target_": "ganslate.nn.generators.Resnet2D",
                    "n_residual_blocks": 1, "ngf": 8,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 8, "n_layers": 1,
                    "in_channels": {"B": 2},
                },
                "optimizer": {"lambda_pix2pix": 100.0,
                              "lr_G": 2e-3, "lr_D": 2e-4},
            },
            "seed": 0,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)


def test_pix2pix_learns_channel_inversion(tmp_path):
    n_iters = 800
    conf = _conf(tmp_path, n_iters)
    rng = np.random.default_rng(0)

    def make_batch():
        a = rng.uniform(-1, 1, (8, 16, 16, 1)).astype(np.float32)
        return {"A": a, "B": -a}

    model = build_gan(conf)
    model.setup(example_batch=make_batch())

    def current_l1():
        batch = make_batch()
        fake = np.asarray(model.infer(batch["A"]))
        return float(np.abs(fake - batch["B"]).mean())

    l1_init = current_l1()
    for i in range(n_iters):
        model.set_input(make_batch())
        # Fence periodically (like the trainer on log-freq iterations) so the
        # async dispatch queue stays bounded.
        model.optimize_parameters(sync=(i % 20 == 0))
    l1_final = current_l1()

    # The mapping is trivially learnable; L1 must drop materially. A broken
    # gradient path or sign-flipped loss keeps it near the initial value.
    assert l1_final < 0.5 * l1_init, (l1_init, l1_final)
    assert l1_final < 0.35, (l1_init, l1_final)
