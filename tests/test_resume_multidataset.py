"""Resume-training semantics and multi-dataset validation loaders."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.engines.trainer import Trainer
from ganslate_tpu.utils.builders import build_loader


def make_pngs(root: Path, n=8, size=32):
    rng = np.random.default_rng(0)
    for domain in ("A", "B"):
        d = root / domain
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8)
                            .astype(np.uint8)).save(d / f"{i}.png")


def _conf(data_dir, output_dir, load_iter=None, multi=False):
    dataset = {
        "_target_": "ganslate.data.UnpairedImageDataset",
        "root": str(data_dir), "num_workers": 0, "image_channels": 3,
        "preprocess": ["resize"], "load_size": [32, 32], "final_size": [32, 32],
    }
    raw = {
        "train": {
            "output_dir": str(output_dir),
            "batch_size": 8, "cuda": False,
            "n_iters": 2, "n_iters_decay": 2,
            "logging": {"freq": 100},
            "checkpointing": {"freq": 2,
                              **({"load_iter": load_iter} if load_iter else {})},
            "dataset": dict(dataset),
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.CycleGAN",
                "pool_size": 2,
                "generator": {"_target_": "ganslate.nn.generators.Resnet2D",
                              "n_residual_blocks": 1, "ngf": 8,
                              "in_out_channels": {"AB": [3, 3]}},
                "discriminator": {"_target_": "ganslate.nn.discriminators.PatchGAN2D",
                                  "ndf": 8, "n_layers": 1, "in_channels": {"B": 3}},
                "optimizer": {"lambda_AB": 10.0, "lambda_BA": 10.0,
                              "lambda_identity": 0, "proportion_ssim": 0},
            },
            "seed": 0,
        },
    }
    if multi:
        raw["val"] = {
            "freq": 100,
            "multi_dataset": {"setA": dict(dataset), "setB": dict(dataset)},
        }
    return init_config(Conf.create(raw), config_class=Config)


def test_resume_training(tmp_path):
    data = tmp_path / "data"
    make_pngs(data)
    out = tmp_path / "out"

    # First run: 4 iterations, checkpoints at 2 and 4.
    trainer = Trainer(_conf(data, out))
    trainer.run()
    assert (out / "checkpoints" / "4").exists()
    step_after_first = int(trainer.model.state.step)
    assert step_after_first == 4

    # Resume from iter 4: starts at 5; n_iters spans the full schedule
    # (reference semantics: 'define n_iters relative to the loaded iteration').
    conf2 = _conf(data, out, load_iter=4)
    conf2.train.n_iters = 4
    conf2.train.n_iters_decay = 4
    trainer2 = Trainer(conf2)
    assert trainer2.iters.start == 5
    assert int(trainer2.model.state.step) == 4  # restored
    trainer2.run()
    assert int(trainer2.model.state.step) == 8
    assert (out / "checkpoints" / "8").exists()


def test_multi_dataset_val_loaders(tmp_path):
    data = tmp_path / "data"
    make_pngs(data)
    conf = _conf(data, tmp_path / "out", multi=True)

    import copy
    val_conf = copy.deepcopy(conf)
    val_conf.mode = "val"
    loaders = build_loader(val_conf)
    assert set(loaders.keys()) == {"setA", "setB"}
    batch = next(iter(loaders["setA"]))
    assert batch["A"].shape[1:] == (32, 32, 3)
