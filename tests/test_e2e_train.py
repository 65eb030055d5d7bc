"""End-to-end smoke test (the reference's own test strategy,
/root/reference/tests/test_first_run.py, minus the network download): a tiny
synthetic unpaired PNG dataset, a full CycleGAN training run with validation
and checkpointing through the real Trainer engine, then inference through the
real Inferer engine."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.engines.inferer import Inferer
from ganslate_tpu.engines.trainer import Trainer


def make_png_dataset(root: Path, n: int = 8, size: int = 32):
    rng = np.random.default_rng(42)
    for domain in ("A", "B"):
        d = root / domain
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{domain.lower()}{i}.png")


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    make_png_dataset(data_dir)
    output_dir = root / "out"

    dataset = {
        "_target_": "ganslate.data.UnpairedImageDataset",
        "root": str(data_dir),
        "num_workers": 2,
        "image_channels": 3,
        "preprocess": ["resize"],
        "load_size": [32, 32],
        "final_size": [32, 32],
    }
    raw = {
        "train": {
            "output_dir": str(output_dir),
            "batch_size": 8,
            "cuda": False,
            "n_iters": 2,
            "n_iters_decay": 2,
            "logging": {"freq": 1},
            "checkpointing": {"freq": 4},
            "dataset": dict(dataset),
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.CycleGAN",
                "pool_size": 4,
                "generator": {
                    "_target_": "ganslate.nn.generators.Resnet2D",
                    "n_residual_blocks": 1, "ngf": 8,
                    "in_out_channels": {"AB": [3, 3]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 8, "n_layers": 1, "in_channels": {"B": 3},
                },
                "optimizer": {"lambda_AB": 10.0, "lambda_BA": 10.0,
                              "lambda_identity": 0, "proportion_ssim": 0},
            },
            "seed": 0,
        },
        "val": {
            "freq": 2,
            "dataset": dict(dataset),
            "metrics": {"cycle_metrics": True, "nmi": True, "histogram_chi2": True},
        },
        "infer": {
            "checkpointing": {"load_iter": 4},
            "dataset": dict(dataset),
        },
    }
    conf = init_config(Conf.create(raw), config_class=Config)
    return conf, output_dir


def test_training_runs_end_to_end(experiment):
    conf, output_dir = experiment
    trainer = Trainer(conf)
    trainer.run()

    # Checkpoint written at iteration 4.
    assert (output_dir / "checkpoints" / "4").exists()
    # Config dump + training log + logged images exist.
    assert (output_dir / "train" / "train_config.yaml").exists()
    images = list((output_dir / "train" / "images").glob("*.png"))
    assert images, "no training visuals were saved"
    # Validation produced visuals too.
    val_images = list((output_dir / "val" / "images").rglob("*.png"))
    assert val_images, "no validation visuals were saved"


def test_inference_runs_from_checkpoint(experiment):
    conf, output_dir = experiment
    inferer = Inferer(conf)
    inferer.run()
    infer_images = list((output_dir / "infer" / "images").glob("*.png"))
    assert infer_images, "no inference visuals were saved"


def test_deployment_mode_infer(experiment):
    conf, output_dir = experiment
    import copy
    conf = copy.deepcopy(conf)
    conf.infer.is_deployment = True
    inferer = Inferer(conf)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    out = inferer.infer(x)
    assert np.asarray(out).shape == (1, 32, 32, 3)


def test_wire_dtype_parity(experiment):
    """infer.wire_dtype defaults to bfloat16 (halved serving transfers); the
    prediction must come back bf16 and match the fp32-wire result to bf16
    tolerance (VERDICT r4 item 6)."""
    import copy

    import ml_dtypes

    conf, output_dir = experiment
    conf = copy.deepcopy(conf)
    conf.infer.is_deployment = True
    x = np.random.default_rng(1).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)

    out_bf = np.asarray(Inferer(conf).infer(x))
    assert out_bf.dtype == ml_dtypes.bfloat16

    conf_f32 = copy.deepcopy(conf)
    conf_f32.infer.wire_dtype = "float32"
    out_f32 = np.asarray(Inferer(conf_f32).infer(x))
    assert out_f32.dtype == np.float32

    np.testing.assert_allclose(out_bf.astype(np.float32), out_f32,
                               rtol=5e-2, atol=3e-2)


def test_tester_engine_runs_from_checkpoint(experiment):
    """`ganslate test` path: Tester engine loads the checkpoint, runs the
    paired metric suite over the dataset, and writes the per-sample CSV."""
    from ganslate_tpu.engines.validator_tester import Tester

    conf, output_dir = experiment
    dataset = conf.infer.dataset.to_container()
    dataset["_target_"] = "ganslate.data.PairedImageDataset"
    raw_test = {
        "checkpointing": {"load_iter": 4},
        "dataset": dataset,
        "metrics": {"ssim": True, "psnr": True, "save_to_csv": True},
    }

    # FID through the REAL engine path when torch is importable: weights
    # come from the in-repo torchvision mirror (tests/torch_inception.py),
    # exercising the .pth load -> flax import -> streaming feature merge.
    try:
        import torch
        from .torch_inception import InceptionV3 as TorchInceptionV3
        fid_weights = output_dir.parent / "inception_v3.pth"
        if not fid_weights.exists():
            torch.save(TorchInceptionV3().state_dict(), str(fid_weights))
        raw_test["metrics"]["fid"] = True
        raw_test["metrics"]["fid_weights"] = str(fid_weights)
    except ImportError:
        fid_weights = None

    test_conf = init_config(
        Conf.create({"train": conf.train.to_container(resolve=False),
                     "test": raw_test}),
        config_class=Config)

    tester = Tester(test_conf)
    tester.run()
    csvs = list((output_dir / "test").rglob("metrics.csv"))
    assert csvs, "tester did not write the metrics CSV"
    text = csvs[0].read_text()
    assert "ssim" in text.lower() and "psnr" in text.lower()
    if fid_weights is not None:
        log_text = (output_dir / "test_log.txt").read_text()
        assert "fid" in log_text.lower(), \
            "engine-path FID did not reach the test log"
