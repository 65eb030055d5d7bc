"""Train-time stochasticity tests: dropout and multiscale-D random crops must
be LIVE inside the fused train steps (keyed by the state rng), and dead at
inference (reference parity: unet dropout applied in train mode,
/root/reference/ganslate/nn/generators/unet/unet2d.py:112-121; multiscale D
takes a fresh RandSpatialCrop per call,
/root/reference/ganslate/nn/discriminators/patchgan/multiscale_patchgan3d.py:49-56)."""

import numpy as np

import jax

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.utils.builders import build_gan


def _pix2pix_unet_conf(tmp_dir, use_dropout):
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
                    # num_downs=6 puts one constant-width level in the
                    # dropout range (levels 4..num_downs-2).
                    "num_downs": 6, "ngf": 4,
                    "use_dropout": use_dropout,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 4, "n_layers": 1,
                    "in_channels": {"B": 2},
                },
                "optimizer": {"lambda_pix2pix": 100.0},
            },
            "seed": 0,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)


def _cyclegan3d_conf(tmp_dir, multiscale):
    d_target = ("ganslate.nn.discriminators.MultiScalePatchGAN3D"
                if multiscale else "ganslate.nn.discriminators.PatchGAN3D")
    d_extra = {"scales": 2} if multiscale else {}
    raw = {
        "train": {
            "output_dir": str(tmp_dir),
            "batch_size": 8,
            "cuda": False,
            "n_iters": 4,
            "n_iters_decay": 4,
            "logging": {"freq": 1},
            "dataset": {
                "_target_": "ganslate.data.UnpairedImageDataset",
                "root": str(tmp_dir),
                "num_workers": 0,
            },
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.CycleGAN",
                # pool_size=0 -> identity pool: the ONLY rng consumer left in
                # the step is the multiscale crop.
                "pool_size": 0,
                "generator": {
                    "_target_": "ganslate.nn.generators.Resnet3D",
                    "n_residual_blocks": 1, "ngf": 4,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": d_target,
                    "ndf": 4, "n_layers": 1,
                    "kernel_size": [3, 3, 3],
                    "in_channels": {"B": 1},
                    **d_extra,
                },
                "optimizer": {"lambda_AB": 10.0, "lambda_BA": 10.0,
                              "lambda_identity": 0, "proportion_ssim": 0},
            },
            "seed": 0,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)


def _setup(conf, batch):
    model = build_gan(conf)
    model.setup(example_batch=batch)
    model.set_input(batch)
    # Re-jit WITHOUT donation so the same state can be fed repeatedly.
    step = jax.jit(model.make_train_step())
    return model, step


def _losses_for_rng(model, step, seed):
    state = model.state.replace(rng=jax.random.key(seed))
    _, logs = step(state, model._batch)
    return {k: float(v) for k, v in logs["losses"].items()}


def _batch2d(rng):
    return {"A": rng.uniform(-1, 1, (8, 64, 64, 1)).astype(np.float32),
            "B": rng.uniform(-1, 1, (8, 64, 64, 1)).astype(np.float32)}


def _batch3d(rng):
    return {"A": rng.uniform(-1, 1, (8, 16, 16, 16, 1)).astype(np.float32),
            "B": rng.uniform(-1, 1, (8, 16, 16, 16, 1)).astype(np.float32)}


def test_pix2pix_dropout_is_live_in_training(tmp_path, rng):
    batch = _batch2d(rng)
    model, step = _setup(_pix2pix_unet_conf(tmp_path, use_dropout=True), batch)
    l1 = _losses_for_rng(model, step, 1)
    l2 = _losses_for_rng(model, step, 2)
    # Same params, same batch, different state rng -> different dropout
    # masks -> different losses.
    assert l1["G"] != l2["G"] or l1["pix2pix"] != l2["pix2pix"], (l1, l2)


def test_pix2pix_without_dropout_is_rng_invariant(tmp_path, rng):
    batch = _batch2d(rng)
    model, step = _setup(_pix2pix_unet_conf(tmp_path, use_dropout=False), batch)
    l1 = _losses_for_rng(model, step, 1)
    l2 = _losses_for_rng(model, step, 2)
    assert l1 == l2, (l1, l2)


def test_pix2pix_dropout_changes_training_outputs(tmp_path, rng):
    """use_dropout: True must produce a different step outcome than False
    from identical params/batch (the reference trains WITH dropout)."""
    batch = _batch2d(rng)
    model_d, step_d = _setup(_pix2pix_unet_conf(tmp_path / "d", True), batch)
    model_n, step_n = _setup(_pix2pix_unet_conf(tmp_path / "n", False), batch)
    # Same seed -> identical init params for the identical architectures.
    ld = _losses_for_rng(model_d, step_d, 3)
    ln = _losses_for_rng(model_n, step_n, 3)
    assert ld["pix2pix"] != ln["pix2pix"], (ld, ln)


def test_pix2pix_inference_is_deterministic(tmp_path, rng):
    batch = _batch2d(rng)
    model, _ = _setup(_pix2pix_unet_conf(tmp_path, use_dropout=True), batch)
    out1 = np.asarray(model.infer(model._batch["A"]))
    out2 = np.asarray(model.infer(model._batch["A"]))
    np.testing.assert_array_equal(out1, out2)


def test_multiscale_crops_are_live_in_training(tmp_path, rng):
    batch = _batch3d(rng)
    model, step = _setup(_cyclegan3d_conf(tmp_path, multiscale=True), batch)
    l1 = _losses_for_rng(model, step, 1)
    l2 = _losses_for_rng(model, step, 2)
    # Different rng -> different crop positions -> different D losses.
    assert l1["D_B"] != l2["D_B"] or l1["D_A"] != l2["D_A"], (l1, l2)


def test_plain_patchgan3d_is_rng_invariant(tmp_path, rng):
    batch = _batch3d(rng)
    model, step = _setup(_cyclegan3d_conf(tmp_path, multiscale=False), batch)
    l1 = _losses_for_rng(model, step, 1)
    l2 = _losses_for_rng(model, step, 2)
    assert l1 == l2, (l1, l2)
