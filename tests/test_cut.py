"""CUT/FastCUT train-step tests: PatchNCE golden value, channel probing,
full fused step on the 8-device mesh, FastCUT flip path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.nn.losses.cut_losses import PatchNCELoss
from ganslate_tpu.utils.builders import build_gan


def _nce_conf(batch_size=2, nce_T=0.07):
    return Conf.create({
        "mode": "train",
        "train": {"batch_size": batch_size,
                  "gan": {"optimizer": {"nce_T": nce_T}}}})


def test_patchnce_golden():
    """Cross-check against a straight numpy transcription of the reference
    formula (cut_losses.py:18-43)."""
    rng = np.random.default_rng(0)
    b, p, c = 2, 4, 8
    q = rng.normal(size=(b * p, c)).astype(np.float32)
    k = rng.normal(size=(b * p, c)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k /= np.linalg.norm(k, axis=1, keepdims=True)

    loss = PatchNCELoss(_nce_conf(batch_size=b))
    got = np.asarray(loss(jnp.array(q), jnp.array(k)))

    # numpy reference
    l_pos = np.sum(q * k, axis=1, keepdims=True)
    qb, kb = q.reshape(b, p, c), k.reshape(b, p, c)
    l_neg = np.einsum("bpc,bqc->bpq", qb, kb)
    for i in range(p):
        l_neg[:, i, i] = -10.0
    logits = np.concatenate([l_pos, l_neg.reshape(-1, p)], axis=1) / 0.07
    ex = np.exp(logits - logits.max(axis=1, keepdims=True))
    want = -np.log(ex[:, 0] / ex.sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def _cut_conf(tmp_dir, use_flip=False, lambda_nce_idt=0.5):
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
                "_target_": "ganslate.nn.gans.unpaired.CUT",
                "nce_layers": [0, 4, 8, 10],
                "mlp_nc": 16,
                "num_patches": 16,
                "use_equivariance_flip": use_flip,
                "generator": {
                    "_target_": "ganslate.nn.generators.Resnet2D",
                    "n_residual_blocks": 1, "ngf": 8,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 8, "n_layers": 1, "in_channels": {"B": 1},
                },
                "optimizer": {"lambda_adv": 1, "lambda_nce": 1,
                              "lambda_nce_idt": lambda_nce_idt, "nce_T": 0.07},
            },
            "seed": 0,
        },
    }
    return init_config(Conf.create(raw), config_class=Config)


@pytest.mark.parametrize("use_flip", [False, True])
def test_cut_step(tmp_path, use_flip):
    conf = _cut_conf(tmp_path, use_flip=use_flip)
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
        "B": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
    }
    model = build_gan(conf)
    model.setup(example_batch=batch)

    # MLP probed the right channel widths for nce_layers (0,4,8,10) of a
    # ngf=8 resnet: pad->1ch, down0->16, norm(down1)->32, res0->32.
    assert model._nce_feat_channels == (1, 16, 32, 32)

    params_before = jax.device_get(model.state.params)
    model.set_input(batch)
    model.optimize_parameters(sync=True)

    assert {"D", "G", "NCE", "NCE_idt"}.issubset(model.losses)
    for name, value in model.losses.items():
        assert np.isfinite(float(value)), name
    assert model.visuals["idt_B"].shape == (8, 32, 32, 1)

    params_after = jax.device_get(model.state.params)
    for net in ("G", "D", "mlp"):
        changed = any(not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(params_before[net]),
            jax.tree_util.tree_leaves(params_after[net])))
        assert changed, f"{net} did not update"
