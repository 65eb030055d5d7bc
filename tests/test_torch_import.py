"""Golden fidelity-parity tests for the torch-checkpoint importer: build the
REFERENCE PyTorch networks (/root/reference/ganslate/nn), import their
state_dicts through `ganslate_tpu.utils.torch_import`, and assert the flax
forward pass reproduces the torch forward pass on the same input.

This is the parity path for the north star (SSIM/PSNR vs reference
checkpoints): if forwards match per-network, metrics match per-checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.utils.torch_import import (convert_state_dict,
                                             flax_param_spec,
                                             import_torch_checkpoint)

from .reference_torch import load_reference_nn

torch = pytest.importorskip("torch")

REF = load_reference_nn()


def _to_torch(x):
    """channels-last numpy -> channels-first torch tensor."""
    perm = (0, x.ndim - 1, *range(1, x.ndim - 1))
    return torch.tensor(np.transpose(x, perm))


def _to_numpy(t):
    """channels-first torch tensor -> channels-last numpy."""
    x = t.detach().numpy()
    perm = (0, *range(2, x.ndim), 1)
    return np.transpose(x, perm)


def _parity(torch_net, flax_net, in_shape, atol=2e-4, **apply_kwargs):
    rng = np.random.default_rng(0)
    x = rng.normal(size=in_shape).astype(np.float32)

    torch_net.eval()
    with torch.no_grad():
        y_torch = _to_numpy(torch_net(_to_torch(x)))

    spec = flax_param_spec(flax_net, jax.ShapeDtypeStruct(x.shape, jnp.float32))
    params = convert_state_dict(torch_net.state_dict(), spec)
    y_flax = np.asarray(jax.jit(
        lambda p, x: flax_net.apply({"params": p}, x, **apply_kwargs)
    )(params, jnp.asarray(x)))

    assert y_torch.shape == y_flax.shape, (y_torch.shape, y_flax.shape)
    np.testing.assert_allclose(y_torch, y_flax, atol=atol, rtol=1e-4)


def test_resnet2d_forward_parity():
    from ganslate_tpu.nn.generators import Resnet2D
    t = REF["Resnet2D"](3, 3, "instance", n_residual_blocks=1)
    f = Resnet2D(in_channels=3, out_channels=3, n_residual_blocks=1)
    _parity(t, f, (2, 32, 32, 3))


def test_resnet3d_forward_parity():
    from ganslate_tpu.nn.generators import Resnet3D
    t = REF["Resnet3D"](1, 1, "instance", n_residual_blocks=1)
    f = Resnet3D(in_channels=1, out_channels=1, n_residual_blocks=1)
    _parity(t, f, (1, 12, 12, 12, 1))


def test_unet2d_forward_parity():
    from ganslate_tpu.nn.generators import Unet2D
    t = REF["Unet2D"](1, 1, 5, "instance", ngf=8, use_dropout=False)
    f = Unet2D(in_channels=1, out_channels=1, num_downs=5, ngf=8)
    _parity(t, f, (2, 32, 32, 1))


def test_unet3d_forward_parity():
    from ganslate_tpu.nn.generators import Unet3D
    t = REF["Unet3D"](1, 1, 5, "instance", ngf=4, use_dropout=False)
    f = Unet3D(in_channels=1, out_channels=1, num_downs=5, ngf=4)
    _parity(t, f, (1, 32, 32, 32, 1))


def test_patchgan2d_forward_parity():
    from ganslate_tpu.nn.discriminators import PatchGAN2D
    t = REF["PatchGAN2D"](3, 8, 2, (4, 4), "instance")
    f = PatchGAN2D(in_channels=3, ndf=8, n_layers=2, kernel_size=(4, 4))
    _parity(t, f, (2, 32, 32, 3))


def test_patchgan3d_forward_parity():
    from ganslate_tpu.nn.discriminators import PatchGAN3D
    t = REF["PatchGAN3D"](1, 4, 1, (4, 4, 4), "instance")
    f = PatchGAN3D(in_channels=1, ndf=4, n_layers=1, kernel_size=(4, 4, 4))
    _parity(t, f, (1, 16, 16, 16, 1))


def test_cyclegan_checkpoint_import(tmp_path):
    """Full reference checkpoint (nn/gans/base.py:226-251 format) -> CycleGAN
    state; `infer` must match the torch G_AB forward."""
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    nets = {
        "G_AB": REF["Resnet2D"](3, 3, "instance", n_residual_blocks=1),
        "G_BA": REF["Resnet2D"](3, 3, "instance", n_residual_blocks=1),
        "D_B": REF["PatchGAN2D"](3, 8, 2, (4, 4), "instance"),
        "D_A": REF["PatchGAN2D"](3, 8, 2, (4, 4), "instance"),
    }
    checkpoint = {name: net.state_dict() for name, net in nets.items()}
    checkpoint["optimizer_G"] = {}
    checkpoint["optimizer_D"] = {}
    path = tmp_path / "120.pth"
    torch.save(checkpoint, path)

    conf = make_cyclegan_conf(output_dir=str(tmp_path), batch_size=8,
                              image_size=32, channels=3, n_residual_blocks=1,
                              ngf=64, ndf=8, n_layers_D=2,
                              mixed_precision=False)
    rng = np.random.default_rng(1)
    batch = {"A": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
             "B": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)}

    model = build_gan(conf)
    import_torch_checkpoint(path, model, example_batch=batch)

    out = np.asarray(model.infer(jnp.asarray(batch["A"])))
    nets["G_AB"].eval()
    with torch.no_grad():
        ref = _to_numpy(nets["G_AB"](_to_torch(batch["A"])))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)

    # BA direction uses the other generator's weights.
    out_ba = np.asarray(model.infer(jnp.asarray(batch["B"]), direction="BA"))
    nets["G_BA"].eval()
    with torch.no_grad():
        ref_ba = _to_numpy(nets["G_BA"](_to_torch(batch["B"])))
    np.testing.assert_allclose(out_ba, ref_ba, atol=2e-4, rtol=1e-4)


def test_convert_rejects_mismatched_architectures():
    from ganslate_tpu.nn.generators import Resnet2D
    t = REF["Resnet2D"](3, 3, "instance", n_residual_blocks=2)
    f = Resnet2D(in_channels=3, out_channels=3, n_residual_blocks=1)
    spec = flax_param_spec(f, jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32))
    with pytest.raises(ValueError, match="parameter count mismatch"):
        convert_state_dict(t.state_dict(), spec)


def test_vnet3d_brats_forward_parity():
    """BRaTS config (no inverse, invertibles disabled): Vnet3D torch->flax
    import including the stacked coupling cores (block-major torch params
    de-interleaved onto the scan-stacked leading axis)."""
    from ganslate_tpu.nn.generators import Vnet3D
    t = REF["Vnet3D"](1, 1, "instance", first_layer_channels=4,
                      down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
                      use_memory_saving=False, use_inverse=False)
    f = Vnet3D(in_channels=1, out_channels=1, first_layer_channels=4,
               down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
               use_memory_saving=False, use_inverse=False)
    _parity(t, f, (1, 16, 16, 16, 1), atol=5e-4)


def test_vnet3d_inverse_forward_parity():
    """Dual-direction V-Net (RevGAN style): both the AB forward and the BA
    inverse must match the reference."""
    from ganslate_tpu.nn.generators import Vnet3D
    kwargs = dict(first_layer_channels=4, down_blocks=(1, 2), up_blocks=(2, 1),
                  use_memory_saving=False, use_inverse=True)
    t = REF["Vnet3D"](1, 1, "instance", **kwargs)
    f = Vnet3D(in_channels=1, out_channels=1, **kwargs)
    _parity(t, f, (1, 8, 8, 8, 1), atol=5e-4)

    # BA direction.
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)
    t.eval()
    with torch.no_grad():
        y_torch = _to_numpy(t(_to_torch(x), inverse=True))
    spec = flax_param_spec(f, jax.ShapeDtypeStruct(x.shape, jnp.float32))
    params = convert_state_dict(t.state_dict(), spec)
    y_flax = np.asarray(jax.jit(
        lambda p, x: f.apply({"params": p}, x, inverse=True)
    )(params, jnp.asarray(x)))
    np.testing.assert_allclose(y_torch, y_flax, atol=5e-4, rtol=1e-4)


def test_piresnet3d_forward_parity():
    """RevGAN's partially-invertible generator, both directions."""
    from ganslate_tpu.nn.generators import Piresnet3D
    t = REF["Piresnet3D"](1, 1, "instance", depth=2, first_layer_channels=8)
    f = Piresnet3D(in_channels=1, out_channels=1, depth=2,
                   first_layer_channels=8)
    _parity(t, f, (1, 12, 12, 12, 1), atol=5e-4)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 12, 12, 12, 1)).astype(np.float32)
    t.eval()
    with torch.no_grad():
        y_torch = _to_numpy(t(_to_torch(x), inverse=True))
    spec = flax_param_spec(f, jax.ShapeDtypeStruct(x.shape, jnp.float32))
    params = convert_state_dict(t.state_dict(), spec)
    y_flax = np.asarray(jax.jit(
        lambda p, x: f.apply({"params": p}, x, inverse=True)
    )(params, jnp.asarray(x)))
    np.testing.assert_allclose(y_torch, y_flax, atol=5e-4, rtol=1e-4)


def test_selfattention_vnet3d_forward_parity():
    from ganslate_tpu.nn.generators import SelfAttentionVnet3D
    kwargs = dict(first_layer_channels=4, down_blocks=(1, 1), up_blocks=(1, 1),
                  use_memory_saving=False, use_inverse=False,
                  enable_attention_block=(False, True))
    t = REF["SelfAttentionVnet3D"](1, 1, "instance", **kwargs)
    f = SelfAttentionVnet3D(in_channels=1, out_channels=1, **kwargs)
    _parity(t, f, (1, 8, 8, 8, 1), atol=5e-4)


def test_vnet3d_separable_forward_parity():
    from ganslate_tpu.nn.generators import Vnet3D
    kwargs = dict(first_layer_channels=4, down_blocks=(1, 1), up_blocks=(1, 1),
                  use_memory_saving=False, use_inverse=False,
                  is_separable=True)
    t = REF["Vnet3D"](1, 1, "instance", **kwargs)
    f = Vnet3D(in_channels=1, out_channels=1, **kwargs)
    _parity(t, f, (1, 8, 8, 8, 1), atol=5e-4)


def test_selfattention_patchgan3d_forward_parity():
    from ganslate_tpu.nn.discriminators import SelfAttentionPatchGAN3D
    t = REF["SelfAttentionPatchGAN3D"](1, 8, 1, (4, 4, 4), "instance")
    f = SelfAttentionPatchGAN3D(in_channels=1, ndf=8, n_layers=1,
                                kernel_size=(4, 4, 4))
    _parity(t, f, (1, 12, 12, 12, 1), atol=5e-4)


def test_multiscale_patchgan3d_forward_parity():
    """Dict-of-scales output; the monai stub center-crops (deterministic),
    matching the flax module's no-rng eval behavior."""
    from ganslate_tpu.nn.discriminators import MultiScalePatchGAN3D
    t = REF["MultiScalePatchGAN3D"](1, 4, 1, (4, 4, 4), 2, "instance")
    f = MultiScalePatchGAN3D(in_channels=1, ndf=4, n_layers=1,
                             kernel_size=(4, 4, 4), scales=2)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    t.eval()
    with torch.no_grad():
        y_torch = {k: _to_numpy(v) for k, v in t(_to_torch(x)).items()}
    spec = flax_param_spec(f, jax.ShapeDtypeStruct(x.shape, jnp.float32))
    params = convert_state_dict(t.state_dict(), spec)
    y_flax = jax.jit(lambda p, x: f.apply({"params": p}, x))(params,
                                                             jnp.asarray(x))
    assert set(y_torch) == set(y_flax.keys())
    for scale in y_torch:
        np.testing.assert_allclose(y_torch[scale], np.asarray(y_flax[scale]),
                                   atol=5e-4, rtol=1e-4)


def test_metric_level_fidelity_parity(tmp_path):
    """The north-star closure: SSIM/PSNR/MAE computed by OUR metric suite on
    outputs of an imported checkpoint equal the same metrics computed on the
    reference torch network's outputs (within fp32 forward noise)."""
    from ganslate_tpu.utils.metrics import val_test_metrics as m

    t = REF["Resnet2D"](3, 3, "instance", n_residual_blocks=1)
    from ganslate_tpu.nn.generators import Resnet2D
    f = Resnet2D(in_channels=3, out_channels=3, n_residual_blocks=1)

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    target = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)

    t.eval()
    with torch.no_grad():
        y_torch = _to_numpy(t(_to_torch(x)))
    spec = flax_param_spec(f, jax.ShapeDtypeStruct(x.shape, jnp.float32))
    params = convert_state_dict(t.state_dict(), spec)
    y_flax = np.asarray(jax.jit(
        lambda p, x: f.apply({"params": p}, x))(params, jnp.asarray(x)))

    for fn in (m.ssim, m.psnr, m.mae, m.nmse):
        per_sample_torch = [fn(g, p) for g, p in zip(target, y_torch)]
        per_sample_flax = [fn(g, p) for g, p in zip(target, y_flax)]
        np.testing.assert_allclose(per_sample_torch, per_sample_flax,
                                   rtol=2e-3, atol=2e-4)


def test_convert_checkpoint_to_native_and_resume(tmp_path):
    """The migration path: `import-torch-checkpoint` converts a reference
    .pth into a native orbax checkpoint; a fresh training run loads it via
    checkpointing.load_iter (optimizers start fresh), produces torch-equal
    inference, and can take a train step."""
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf
    from ganslate_tpu.utils.torch_import import convert_checkpoint_to_native

    nets = {
        "G_AB": REF["Resnet2D"](3, 3, "instance", n_residual_blocks=1),
        "G_BA": REF["Resnet2D"](3, 3, "instance", n_residual_blocks=1),
        "D_B": REF["PatchGAN2D"](3, 8, 2, (4, 4), "instance"),
        "D_A": REF["PatchGAN2D"](3, 8, 2, (4, 4), "instance"),
    }
    checkpoint = {name: net.state_dict() for name, net in nets.items()}
    pth = tmp_path / "20000.pth"
    torch.save(checkpoint, pth)

    conf = make_cyclegan_conf(output_dir=str(tmp_path), batch_size=8,
                              image_size=32, channels=3, n_residual_blocks=1,
                              ngf=64, ndf=8, n_layers_D=2,
                              mixed_precision=False, n_iters=30000)
    written = convert_checkpoint_to_native(pth, conf, iter_idx=None)
    assert written.endswith("checkpoints/20000")

    # Fresh training model resumes from the converted checkpoint.
    conf2 = make_cyclegan_conf(output_dir=str(tmp_path), batch_size=8,
                               image_size=32, channels=3, n_residual_blocks=1,
                               ngf=64, ndf=8, n_layers_D=2,
                               mixed_precision=False, n_iters=30000)
    conf2.train.checkpointing.load_iter = 20000
    conf2.train.checkpointing.load_optimizers = True  # must degrade gracefully

    rng = np.random.default_rng(2)
    batch = {"A": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
             "B": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)}
    model = build_gan(conf2)
    model.setup(example_batch=batch)
    assert int(model.state.step) == 20000

    out = np.asarray(model.infer(jnp.asarray(batch["A"])))
    nets["G_AB"].eval()
    with torch.no_grad():
        ref = _to_numpy(nets["G_AB"](_to_torch(batch["A"])))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)

    model.set_input(batch)
    model.optimize_parameters(sync=True)
    assert all(np.isfinite(float(v)) for v in model.losses.values())
