"""V-Net family, attention/separable/multiscale discriminator tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.nn.attention import SelfAttentionBlock
from ganslate_tpu.nn.discriminators import (MultiScalePatchGAN3D,
                                            SelfAttentionPatchGAN3D)
from ganslate_tpu.nn.generators import (SelfAttentionVnet3D, Vnet2D, Vnet3D)
from ganslate_tpu.nn.separable import SeparableConv3d, SeparableConvTranspose3d


def test_vnet3d_forward_and_inverse():
    model = Vnet3D(in_channels=1, out_channels=1, first_layer_channels=4,
                   down_blocks=(1, 1), up_blocks=(1, 1),
                   use_memory_saving=True, use_inverse=True)
    x = jnp.zeros((1, 8, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    y = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert y.shape == x.shape
    y_inv = jax.jit(lambda p, x: model.apply({"params": p}, x, inverse=True))(params, x)
    assert y_inv.shape == x.shape
    # Dual-path params exist.
    assert {"in_ab", "in_ba", "out_ab", "out_ba"} <= set(params.keys())


def test_vnet3d_encoder_taps():
    model = Vnet3D(in_channels=1, out_channels=1, first_layer_channels=4,
                   down_blocks=(1, 1), up_blocks=(1, 1),
                   use_memory_saving=False, use_inverse=False)
    x = jax.ShapeDtypeStruct((1, 8, 16, 16, 1), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0),
                            jnp.zeros(x.shape))["params"]
    feats = jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x, extract_features=[0, 1, 2]),
        shapes, x)
    assert feats[0].shape == (1, 8, 16, 16, 4)   # input block
    assert feats[1].shape == (1, 4, 8, 8, 8)     # down0
    assert feats[2].shape == (1, 2, 4, 4, 16)    # down1


def test_vnet2d_shape():
    model = Vnet2D(in_channels=1, out_channels=1, first_layer_channels=4,
                   down_blocks=(1, 1), up_blocks=(1, 1),
                   use_memory_saving=True, use_inverse=True)
    x = jnp.zeros((1, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    y = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert y.shape == x.shape


def test_selfattention_vnet3d():
    model = SelfAttentionVnet3D(in_channels=1, out_channels=1,
                                first_layer_channels=4,
                                down_blocks=(1, 1), up_blocks=(1, 1),
                                enable_attention_block=(False, True),
                                use_memory_saving=False, use_inverse=False)
    x = jnp.zeros((1, 4, 8, 8, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    # exactly one attention block parameterized
    attn_keys = [k for k in params if "attn" in k.lower() or "SelfAttention" in k]
    assert len(attn_keys) == 1, params.keys()
    y = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert y.shape == x.shape


def test_separable_convs():
    conv = SeparableConv3d(features=8, kernel_size=5, padding=2)
    x = jnp.zeros((1, 4, 8, 8, 2))
    params = jax.jit(conv.init)(jax.random.key(0), x)["params"]
    y = jax.jit(lambda p, x: conv.apply({"params": p}, x))(params, x)
    assert y.shape == (1, 4, 8, 8, 8)
    # factorized kernels: (1,5,5) + (5,1,1)
    assert params["depthwise"]["kernel"].shape == (1, 5, 5, 2, 8)
    assert params["pointwise"]["kernel"].shape == (5, 1, 1, 8, 8)

    convt = SeparableConvTranspose3d(features=4, kernel_size=2, strides=2)
    params_t = jax.jit(convt.init)(jax.random.key(0), y)["params"]
    z = jax.jit(lambda p, x: convt.apply({"params": p}, x))(params_t, y)
    assert z.shape == (1, 8, 16, 16, 4)


def test_attention_block_zero_init_is_identity():
    block = SelfAttentionBlock(in_dim=8)
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 8))
    params = jax.jit(block.init)(jax.random.key(1), x)["params"]
    y = jax.jit(lambda p, x: block.apply({"params": p}, x))(params, x)
    # gamma starts at 0 -> residual passthrough.
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_multiscale_patchgan_outputs_dict():
    model = MultiScalePatchGAN3D(in_channels=1, ndf=4, n_layers=1, scales=2)
    x = jnp.zeros((2, 16, 32, 32, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    # Deterministic center-crop path (no crop rng).
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert set(out.keys()) == {"1", "2"}
    assert out["2"].shape == (2, 2, 6, 6, 1)  # patch (8,16,16) -> patch map
    # Random-crop path with a crop rng.
    out_rng = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, rngs={"crop": jax.random.key(3)}))(params, x)
    assert out_rng["2"].shape == out["2"].shape


def test_selfattention_patchgan3d():
    model = SelfAttentionPatchGAN3D(in_channels=1, ndf=4, n_layers=2)
    x = jnp.zeros((1, 12, 24, 24, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    y = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert y.shape[0] == 1 and y.shape[-1] == 1
