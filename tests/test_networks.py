"""Network zoo tests: parameter counts and output shapes must match the
reference torch architectures exactly (golden values computed from
torch-equivalent modules of /root/reference/ganslate/nn/generators/resnet/
resnet2d.py and /root/reference/ganslate/nn/discriminators/patchgan/
patchgan2d.py).

Shape/count assertions use `jax.eval_shape` (no compute, no XLA compile);
only the numeric tests pay a (small-net, jitted) compile.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ganslate_tpu.nn.discriminators import PatchGAN2D, PatchGAN3D
from ganslate_tpu.nn.generators import Resnet2D, Resnet3D


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def param_shapes(model, x_shape):
    x = jnp.zeros(x_shape)
    return jax.eval_shape(model.init, jax.random.key(0), x)["params"]


def out_shape(model, params_shapes, x_shape):
    x = jax.ShapeDtypeStruct(x_shape, jnp.float32)
    return jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x), params_shapes, x).shape


def test_resnet2d_params_and_shape():
    model = Resnet2D(in_channels=3, out_channels=3, n_residual_blocks=9)
    shapes = param_shapes(model, (1, 256, 256, 3))
    # Golden: torch Resnet2D(3, 3, 'instance', 9) has 11,378,179 params.
    assert n_params(shapes) == 11_378_179
    assert out_shape(model, shapes, (1, 256, 256, 3)) == (1, 256, 256, 3)
    assert out_shape(model, shapes, (2, 128, 128, 3)) == (2, 128, 128, 3)


def test_resnet2d_feature_extraction_shapes():
    model = Resnet2D(in_channels=3, out_channels=3, n_residual_blocks=2)
    shapes = param_shapes(model, (1, 64, 64, 3))
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    feats = jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x,
                                 extract_features=[0, 4, 8, 10, 11]),
        shapes, x)
    # Reference tap indices (resnet2d encoder ModuleList order):
    assert feats[0].shape == (1, 70, 70, 3)      # 0: reflection-padded input
    assert feats[1].shape == (1, 32, 32, 128)    # 4: first stride-2 conv
    assert feats[2].shape == (1, 16, 16, 256)    # 8: norm after 2nd stride-2
    assert feats[3].shape == (1, 16, 16, 256)    # 10: res block 0
    assert feats[4].shape == (1, 16, 16, 256)    # 11: res block 1


def test_resnet3d_shape():
    model = Resnet3D(in_channels=1, out_channels=1, n_residual_blocks=2)
    shapes = param_shapes(model, (1, 16, 32, 32, 1))
    assert out_shape(model, shapes, (1, 16, 32, 32, 1)) == (1, 16, 32, 32, 1)


def test_patchgan2d_params_and_shape():
    model = PatchGAN2D(in_channels=3)
    shapes = param_shapes(model, (1, 256, 256, 3))
    # Golden: torch PatchGAN2D(3, 64, 3, (4,4), 'instance') has 2,764,737 params.
    assert n_params(shapes) == 2_764_737
    assert out_shape(model, shapes, (1, 256, 256, 3)) == (1, 30, 30, 1)
    assert out_shape(model, shapes, (2, 128, 128, 3)) == (2, 14, 14, 1)


def test_patchgan3d_shape():
    model = PatchGAN3D(in_channels=1)
    shapes = param_shapes(model, (1, 32, 32, 32, 1))
    assert out_shape(model, shapes, (1, 32, 32, 32, 1)) == (1, 2, 2, 2, 1)


def test_tanh_output_and_weight_init():
    """Numeric check on a tiny net (jitted once): tanh range + init stddev."""
    model = Resnet2D(in_channels=1, out_channels=1, n_residual_blocks=1, ngf=8,
                     weight_init_type="normal", weight_init_gain=0.02)
    x = jnp.zeros((1, 32, 32, 1))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    y = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)
    std = float(np.std(np.asarray(params["down0"]["kernel"])))
    assert 0.01 < std < 0.03  # normal(0, 0.02)
