"""Resnet3D s2d execution space: exactness vs plain execution with the SAME
parameters (reference architecture:
/root/reference/ganslate/nn/generators/resnet/resnet3d.py — Conv3d +
ReplicationPad3d). Replicate padding is expressed with edge-phase border
cells in cell space (ops/s2d_space.replicate_pad_cells)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganslate_tpu.nn.generators import Resnet3D


KW = dict(in_channels=1, out_channels=1, n_residual_blocks=2, ngf=4)


def test_resnet3d_s2d_matches_plain(rng):
    plain = Resnet3D(**KW)
    s2d = Resnet3D(use_s2d_exec=True, **KW)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        return plain.apply(params, x), s2d.apply(params, x)

    a, b = run(x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-3, rtol=1e-3)


def test_resnet3d_s2d_gradients(rng):
    plain = Resnet3D(**KW)
    s2d = Resnet3D(use_s2d_exec=True, **KW)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def grads(x):
        params = plain.init(jax.random.key(0), x)
        g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(s2d.apply(p, x) ** 2))(params)
        return g1, g2

    g1, g2 = grads(x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)


def test_resnet3d_s2d_rejects_bad_geometry(rng):
    s2d = Resnet3D(use_s2d_exec=True, **KW)
    with pytest.raises(ValueError, match="divisible by 8"):
        s2d.init(jax.random.key(0), jnp.zeros((1, 12, 8, 8, 1), jnp.float32))


def test_resnet3d_s2d_rejects_cut_taps(rng):
    s2d = Resnet3D(use_s2d_exec=True, **KW)
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="CUT"):
        s2d.init(jax.random.key(0), x, extract_features=[1])


def test_resnet2d_s2d_rejected():
    from ganslate_tpu.nn.generators import Resnet2D
    model = Resnet2D(in_channels=1, out_channels=1, n_residual_blocks=1,
                     ngf=4, use_s2d_exec=True)
    with pytest.raises(ValueError, match="3D"):
        model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1), jnp.float32))
