"""Unet3D s2d execution space: exactness vs plain execution with the SAME
parameters (checkpoint compatibility), partial-depth boundary handling, and
config reachability.

The U-Net (reference: /root/reference/ganslate/nn/generators/unet/unet3d.py)
halves extents down to 1 at the innermost level, so unlike the V-Net only
the outermost levels whose extents stay divisible by 4 run folded; deeper
levels run plain with a decode/encode pair at the boundary
(nn/generators/unet/unet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganslate_tpu.nn.generators import Unet3D
from ganslate_tpu.nn.generators.unet.unet import UnetGenerator


def _ab(rng, kw, shape, **apply_kw):
    plain = Unet3D(use_s2d_exec=False, **kw)
    s2d = Unet3D(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        return plain.apply(params, x, **apply_kw), \
            s2d.apply(params, x, **apply_kw)

    a, b = run(x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-3, rtol=1e-3)


def test_unet3d_s2d_full_depth(rng):
    """Extents divisible by 2^(num_downs+1): every level runs folded."""
    _ab(rng, dict(in_channels=1, out_channels=1, num_downs=2, ngf=4),
        (1, 8, 8, 8, 1))


def test_unet3d_s2d_partial_depth(rng):
    """16^3 with 3 downs: levels 0-1 folded, level 2 plain (16/4=4 divisible
    by 4, 16/8=2 is not) — exercises both boundary transitions."""
    _ab(rng, dict(in_channels=1, out_channels=1, num_downs=3, ngf=4),
        (1, 16, 16, 16, 1))


def test_unet3d_s2d_anisotropic(rng):
    """Per-dim limits: the shallowest dimension caps the folded depth."""
    _ab(rng, dict(in_channels=2, out_channels=1, num_downs=3, ngf=4),
        (1, 8, 16, 32, 2))


def test_unet3d_s2d_gradients(rng):
    plain = Unet3D(in_channels=1, out_channels=1, num_downs=2, ngf=4)
    s2d = Unet3D(in_channels=1, out_channels=1, num_downs=2, ngf=4,
                 use_s2d_exec=True)
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


def test_unet3d_s2d_rejects_indivisible(rng):
    model = Unet3D(in_channels=1, out_channels=1, num_downs=2, ngf=4,
                   use_s2d_exec=True)
    x = jnp.zeros((1, 6, 6, 6, 1), jnp.float32)
    with pytest.raises(ValueError, match="divisible by 4"):
        model.init(jax.random.key(0), x)


def test_unet2d_s2d_rejected():
    from ganslate_tpu.nn.generators import Unet2D
    model = Unet2D(in_channels=1, out_channels=1, num_downs=2, ngf=4,
                   use_s2d_exec=True)
    with pytest.raises(ValueError, match="3D"):
        model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1), jnp.float32))


def test_s2d_depth_rule():
    m = UnetGenerator(in_channels=1, out_channels=1, num_downs=4,
                      spatial_dims=3)
    # Level i runs folded iff its input extent d/2^i is divisible by 4.
    assert m._s2d_depth((32, 32, 32)) == 4   # 32,16,8,4 all divisible by 4
    assert m._s2d_depth((8, 8, 8)) == 2      # 8,4 ok; level-2 input 2 stops
    assert m._s2d_depth((8, 16, 8)) == 2     # min over dims
    assert m._s2d_depth((6, 8, 8)) == 0      # 6 % 4 != 0
