"""Space-to-depth conv fast path (ops/s2d_conv.py): exactness vs the plain
lax conv for the geometries it serves, round-trip of the block transforms,
fallback behavior, and gradient flow through the kernel rearrangement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.nn.layers import Conv
from ganslate_tpu.ops.s2d_conv import (depth_to_space, s2d_applicable,
                                       s2d_conv, space_to_depth,
                                       transform_kernel)


def test_space_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    for r in (2, 4):
        y = depth_to_space(space_to_depth(x, r), r)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def _plain_valid_conv(xp, kernel):
    dn = jax.lax.conv_dimension_numbers(xp.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(xp, kernel, (1, 1),
                                        [(0, 0), (0, 0)],
                                        dimension_numbers=dn)


@pytest.mark.parametrize("r", [2, 4])
@pytest.mark.parametrize("k,cin,cout,hw", [(7, 3, 8, 32), (7, 8, 3, 16),
                                           (5, 4, 4, 24), (3, 2, 6, 8)])
def test_s2d_conv_matches_plain(r, k, cin, cout, hw, rng):
    xp = jnp.asarray(rng.normal(size=(2, hw + k - 1, hw + k - 1, cin))
                     .astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32)
                         * 0.2)
    assert s2d_applicable(xp.shape[1:-1], (k, k), (1, 1), r)
    want = jax.jit(_plain_valid_conv)(xp, kernel)
    got = jax.jit(lambda x, w: s2d_conv(x, w, r))(xp, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_s2d_applicability_gating():
    # non-dividing output, strides, non-cubic: all fall back.
    assert not s2d_applicable((37, 37), (7, 7), (1, 1), 4)   # out 31 % 4
    assert not s2d_applicable((38, 38), (7, 7), (2, 2), 4)   # strided
    assert not s2d_applicable((38, 38), (7, 5), (1, 1), 4)   # non-square
    assert not s2d_applicable((9, 9, 9), (5, 3, 5), (1, 1, 1), 2)  # non-cubic
    assert s2d_applicable((38, 38), (7, 7), (1, 1), 4)       # out 32
    assert s2d_applicable((10, 10, 10), (5, 5, 5), (1, 1, 1), 2)  # 3D V-Net


def test_conv_module_s2d_equals_plain(rng):
    """The Conv module with s2d_factor produces identical outputs from the
    SAME parameters as the plain path (reflect padding included)."""
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    plain = Conv(8, (7, 7), padding=3, pad_mode="reflect", name="c")
    fast = Conv(8, (7, 7), padding=3, pad_mode="reflect", s2d_factor=4,
                name="c")
    params = jax.jit(plain.init)(jax.random.key(0), x)
    y_plain = jax.jit(plain.apply)(params, x)
    y_fast = jax.jit(fast.apply)(params, x)
    assert y_fast.shape == y_plain.shape == (2, 32, 32, 8)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_plain),
                               atol=1e-4, rtol=1e-4)


def test_s2d_gradients_match_plain(rng):
    xp = jnp.asarray(rng.normal(size=(1, 22, 22, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(7, 7, 3, 4)).astype(np.float32) * 0.2)

    def loss_plain(w, x):
        return jnp.sum(jnp.square(_plain_valid_conv(x, w)))

    def loss_s2d(w, x):
        return jnp.sum(jnp.square(s2d_conv(x, w, 4)))

    g_plain = jax.jit(jax.grad(loss_plain, argnums=(0, 1)))(kernel, xp)
    g_s2d = jax.jit(jax.grad(loss_s2d, argnums=(0, 1)))(kernel, xp)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4)


def test_transform_kernel_shape():
    kernel = jnp.zeros((7, 7, 3, 8))
    kt = transform_kernel(kernel, 4)
    assert kt.shape == (3, 3, 48, 128)
    kt2 = transform_kernel(kernel, 2)
    assert kt2.shape == (4, 4, 12, 32)


# ---------------------------------------------------------------- 3D (r=2)


def _plain_valid_conv3d(xp, kernel):
    dn = jax.lax.conv_dimension_numbers(xp.shape, kernel.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(xp, kernel, (1, 1, 1),
                                        [(0, 0)] * 3, dimension_numbers=dn)


def test_space_depth_roundtrip_3d(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 6, 3)).astype(np.float32))
    y = depth_to_space(space_to_depth(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.parametrize("k,cin,cout,dhw", [(5, 4, 4, 8), (3, 2, 6, 4),
                                            (2, 3, 5, 6)])
def test_s2d_conv3d_matches_plain(k, cin, cout, dhw, rng):
    """V-Net-shaped case: 3D small-channel convs folded 2x2x2 into channels."""
    xp = jnp.asarray(rng.normal(size=(2, dhw + k - 1, dhw + k - 1,
                                      dhw + k - 1, cin)).astype(np.float32))
    kernel = jnp.asarray(
        rng.normal(size=(k, k, k, cin, cout)).astype(np.float32) * 0.2)
    assert s2d_applicable(xp.shape[1:-1], (k, k, k), (1, 1, 1), 2)

    @jax.jit
    def both(xp, kernel):
        return _plain_valid_conv3d(xp, kernel), s2d_conv(xp, kernel, 2)

    ref, fast = both(xp, kernel)
    assert ref.shape == fast.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                               atol=1e-4, rtol=1e-4)


def test_s2d_conv3d_gradients(rng):
    xp = jnp.asarray(rng.normal(size=(1, 7, 7, 7, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 4)).astype(np.float32))

    @jax.jit
    def grads(xp, kernel):
        g1 = jax.grad(lambda k: jnp.sum(jnp.sin(_plain_valid_conv3d(xp, k))))(kernel)
        g2 = jax.grad(lambda k: jnp.sum(jnp.sin(s2d_conv(xp, k, 2))))(kernel)
        return g1, g2

    g1, g2 = grads(xp, kernel)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
