"""Boundary (plain <-> cells) conv transforms (ops/s2d_space.py):
to-cells (stride-1 original, plain in, c-major cell out) and from-cells
(stride-r original, cell in, plain out) against the plain reference
composition with the SAME canonical kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganslate_tpu.nn.layers import Conv, pad_spatial
from ganslate_tpu.ops.s2d_space import decode, encode


def _params(mod, x, seed=0):
    return jax.jit(mod.init)(jax.random.key(seed), x)


@pytest.mark.parametrize("nd,k,pad,pad_mode", [
    (2, 7, 3, "zeros"), (2, 7, 3, "reflect"), (2, 3, 1, "replicate"),
    (3, 5, 2, "zeros"), (3, 7, 3, "replicate"),
])
def test_to_cells_matches_encode_of_plain(rng, nd, k, pad, pad_mode):
    r = 2
    shape = (2, *([8] * nd), 3)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    plain = Conv(6, (k,) * nd, padding=pad, pad_mode=pad_mode)
    cells = Conv(6, (k,) * nd, padding=pad, pad_mode=pad_mode, to_cells=r)
    p = _params(plain, x)

    @jax.jit
    def run(x):
        return encode(plain.apply(p, x), r), cells.apply(p, x)

    want, got = run(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("nd,k,pad", [(2, 3, 1), (2, 4, 1), (3, 3, 1),
                                      (2, 2, 0)])
def test_from_cells_matches_plain_of_decode(rng, nd, k, pad):
    r = 2
    cin = 4
    cells_shape = (2, *([4] * nd), cin * r ** nd)
    xc = jnp.asarray(rng.normal(size=cells_shape).astype(np.float32))
    plain = Conv(6, (k,) * nd, strides=r, padding=pad)
    cells = Conv(6, (k,) * nd, strides=r, padding=pad, from_cells=r)
    x_plain = decode(xc, cin, r)
    p = _params(plain, x_plain)

    @jax.jit
    def run(xc, x_plain):
        return plain.apply(p, x_plain), cells.apply(p, xc)

    want, got = run(xc, x_plain)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_boundary_composition_stem_down(rng):
    """to-cells stem -> from-cells down == plain stem -> plain down (the
    CycleGAN G encoder boundary, no decode anywhere in between)."""
    r = 2
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    stem_p = Conv(8, (7, 7), padding=3, pad_mode="reflect", name="s")
    down_p = Conv(16, (3, 3), strides=2, padding=1, name="d")
    stem_c = Conv(8, (7, 7), padding=3, pad_mode="reflect", to_cells=r,
                  name="s")
    down_c = Conv(16, (3, 3), strides=2, padding=1, from_cells=r, name="d")
    ps = _params(stem_p, x)
    pd = _params(down_p, jnp.zeros((1, 16, 16, 8), jnp.float32))

    @jax.jit
    def run(x):
        want = down_p.apply(pd, stem_p.apply(ps, x))
        got = down_c.apply(pd, stem_c.apply(ps, x))
        return want, got

    want, got = run(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_to_cells_gradients(rng):
    r = 2
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    plain = Conv(4, (7, 7), padding=3, pad_mode="reflect")
    cells = Conv(4, (7, 7), padding=3, pad_mode="reflect", to_cells=r)
    p = _params(plain, x)

    @jax.jit
    def grads(x):
        g1 = jax.grad(lambda p: jnp.sum(encode(plain.apply(p, x), r) ** 2))(p)
        g2 = jax.grad(lambda p: jnp.sum(cells.apply(p, x) ** 2))(p)
        return g1, g2

    g1, g2 = grads(x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_resnet2d_cells_boundary_exact(rng):
    """ResnetGenerator(use_cells_boundary=True) == plain with the SAME
    parameters (the mode only re-expresses the stem/down0/head convs)."""
    from ganslate_tpu.nn.generators.resnet.resnet import ResnetGenerator

    kw = dict(in_channels=3, out_channels=3, ngf=8, n_residual_blocks=2,
              spatial_dims=2)
    plain = ResnetGenerator(**kw)
    cells = ResnetGenerator(**kw, use_cells_boundary=True)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    p = jax.jit(plain.init)(jax.random.key(0), x)
    pc = jax.jit(cells.init)(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pc)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(pc)):
        assert a.shape == b.shape

    @jax.jit
    def run(x):
        return plain.apply(p, x), cells.apply(p, x)

    want, got = run(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_resnet2d_cells_boundary_gradients(rng):
    from ganslate_tpu.nn.generators.resnet.resnet import ResnetGenerator

    kw = dict(in_channels=3, out_channels=3, ngf=8, n_residual_blocks=1,
              spatial_dims=2)
    plain = ResnetGenerator(**kw)
    cells = ResnetGenerator(**kw, use_cells_boundary=True)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    p = jax.jit(plain.init)(jax.random.key(0), x)

    @jax.jit
    def grads(p, x):
        g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(p)
        g2 = jax.grad(lambda p: jnp.sum(cells.apply(p, x) ** 2))(p)
        return g1, g2

    g1, g2 = grads(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_resnet2d_cells_boundary_cut_taps_fall_back(rng):
    """CUT feature extraction runs the identical-parameter plain path."""
    from ganslate_tpu.nn.generators.resnet.resnet import ResnetGenerator

    kw = dict(in_channels=3, out_channels=3, ngf=8, n_residual_blocks=2,
              spatial_dims=2)
    plain = ResnetGenerator(**kw)
    cells = ResnetGenerator(**kw, use_cells_boundary=True)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    p = jax.jit(plain.init)(jax.random.key(0), x)
    taps = (0, 4, 8, 11)
    want = plain.apply(p, x, extract_features=taps)
    got = cells.apply(p, x, extract_features=taps)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("nd,k,pad,pad_mode,r", [
    (2, 7, 3, "reflect", 4), (2, 7, 3, "zeros", 4), (2, 5, 2, "reflect", 4),
    (3, 5, 2, "replicate", 4), (2, 7, 3, "reflect", 6),
])
def test_to_cells_via_encode_exact(rng, nd, k, pad, pad_mode, r):
    """The composed form (encode r_in + stride-(r/r_in) conv of the
    composed kernel) must equal the direct wide to-cells conv — forward
    AND parameter gradients (the composed kernel is a different gather of
    the same canonical parameter)."""
    from ganslate_tpu import flags

    shape = (2, *([24 if nd == 2 else 12] * nd), 3)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    conv = Conv(3, (k,) * nd, padding=pad, pad_mode=pad_mode, to_cells=r)
    p = _params(conv, x)

    def loss(p, x):
        return jnp.sum(conv.apply(p, x) ** 2)

    with flags.override(to_cells_via_encode=0):
        want, gwant = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(p, x)
        want_y = jax.jit(conv.apply)(p, x)
    with flags.override(to_cells_via_encode=2):
        got, ggot = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(p, x)
        got_y = jax.jit(conv.apply)(p, x)

    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gwant),
                    jax.tree_util.tree_leaves(ggot)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)


def test_resnet2d_cells_boundary_via_encode_exact(rng):
    """ResnetGenerator(use_cells_boundary) under to_cells_via_encode ==
    plain, same parameters (the composed head is execution-only)."""
    from ganslate_tpu import flags
    from ganslate_tpu.nn.generators.resnet.resnet import ResnetGenerator

    kw = dict(in_channels=3, out_channels=3, ngf=8, n_residual_blocks=1,
              spatial_dims=2)
    plain = ResnetGenerator(**kw)
    cells = ResnetGenerator(**kw, use_cells_boundary=True)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    p = jax.jit(plain.init)(jax.random.key(0), x)

    with flags.override(to_cells_via_encode=2):
        @jax.jit
        def run(x):
            return plain.apply(p, x), cells.apply(p, x)

        want, got = run(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("nd,r,pads", [
    (2, 2, ((2, 2), (2, 2))), (2, 2, ((1, 2), (2, 1))),
    (3, 2, ((2, 2), (1, 1), (2, 2))),
])
def test_reflect_pad_cells_exact(rng, nd, r, pads):
    """reflect_pad_cells == encode(reflect-pad(decode(x))) for whole-cell
    borders (every border position takes its true reflect value)."""
    from ganslate_tpu.ops.s2d_space import (decode, encode,
                                            reflect_pad_cells)

    c = 3
    cells_shape = (2, *([6] * nd), c * r ** nd)
    xc = jnp.asarray(rng.normal(size=cells_shape).astype(np.float32))

    @jax.jit
    def run(xc):
        plain = decode(xc, c, r)
        padded = jnp.pad(plain, [(0, 0)] + [(r * lo, r * hi) for lo, hi
                                            in pads] + [(0, 0)],
                         mode="reflect")
        want = encode(padded, r)
        got = reflect_pad_cells(xc, c, r, pads)
        return want, got

    want, got = run(xc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_conv_transpose_cells_out_exact(rng):
    """ConvTranspose(cells_out=2) == encode(ConvTranspose(x), 2), same
    canonical parameters."""
    from ganslate_tpu.nn.layers import ConvTranspose
    from ganslate_tpu.ops.s2d_space import encode

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    plain = ConvTranspose(4, (3, 3), strides=2, padding=1, output_padding=1)
    cells = ConvTranspose(4, (3, 3), strides=2, padding=1, output_padding=1,
                          cells_out=2)
    p = jax.jit(plain.init)(jax.random.key(0), x)

    @jax.jit
    def run(x):
        return encode(plain.apply(p, x), 2), cells.apply(p, x)

    want, got = run(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("pad_mode", ["reflect", "replicate", "zeros"])
def test_to_cells_cells_in_exact(rng, pad_mode):
    """Conv(to_cells=4, cells_in=2) on the cell tensor == the plain-input
    to_cells conv on the decoded tensor — the head of the cells chain."""
    from ganslate_tpu.ops.s2d_space import encode

    x = jnp.asarray(rng.normal(size=(2, 24, 24, 6)).astype(np.float32))
    direct = Conv(3, (7, 7), padding=3, pad_mode=pad_mode, to_cells=4)
    chained = Conv(3, (7, 7), padding=3, pad_mode=pad_mode, to_cells=4,
                   cells_in=2)
    p = jax.jit(direct.init)(jax.random.key(0), x)

    def loss_direct(p, x):
        return jnp.sum(direct.apply(p, x) ** 2)

    def loss_chained(p, x):
        return jnp.sum(chained.apply(p, encode(x, 2)) ** 2)

    want, gwant = jax.jit(jax.value_and_grad(loss_direct))(p, x)
    got, ggot = jax.jit(jax.value_and_grad(loss_chained))(p, x)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gwant),
                    jax.tree_util.tree_leaves(ggot)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)


def test_resnet2d_head_cells_chain_exact(rng):
    """ResnetGenerator(use_cells_boundary) under head_cells_chain == plain,
    same parameters — forward and parameter gradients (the chain only
    re-expresses up1 + norm + head execution)."""
    from ganslate_tpu import flags
    from ganslate_tpu.nn.generators.resnet.resnet import ResnetGenerator

    kw = dict(in_channels=3, out_channels=3, ngf=8, n_residual_blocks=1,
              spatial_dims=2)
    plain = ResnetGenerator(**kw)
    cells = ResnetGenerator(**kw, use_cells_boundary=True)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    p = jax.jit(plain.init)(jax.random.key(0), x)
    with flags.override(head_cells_chain=True):
        pc = jax.jit(cells.init)(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pc))

    with flags.override(head_cells_chain=True):
        @jax.jit
        def run(p, x):
            g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(p)
            g2 = jax.grad(lambda p: jnp.sum(cells.apply(p, x) ** 2))(p)
            return plain.apply(p, x), cells.apply(p, x), g1, g2

        want, got, g1, g2 = run(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_to_cells_rejects_indivisible(rng):
    cells = Conv(4, (7, 7), padding=0, to_cells=2)
    x = jnp.zeros((1, 10, 10, 3), jnp.float32)  # out 4x4? 10-7+1=4 ok -> use 9
    x = jnp.zeros((1, 9, 9, 3), jnp.float32)    # out 3, odd
    with pytest.raises(ValueError, match="divide"):
        cells.init(jax.random.key(0), x)
