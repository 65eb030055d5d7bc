"""Pallas op tests: fused instance-norm forward (interpret mode vs XLA
reference) and custom-VJP gradients vs autodiff of the naive formula."""

import numpy as np

from ganslate_tpu import flags
import pytest

import jax
import jax.numpy as jnp

import ganslate_tpu.ops.instance_norm as in_mod


def naive_instance_norm(x, eps=1e-5, activation="none", negative_slope=0.2):
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if activation == "relu":
        y = jnp.maximum(y, 0)
    elif activation == "leaky_relu":
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y


@pytest.mark.parametrize("activation", ["none", "relu", "leaky_relu"])
def test_forward_matches_naive(activation):
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16)) * 3 + 1
    got = in_mod.instance_norm(x, 1e-5, activation)
    want = naive_instance_norm(x, 1e-5, activation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("activation", ["none", "relu", "leaky_relu"])
def test_grad_matches_naive(activation):
    x = jax.random.normal(jax.random.key(1), (2, 6, 6, 8)) * 2

    def loss_fused(x):
        return jnp.sum(jnp.sin(in_mod.instance_norm(x, 1e-5, activation)))

    def loss_naive(x):
        return jnp.sum(jnp.sin(naive_instance_norm(x, 1e-5, activation)))

    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_naive)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_pallas_kernel_interpret_matches_xla():
    """The Pallas kernel body itself (run in interpreter mode on CPU) agrees
    with the XLA fallback."""
    x = jax.random.normal(jax.random.key(2), (2, 16, 128, 8), jnp.float32)
    in_mod._INTERPRET = True
    try:
        out_p, mean_p, rstd_p = in_mod._pallas_forward(x, 1e-5, "relu", 0.2)
    finally:
        in_mod._INTERPRET = False
    out_x, mean_x, rstd_x = in_mod._xla_forward(x, 1e-5, "relu", 0.2)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rstd_p), np.asarray(rstd_x), rtol=1e-4)


def test_pallas_tiled_kernel_interpret_matches_xla():
    """The spatially tiled two-pass kernel (for slabs beyond the VMEM
    budget) agrees with the XLA fallback, including partial-moment
    accumulation across tiles (E[x^2]-E[x]^2 form)."""
    x = jax.random.normal(jax.random.key(4), (2, 32, 16, 24), jnp.float32) * 3 + 2
    in_mod._INTERPRET = True
    try:
        out_p, mean_p, rstd_p = in_mod._pallas_forward_tiled(
            x, 1e-5, "leaky_relu", 0.2, tile=64)
    finally:
        in_mod._INTERPRET = False
    out_x, mean_x, rstd_x = in_mod._xla_forward(x, 1e-5, "leaky_relu", 0.2)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rstd_p), np.asarray(rstd_x), rtol=1e-4)


def test_tile_picker():
    assert in_mod._pick_tile(256 * 256, 64) == 8192
    assert in_mod._pick_tile(7, 64) is None
    # Tile must divide the spatial size.
    s = 96 * 96
    tile = in_mod._pick_tile(s, 16)
    assert tile is not None and s % tile == 0 and tile % 8 == 0


def test_3d_volumes():
    x = jax.random.normal(jax.random.key(3), (1, 4, 6, 6, 4))
    got = in_mod.instance_norm(x)
    want = naive_instance_norm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


# ------------------------------------------------------- batch-fold lowering


def test_batch_fold_exact_stride1():
    """Folded conv == direct conv for stride-1 zero-pad rank-3 convs,
    symmetric and asymmetric depth pads."""
    from ganslate_tpu.ops import batch_fold as bf

    rng = np.random.default_rng(0)
    for pads in ([(1, 1), (1, 1), (1, 1)], [(0, 1), (1, 1), (0, 1)]):
        taps = pads[0][0] + pads[0][1] + 1
        flags.FLAGS.fold_max_cells = 4096
        x = jnp.asarray(rng.normal(size=(5, 4, 6, 7, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(taps, taps, taps, 8, 16))
                        .astype(np.float32))
        assert bf.foldable(x.shape, (1, 1, 1), pads, taps)
        got = jax.jit(lambda x, k: bf.conv_batch_folded(
            x, k, (1, 1, 1), pads))(x, k)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        want = jax.lax.conv_general_dilated(x, k, (1, 1, 1), pads,
                                            dimension_numbers=dn)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
    flags.FLAGS.fold_max_cells = 0


def test_batch_fold_threshold_and_guards():
    from ganslate_tpu.ops import batch_fold as bf

    flags.FLAGS.fold_max_cells = 4096
    # big grids and batch-1 must not fold; strided depth must not fold
    assert not bf.foldable((4, 16, 44, 44, 8), (1, 1, 1), [(1, 1)] * 3, 3)
    assert not bf.foldable((1, 4, 8, 8, 8), (1, 1, 1), [(1, 1)] * 3, 3)
    assert not bf.foldable((4, 4, 8, 8, 8), (2, 1, 1), [(1, 1)] * 3, 3)
    assert not bf.foldable((4, 4, 8, 8, 8), (1, 1, 1), [(0, 0)] * 3, 3)
    flags.FLAGS.fold_max_cells = 0


def test_batch_fold_inside_s2d_conv():
    """The s2d Conv path produces identical results whether or not the
    fold threshold admits its grid (same params, same input)."""
    from ganslate_tpu.nn.layers import Conv
    from ganslate_tpu.ops import batch_fold as bf

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 4, 4, 4, 16 * 8)).astype(np.float32))
    conv = Conv(16, (5, 5, 5), padding=2, s2d_space=2)
    params = jax.jit(conv.init)(jax.random.key(0), x)
    orig = flags.FLAGS.fold_max_cells
    try:
        flags.FLAGS.fold_max_cells = 4096
        y_folded = jax.jit(conv.apply)(params, x)
        flags.FLAGS.fold_max_cells = 0
        y_plain = jax.jit(conv.apply)(params, x)
    finally:
        flags.FLAGS.fold_max_cells = orig
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_plain),
                               atol=1e-4)


def test_batch_fold_exact_strided():
    """k == s down convs (zero pad) fold exactly."""
    from ganslate_tpu.ops import batch_fold as bf

    rng = np.random.default_rng(2)
    flags.FLAGS.fold_max_cells = 4096
    x = jnp.asarray(rng.normal(size=(5, 4, 6, 6, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 8, 16)).astype(np.float32))
    pads = [(0, 0)] * 3
    assert bf.foldable(x.shape, (2, 2, 2), pads, 2)
    got = jax.jit(lambda x, k: bf.conv_batch_folded(
        x, k, (2, 2, 2), pads))(x, k)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, k, (2, 2, 2), pads,
                                        dimension_numbers=dn)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # odd depth must not fold with stride 2
    assert not bf.foldable((5, 5, 6, 6, 8), (2, 2, 2), pads, 2)
    flags.FLAGS.fold_max_cells = 0


class TestPadSpatialVJP:
    """The custom pad_spatial backward must equal jnp.pad's autodiff
    transpose exactly, for every mode/rank, including clamped-guard sizes."""

    @pytest.mark.parametrize("mode", ["reflect", "replicate"])
    @pytest.mark.parametrize("shape,pad", [
        ((2, 12, 13, 3), (3, 3)),      # 2D, stem/head-style pad 3
        ((2, 12, 13, 3), (1, 2)),      # asymmetric-per-axis pads
        ((1, 8, 9, 10, 2), (1, 1, 1)), # 3D res-block style
        ((1, 8, 4, 2), (3, 1)),        # W hits the 2*p+2 guard boundary
    ])
    def test_grad_matches_jnp_pad(self, mode, shape, pad):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from ganslate_tpu.nn.layers import pad_spatial, _PAD_MODES

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        cot = jnp.asarray(rng.normal(
            size=(shape[0], *[s + 2 * p for s, p in zip(shape[1:-1], pad)],
                  shape[-1])).astype(np.float32))

        def f_custom(v):
            return jnp.vdot(pad_spatial(v, pad, mode), cot)

        def f_ref(v):
            cfg = [(0, 0)] + [(p, p) for p in pad] + [(0, 0)]
            return jnp.vdot(jnp.pad(v, cfg, mode=_PAD_MODES[mode]), cot)

        out_c = jax.jit(lambda v: pad_spatial(v, pad, mode))(x)
        out_r = jnp.pad(x, [(0, 0)] + [(p, p) for p in pad] + [(0, 0)],
                        mode=_PAD_MODES[mode])
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_r))
        g_c = jax.jit(jax.grad(f_custom))(x)
        g_r = jax.jit(jax.grad(f_ref))(x)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_r),
                                   rtol=1e-6, atol=1e-6)
