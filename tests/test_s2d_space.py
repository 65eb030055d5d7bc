"""s2d execution space (ops/s2d_space.py): every transformed op must satisfy
encode -> op_t -> decode == op  on random inputs, to f32 precision."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.ops import s2d_space as sp


def _conv(h, w, stride=1, pad=0):
    n = h.ndim - 2
    spatial = "DHW"[3 - n:]
    dn = jax.lax.conv_dimension_numbers(
        h.shape, w.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    return jax.lax.conv_general_dilated(h, w, (stride,) * n,
                                        [(pad, pad)] * n, dimension_numbers=dn)


def _convt(h, w, r):
    """nn.layers.ConvTranspose math (lax-correlation, k=s=r, p=0)."""
    n = h.ndim - 2
    spatial = "DHW"[3 - n:]
    dn = jax.lax.conv_dimension_numbers(
        h.shape, w.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    return jax.lax.conv_general_dilated(
        h, w, (1,) * n, [(r - 1, r - 1)] * n, lhs_dilation=(r,) * n,
        dimension_numbers=dn)


@pytest.mark.parametrize("n", [2, 3])
def test_encode_decode_roundtrip(rng, n):
    sp_shape = (8,) * n
    x = jnp.asarray(rng.normal(size=(2, *sp_shape, 3)).astype(np.float32))

    @jax.jit
    def run(x):
        return sp.decode(sp.encode(x, 2), 3, 2)

    np.testing.assert_allclose(np.asarray(run(x)), np.asarray(x), atol=1e-5)


def test_encode_channel_order_is_c_major(rng):
    """Transformed channel index must be c * r^n + code(d) so channel slices
    (coupling halves, concats) stay lane-contiguous."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32))
    t = jax.jit(lambda x: sp.encode(x, 2))(x)
    # cell q=(1,1,0), channel c=1, phase d=(1,0,1) -> code 5 -> index 1*8+5
    np.testing.assert_allclose(float(t[0, 1, 1, 0, 1 * 8 + 5]),
                               float(x[0, 3, 2, 1, 1]), atol=1e-6)


@pytest.mark.parametrize("k,c,o", [(5, 4, 4), (5, 2, 6), (3, 4, 2), (1, 3, 5)])
def test_stride1_conv_transform(rng, k, c, o):
    """encode -> transformed k-> ka conv -> decode == original SAME conv."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, c, o)).astype(np.float32) * 0.2)
    pad_lo, pad_hi = sp.stride1_pads(k, 2)

    @jax.jit
    def run(x, w):
        ref = _conv(x, w, pad=k // 2)
        t = sp.encode(x, 2)
        kt = sp.transform_stride1_kernel(w, 2)
        n = t.ndim - 2
        spatial = "DHW"[3 - n:]
        dn = jax.lax.conv_dimension_numbers(
            t.shape, kt.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
        yt = jax.lax.conv_general_dilated(t, kt, (1,) * n,
                                          [(pad_lo, pad_hi)] * n,
                                          dimension_numbers=dn)
        return ref, sp.decode(yt, o, 2)

    ref, got = run(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_down_conv_transform(rng):
    """encode -> transformed k2s2 conv -> (next-level) decode == original."""
    c, o = 3, 6
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 2, c, o)).astype(np.float32) * 0.3)

    @jax.jit
    def run(x, w):
        ref = _conv(x, w, stride=2)              # (2,4,4,4,o) on orig/2 grid
        t = sp.encode(x, 2)                      # level-l s2d
        kt = sp.transform_down_kernel(w, 2)
        yt = _conv(t, kt, stride=2)              # level-(l+1) s2d
        return ref, sp.decode(yt, o, 2)

    ref, got = run(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_up_conv_transform(rng):
    """encode -> transformed k2s2 transpose -> decode == original transpose
    (both in the canonical lax-correlation orientation of ConvTranspose)."""
    c, o = 4, 2
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 2, c, o)).astype(np.float32) * 0.3)

    @jax.jit
    def run(x, w):
        ref = _convt(x, w, 2)                    # (2,8,8,8,o)
        t = sp.encode(x, 2)                      # s2d of the input grid
        kt = sp.transform_up_kernel(w, 2)
        yt = _convt(t, kt, 2)                    # s2d of the output grid
        return ref, sp.decode(yt, o, 2)

    ref, got = run(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_1x1_conv_transform(rng):
    c, o = 3, 5
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, 1, c, o)).astype(np.float32))

    @jax.jit
    def run(x, w):
        ref = _conv(x, w)
        t = sp.encode(x, 2)
        yt = _conv(t, sp.transform_1x1_kernel(w, 2))
        return ref, sp.decode(yt, o, 2)

    ref, got = run(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_group_instance_norm(rng):
    """Grouped IN on the s2d tensor == InstanceNorm in original space."""
    from ganslate_tpu.ops.instance_norm import instance_norm
    c = 4
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, c)).astype(np.float32) * 3 + 1)

    @jax.jit
    def run(x):
        ref = instance_norm(x, 1e-5, "relu")
        t = sp.encode(x, 2)
        yt = sp.group_instance_norm(t, c, 8, 1e-5, "relu")
        return ref, sp.decode(yt, c, 2)

    ref, got = run(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_group_instance_norm_fused_residual(rng):
    """The residual/residual_tile path == the unfused composition
    norm -> + tile(x) -> prelu (in f32, exactly the V-Net input block)."""
    c, rep = 4, 4
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, c * 8)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(2, 4, 4, 4, (c // rep) * 8))
                      .astype(np.float32))
    slope = jnp.asarray(np.full((c,), 0.25, np.float32))

    @jax.jit
    def run(x, res):
        unfused = sp.group_instance_norm(x, c, 8, 1e-5, "none")
        unfused = unfused + jnp.tile(res, (1, 1, 1, 1, rep))
        unfused = jnp.where(unfused >= 0, unfused,
                            unfused * jnp.repeat(slope, 8))
        fused = sp.group_instance_norm(x, c, 8, 1e-5, "prelu",
                                       prelu_slope=slope, residual=res,
                                       residual_tile=rep)
        return unfused, fused

    unfused, fused = run(x, res)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=1e-5, rtol=1e-5)


def test_vnet_stem_fused_matches_plain(rng):
    """Vnet3D(use_s2d_exec=True) under flags.vnet_stem_fused=True still
    matches the plain execution with the same parameters — the default-off
    fused input-block pass stays verifiable for re-measurement."""
    from ganslate_tpu import flags
    from ganslate_tpu.nn.generators import Vnet3D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1, 1), up_blocks=(1, 1),
              use_memory_saving=False, use_inverse=False)
    plain = Vnet3D(**kw)
    s2d = Vnet3D(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    with flags.override(vnet_stem_fused=True):
        @jax.jit
        def run(x):
            params = plain.init(jax.random.key(0), x)
            return plain.apply(params, x), s2d.apply(params, x)

        ref, got = run(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_broadcast_per_channel():
    v = jnp.asarray(np.arange(3, dtype=np.float32))
    out = sp.broadcast_per_channel(v, 4)
    np.testing.assert_array_equal(
        np.asarray(out), np.repeat(np.arange(3, dtype=np.float32), 4))


# ------------------------------------------------- full-network equivalence


@pytest.mark.parametrize("use_inverse", [False, True])
def test_vnet_s2d_exec_matches_plain(rng, use_inverse):
    """Vnet3D(use_s2d_exec=True) == Vnet3D(False) with the SAME parameters
    (checkpoint compatibility + mathematical exactness of the whole mode)."""
    from ganslate_tpu.nn.generators import Vnet3D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1, 1), up_blocks=(1, 1),
              use_memory_saving=False, use_inverse=use_inverse)
    plain = Vnet3D(**kw)
    s2d = Vnet3D(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        outs = [plain.apply(params, x), s2d.apply(params, x)]
        if use_inverse:
            outs += [plain.apply(params, x, inverse=True),
                     s2d.apply(params, x, inverse=True)]
        return outs

    outs = run(x)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(outs[0]),
                               atol=2e-3, rtol=1e-3)
    if use_inverse:
        np.testing.assert_allclose(np.asarray(outs[3]), np.asarray(outs[2]),
                                   atol=2e-3, rtol=1e-3)


def test_vnet_s2d_exec_memory_saving_gradients(rng):
    """Recompute-by-inverse VJP in s2d space == plain-exec gradients."""
    from ganslate_tpu.nn.generators import Vnet3D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1,), up_blocks=(1,), use_inverse=False)
    plain = Vnet3D(use_memory_saving=False, **kw)
    s2d = Vnet3D(use_memory_saving=True, use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 1)).astype(np.float32))

    @jax.jit
    def grads(x):
        params = plain.init(jax.random.key(0), x)
        g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(s2d.apply(p, x) ** 2))(params)
        return g1, g2

    g1, g2 = grads(x)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)


def test_vnet_s2d_exec_feature_taps_match_plain(rng):
    """CUT encoder taps under s2d are decoded to the original geometry and
    match plain execution."""
    from ganslate_tpu.nn.generators import Vnet3D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1, 1), up_blocks=(1, 1),
              use_memory_saving=False, use_inverse=False)
    plain = Vnet3D(**kw)
    s2d = Vnet3D(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        f1 = plain.apply(params, x, extract_features=[0, 1, 2])
        f2 = s2d.apply(params, x, extract_features=[0, 1, 2])
        return f1, f2

    f1, f2 = run(x)
    for a, b in zip(f1, f2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=1e-3)


def test_vnet_s2d_exec_with_attention_matches_plain(rng):
    """Attention levels run decode -> attend -> encode; output matches the
    plain SelfAttention V-Net with the same params."""
    from ganslate_tpu.nn.generators.vnet.vnet import VnetGenerator

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1, 1), up_blocks=(1, 1),
              enable_attention_block=(False, True),
              use_memory_saving=False, use_inverse=False, spatial_dims=3)
    plain = VnetGenerator(**kw)
    s2d = VnetGenerator(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        return plain.apply(params, x), s2d.apply(params, x)

    a, b = run(x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-3, rtol=1e-3)


def test_use_s2d_exec_reachable_from_config():
    """`generator.use_s2d_exec: true` in a reference-format YAML reaches the
    built V-Net module via the real config machinery (schema merge +
    build_G), proving the flag is user-reachable."""
    from ganslate_tpu.configs.config import Config
    from ganslate_tpu.configs.omega import Conf
    from ganslate_tpu.configs.utils import init_config
    from ganslate_tpu.utils.builders import build_G

    raw = {
        "project": None,
        "train": {
            "output_dir": "/tmp/s2d_conf_test",
            "n_iters": 1, "batch_size": 1,
            "dataset": {
                "_target_": "ganslate.data.UnpairedImageDataset",
                "root": "/tmp", "num_workers": 0,
                "image_channels": 1,
                "load_size": [16, 16],
            },
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.CycleGAN",
                "generator": {
                    "_target_": "ganslate.nn.generators.Vnet3D",
                    "first_layer_channels": 4,
                    "down_blocks": [1, 1], "up_blocks": [1, 1],
                    "use_memory_saving": False, "use_inverse": False,
                    "use_s2d_exec": True,
                    "in_out_channels": {"AB": [1, 1]},
                },
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN3D",
                    "n_layers": 2, "in_channels": {"B": 1},
                },
            },
        },
    }
    conf = init_config(Conf.create(raw), config_class=Config)
    assert conf.train.gan.generator.use_s2d_exec is True
    module = build_G(conf, "AB")
    assert module.use_s2d_exec is True


def test_s2d_vnet_through_sliding_window_distributed(rng):
    """The distributed sliding-window inferer drives an s2d V-Net (the
    combination the cyclegan_s2d.yaml validation path uses): output matches
    the plain-exec network through the same inferer."""
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1,), up_blocks=(1,),
              use_memory_saving=False, use_inverse=False)
    plain = Vnet3D(**kw)
    s2d = Vnet3D(use_s2d_exec=True, **kw)

    roi = (8, 8, 8)
    vol = jnp.asarray(rng.normal(size=(1, 12, 12, 12, 1)).astype(np.float32))
    params = jax.jit(plain.init)(
        jax.random.key(0), jnp.zeros((1, *roi, 1), jnp.float32))

    def net(model):
        return lambda p, x: model.apply(p, x)

    out_plain = SlidingWindowInferer(roi, sw_batch_size=2, overlap=0.25,
                                     mode="gaussian")(vol, net(plain), params)
    out_s2d = SlidingWindowInferer(roi, sw_batch_size=2, overlap=0.25,
                                   mode="gaussian")(vol, net(s2d), params)
    assert out_plain.shape == out_s2d.shape == vol.shape
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_plain),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("k,p,g", [(3, 1, 8), (2, 0, 8), (5, 2, 8), (4, 1, 12)])
def test_general_strided_down_transform(rng, k, p, g):
    """encode -> general stride-2 transformed conv -> decode == original
    strided conv (covers Piresnet/Resnet3D's k3 s2 p1 geometry)."""
    c, o = 3, 4
    x = jnp.asarray(rng.normal(size=(2, g, g, g, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, c, o)).astype(np.float32) * 0.2)
    in_cells = g // 2
    pad_lo, pad_hi = sp.strided_pads(k, 2, p, in_cells)

    @jax.jit
    def run(x, w):
        ref = _conv(x, w, stride=2, pad=p)
        t = sp.encode(x, 2)
        kt = sp.transform_strided_kernel(w, 2, p)
        n = 3
        dn = jax.lax.conv_dimension_numbers(
            t.shape, kt.shape, ("NDHWC", "DHWIO", "NDHWC"))
        yt = jax.lax.conv_general_dilated(t, kt, (2,) * n,
                                          [(pad_lo, pad_hi)] * n,
                                          dimension_numbers=dn)
        return ref, yt

    ref, yt = run(x, w)
    out_orig = ref.shape[1]
    if out_orig % 2:
        # odd original output: compare against the decodable even prefix
        ref = ref[:, :out_orig - 1, :out_orig - 1, :out_orig - 1]
    got = jax.jit(lambda yt: sp.decode(yt, o, 2))(yt)
    got = np.asarray(got)[:, :ref.shape[1], :ref.shape[2], :ref.shape[3]]
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("k,p,op,g", [(3, 1, 1, 4), (2, 0, 0, 4), (4, 1, 0, 4),
                                      (5, 2, 1, 4)])
def test_general_up_transform(rng, k, p, op, g):
    """encode -> general transformed transposed conv -> decode == original
    (covers Piresnet/Resnet3D's k3 s2 p1 op1 upsampler; subsumes k2s2)."""
    c, o = 3, 4
    x = jnp.asarray(rng.normal(size=(2, g, g, g, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, c, o)).astype(np.float32) * 0.2)

    def convt(h, w):
        n = h.ndim - 2
        dn = jax.lax.conv_dimension_numbers(
            h.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            h, w, (1,) * n, [(k - 1 - p, k - 1 - p + op)] * n,
            lhs_dilation=(2,) * n, dimension_numbers=dn)

    in_cells = g // 2
    lo, hi = sp.up_general_pads(k, 2, p, op, in_cells)

    @jax.jit
    def run(x, w):
        ref = convt(x, w)
        t = sp.encode(x, 2)
        kt = sp.transform_up_general_kernel(w, 2, p)
        n = 3
        dn = jax.lax.conv_dimension_numbers(
            t.shape, kt.shape, ("NDHWC", "DHWIO", "NDHWC"))
        yt = jax.lax.conv_general_dilated(t, kt, (1,) * n, [(lo, hi)] * n,
                                          lhs_dilation=(2,) * n,
                                          dimension_numbers=dn)
        return ref, yt

    ref, yt = run(x, w)
    got = np.asarray(jax.jit(lambda yt: sp.decode(yt, o, 2))(yt))
    s = [min(a, b - b % 2) for a, b in zip(got.shape[1:4], ref.shape[1:4])]
    np.testing.assert_allclose(
        got[:, :s[0], :s[1], :s[2]],
        np.asarray(ref)[:, :s[0], :s[1], :s[2]], atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_stride1_replicate_pad_transform(rng, k):
    """Replicate-padded stride-1 conv (Piresnet's InvResidualBlock geometry)
    in s2d space: manual border cells + VALID transformed conv == original."""
    c, o = 3, 4
    g = 8
    p = k // 2
    x = jnp.asarray(rng.normal(size=(2, g, g, g, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, k, c, o)).astype(np.float32) * 0.2)
    pad_lo, pad_hi = sp.stride1_pads(k, 2, p)

    @jax.jit
    def run(x, w):
        xp = jnp.pad(x, ((0, 0),) + ((p, p),) * 3 + ((0, 0),), mode="edge")
        ref = _conv(xp, w)                       # VALID == replicate-SAME
        t = sp.encode(x, 2)
        tp = sp.replicate_pad_cells(t, c, 2, [(pad_lo, pad_hi)] * 3)
        kt = sp.transform_stride1_kernel(w, 2, p)
        yt = _conv(tp, kt)                       # VALID
        return ref, sp.decode(yt, o, 2)

    ref, got = run(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("use_inverse", [False, True])
def test_piresnet3d_s2d_exec_matches_plain(rng, use_inverse):
    """Piresnet3D (RevGAN's generator: replicate-pad k5/k3 convs, k3s2 down,
    k3s2p1op1 up, replicate-pad coupling cores) under s2d execution == plain
    with the same parameters, both directions."""
    from ganslate_tpu.nn.generators import Piresnet3D

    kw = dict(in_channels=1, out_channels=1, depth=2,
              first_layer_channels=4, use_memory_saving=False,
              use_inverse=use_inverse)
    plain = Piresnet3D(**kw)
    s2d = Piresnet3D(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        outs = [plain.apply(params, x), s2d.apply(params, x)]
        if use_inverse:
            outs += [plain.apply(params, x, inverse=True),
                     s2d.apply(params, x, inverse=True)]
        return outs

    outs = run(x)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(outs[0]),
                               atol=2e-3, rtol=1e-3)
    if use_inverse:
        np.testing.assert_allclose(np.asarray(outs[3]), np.asarray(outs[2]),
                                   atol=2e-3, rtol=1e-3)


def test_piresnet3d_s2d_memory_saving_gradients(rng):
    """Recompute-by-inverse VJP through the s2d Piresnet core == plain grads."""
    from ganslate_tpu.nn.generators import Piresnet3D

    kw = dict(in_channels=1, out_channels=1, depth=2,
              first_layer_channels=4, use_inverse=False)
    plain = Piresnet3D(use_memory_saving=False, **kw)
    s2d = Piresnet3D(use_memory_saving=True, use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 1)).astype(np.float32))

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


def test_precomputed_s2d_kernels_exact(rng):
    """Serving with the s2d_kernels cache == computing transforms in-line."""
    import jax
    import jax.numpy as jnp
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.nn.layers import precompute_s2d_kernels

    model = Vnet3D(in_channels=1, out_channels=1, down_blocks=(1, 1),
                   up_blocks=(1, 1), use_memory_saving=False,
                   use_inverse=False, use_s2d_exec=True)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]

    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, x)
    cache = precompute_s2d_kernels(model, params, x)
    out = jax.jit(lambda p, c, v: model.apply(
        {"params": p, "s2d_kernels": c}, v))(params, cache, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # The cache actually contains transformed kernels.
    leaves = jax.tree_util.tree_leaves(cache)
    assert leaves, "empty s2d kernel cache"
    # ... and the forward actually CONSUMES it everywhere, including the
    # coupling halves inside InvertibleSequence (which route collections
    # manually): zeroing the whole cache must change the output. A silent
    # recompute would make the zeroed run identical to the reference.
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, cache)
    out_zero = jax.jit(lambda p, c, v: model.apply(
        {"params": p, "s2d_kernels": c}, v))(params, zeroed, x)
    assert float(jnp.abs(out_zero - ref).max()) > 1e-3, \
        "zeroed s2d kernel cache did not affect the output: cache unused"
    # Per-coupling-half kernels are in the cache (stacked under the
    # sequence modules), not only the top-level conv transforms.
    flat = jax.tree_util.tree_flatten_with_path(cache)[0]
    assert any("core" in jax.tree_util.keystr(path) for path, _ in flat), \
        f"no coupling-core kernels cached: {[jax.tree_util.keystr(p) for p, _ in flat][:8]}"


@pytest.mark.parametrize("use_inverse", [False, True])
def test_vnet_separable_s2d_exec_matches_plain(rng, use_inverse):
    """is_separable V-Net in the s2d execution space == plain separable
    execution with the SAME parameters. Exercises the mixed per-dim kernel
    plans: (1,k,k)/(k,1,1) stride-1 factors, (1,2,2) s(1,2,2) partial-stride
    downs, and identity-dim transposed ups (nn/layers.py `_call_s2d` mixed
    branches; reference factorization /root/reference/ganslate/nn/separable.py)."""
    from ganslate_tpu.nn.generators import Vnet3D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1, 1), up_blocks=(1, 1), is_separable=True,
              use_memory_saving=False, use_inverse=use_inverse)
    plain = Vnet3D(**kw)
    s2d = Vnet3D(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        outs = [plain.apply(params, x), s2d.apply(params, x)]
        if use_inverse:
            outs += [plain.apply(params, x, inverse=True),
                     s2d.apply(params, x, inverse=True)]
        return outs

    outs = run(x)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(outs[0]),
                               atol=2e-3, rtol=1e-3)
    if use_inverse:
        np.testing.assert_allclose(np.asarray(outs[3]), np.asarray(outs[2]),
                                   atol=2e-3, rtol=1e-3)


def test_vnet_separable_s2d_exec_memory_saving_gradients(rng):
    """Separable s2d + recompute-by-inverse VJP gradients == plain separable."""
    from ganslate_tpu.nn.generators import Vnet3D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1,), up_blocks=(1,), is_separable=True,
              use_inverse=False)
    plain = Vnet3D(use_memory_saving=False, **kw)
    s2d = Vnet3D(use_memory_saving=True, use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 1)).astype(np.float32))

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


def test_separable_conv_s2d_anisotropic_extents(rng):
    """The mixed-plan conv/transpose factors stay exact on anisotropic cell
    grids (D != H != W), where per-dim pads/strides genuinely differ."""
    from ganslate_tpu.nn.separable import (SeparableConv3d,
                                           SeparableConvTranspose3d)

    x = jnp.asarray(rng.normal(size=(2, 4, 8, 12, 6)).astype(np.float32))
    xs = sp.encode(x, 2)

    for mod, kw in [
        (SeparableConv3d, dict(features=6, kernel_size=5, padding=2)),
        (SeparableConv3d, dict(features=8, kernel_size=2, strides=2)),
        (SeparableConvTranspose3d, dict(features=3, kernel_size=2, strides=2)),
    ]:
        plain = mod(**kw)
        folded = mod(s2d_space=2, **kw)
        params = jax.jit(plain.init)(jax.random.key(1), x)
        ref = jax.jit(plain.apply)(params, x)
        got_s = jax.jit(folded.apply)(params, xs)
        got = sp.decode(got_s, ref.shape[-1], 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=1e-3)


# ------------------------------------------------- 2D V-Net s2d execution


@pytest.mark.parametrize("use_inverse", [False, True])
def test_vnet2d_s2d_exec_matches_plain(rng, use_inverse):
    """The s2d execution space is rank-generic: Vnet2D(use_s2d_exec=True) ==
    Vnet2D(False) with the SAME parameters (2x2 cells, 4x channel fold)."""
    from ganslate_tpu.nn.generators import Vnet2D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1, 2), up_blocks=(2, 1),
              use_memory_saving=False, use_inverse=use_inverse)
    plain = Vnet2D(**kw)
    s2d = Vnet2D(use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))

    @jax.jit
    def run(x):
        params = plain.init(jax.random.key(0), x)
        outs = [plain.apply(params, x), s2d.apply(params, x)]
        if use_inverse:
            outs += [plain.apply(params, x, inverse=True),
                     s2d.apply(params, x, inverse=True)]
        return outs

    outs = run(x)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(outs[0]),
                               atol=2e-3, rtol=1e-3)
    if use_inverse:
        np.testing.assert_allclose(np.asarray(outs[3]), np.asarray(outs[2]),
                                   atol=2e-3, rtol=1e-3)


def test_vnet2d_s2d_exec_gradients_and_taps(rng):
    """2D s2d gradients (through the recompute-by-inverse VJP) and the CUT
    encoder taps (decoded back to the original grid) match plain exec."""
    from ganslate_tpu.nn.generators import Vnet2D

    kw = dict(in_channels=1, out_channels=1, first_layer_channels=4,
              down_blocks=(1,), up_blocks=(1,), use_inverse=False)
    plain = Vnet2D(use_memory_saving=False, **kw)
    s2d = Vnet2D(use_memory_saving=True, use_s2d_exec=True, **kw)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))

    @jax.jit
    def grads(x):
        params = plain.init(jax.random.key(2), x)
        g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(s2d.apply(p, x) ** 2))(params)
        return g1, g2

    g1, g2 = grads(x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)

    @jax.jit
    def taps(x):
        params = plain.init(jax.random.key(2), x)
        t1 = plain.apply(params, x, extract_features=[0, 1])
        t2 = s2d.apply(params, x, extract_features=[0, 1])
        return t1, t2

    t1, t2 = taps(x)
    for a, b in zip(t1, t2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=1e-3)
