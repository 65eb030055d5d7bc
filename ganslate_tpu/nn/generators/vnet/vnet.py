"""Rank-generic partially-invertible V-Net generator.

Architecture parity with the reference Vnet2D/Vnet3D/SelfAttentionVnet3D
(/root/reference/ganslate/nn/generators/vnet/vnet3d.py): InputBlock (k5 conv
+ norm + residual channel-repeated input + PReLU), per-level DownBlocks
(k2 s2 conv + norm + PReLU -> invertible coupling core -> residual + PReLU),
UpBlocks (k2 s2 transpose to half width + norm + PReLU -> skip concat ->
invertible core -> residual + PReLU), OutBlock (k5 conv + norm + PReLU + k1
conv + tanh). Dual AB/BA in/out/down/up convs when `use_inverse` (RevGAN
compatibility), shared invertible cores; optional separable convs; optional
SAGAN self-attention after selected down levels.

Invertible cores use the recompute-by-inverse custom VJP when
`use_memory_saving` (ganslate_tpu.nn.invertible); encoder taps for CUT are
[input-block out, down_0 out, ..., down_{n-1} out] — the same indexing as the
reference's `self.encoder` ModuleList (vnet3d.py:83-88).
"""

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu.nn.attention import SelfAttentionBlock
from ganslate_tpu.nn.invertible import InvertibleSequence
from ganslate_tpu.nn.layers import (Conv, ConvTranspose, PReLU,
                                    apply_norm_s2d as _apply_norm,
                                    inert_bias, is_bias_before_norm,
                                    make_initializer)
from ganslate_tpu.nn.separable import SeparableConv3d, SeparableConvTranspose3d


def _conv(is_separable, spatial_dims, s2d=0):
    if is_separable:
        assert spatial_dims == 3, "separable convs are 3D-only"
        return lambda feats, k, **kw: SeparableConv3d(feats, k, s2d_space=s2d,
                                                      **kw)
    return lambda feats, k, **kw: Conv(feats, (k,) * spatial_dims,
                                       s2d_space=s2d, **kw)


def _convt(is_separable, spatial_dims, s2d=0):
    if is_separable:
        assert spatial_dims == 3, "separable convs are 3D-only"
        return lambda feats, k, **kw: SeparableConvTranspose3d(
            feats, k, s2d_space=s2d, **kw)
    return lambda feats, k, **kw: ConvTranspose(feats, (k,) * spatial_dims,
                                                s2d_space=s2d, **kw)


# Fuse the PReLU select into the group-norm's f32 normalize pass on the
# s2d path (PReLU(fused_norm=True) — one elementwise pass instead of
# normalize -> cast -> select). OFF by default: measured NEUTRAL on the
# 28-window sliding-window call (2.58 vs 2.60 vols/s — XLA already fuses
# the select with the normalize at these sites; the orphaned
# compare_select fusions in the trace are elsewhere, at coupling-scan
# boundaries). Module-level so A/B harnesses can flip it.
FUSE_NORM_PRELU = False


def _norm_prelu(norm_type, h, feats, s2d, spatial_dims):
    """norm + PReLU, fused into one pass in the s2d instance-norm case.
    The PReLU module is constructed either way (same module order, same
    name, same `slope` param path — checkpoints unchanged)."""
    rn = s2d ** spatial_dims
    if s2d > 1 and norm_type == "instance" and FUSE_NORM_PRELU:
        return PReLU(feats, s2d_rn=rn, fused_norm=True)(h)
    h = _apply_norm(norm_type, h, feats, s2d)
    return PReLU(feats, s2d_rn=rn)(h)


class VnetInvBlock(nn.Module):
    """Half-width residual fn inside V-Net couplings: k5 conv + norm + PReLU."""
    features: int
    norm_type: str
    spatial_dims: int
    is_separable: bool
    kernel_init: Callable
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        conv = _conv(self.is_separable, self.spatial_dims, self.s2d)
        h = conv(self.features, 5, padding=2, use_bias=use_bias,
                 bias_inert=inert_bias(self.norm_type),
                 kernel_init=self.kernel_init, name="conv")(x)
        return _norm_prelu(self.norm_type, h, self.features, self.s2d,
                           self.spatial_dims)


class InputBlock(nn.Module):
    in_channels: int
    out_channels: int
    norm_type: str
    spatial_dims: int
    is_separable: bool
    kernel_init: Callable
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        conv = _conv(self.is_separable, self.spatial_dims, self.s2d)
        out = conv(self.out_channels, 5, padding=2, use_bias=use_bias,
                   bias_inert=inert_bias(self.norm_type),
                   kernel_init=self.kernel_init, name="conv1")(x)
        # Residual channel-repeat: exact in c-major s2d space too (tiling the
        # (c, d) channel vector == s2d of the original channel tile).
        n_repeats = self.out_channels // self.in_channels
        rn = self.s2d ** self.spatial_dims
        from ganslate_tpu.flags import FLAGS
        if self.s2d > 1 and self.norm_type == "instance" \
                and FLAGS.vnet_stem_fused:
            # One f32 pass for norm + channel-repeat residual + PReLU.
            # Default OFF (flags.vnet_stem_fused): the unfused chain costs
            # 18.6 ms/call in the trace (tile + layout copy + orphaned
            # select) but fusing it measured -2.2% END TO END on the BRaTS
            # sliding window — those separate ops are load-bearing for
            # XLA's surrounding fusion/layout choices.
            return PReLU(self.out_channels, s2d_rn=rn, fused_norm=True)(
                out, residual=x, residual_tile=n_repeats)
        out = _apply_norm(self.norm_type, out, self.out_channels, self.s2d)
        out = out + jnp.tile(x, (1,) * (x.ndim - 1) + (n_repeats,))
        return PReLU(self.out_channels, s2d_rn=rn)(out)


class _DownConv(nn.Module):
    features: int
    norm_type: str
    spatial_dims: int
    is_separable: bool
    kernel_init: Callable
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        conv = _conv(self.is_separable, self.spatial_dims, self.s2d)
        h = conv(self.features, 2, strides=2, use_bias=use_bias,
                 bias_inert=inert_bias(self.norm_type),
                 kernel_init=self.kernel_init, name="conv")(x)
        return _norm_prelu(self.norm_type, h, self.features, self.s2d,
                           self.spatial_dims)


class _UpConv(nn.Module):
    features: int  # output width of the transpose conv (out_channels // 2)
    norm_type: str
    spatial_dims: int
    is_separable: bool
    kernel_init: Callable
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        convt = _convt(self.is_separable, self.spatial_dims, self.s2d)
        h = convt(self.features, 2, strides=2, use_bias=use_bias,
                  bias_inert=inert_bias(self.norm_type),
                  kernel_init=self.kernel_init, name="convt")(x)
        return _norm_prelu(self.norm_type, h, self.features, self.s2d,
                           self.spatial_dims)


class DownBlock(nn.Module):
    in_channels: int
    n_conv_blocks: int
    norm_type: str
    spatial_dims: int
    use_memory_saving: bool
    use_inverse: bool
    is_separable: bool
    kernel_init: Callable
    s2d: int = 0

    def setup(self):
        out = 2 * self.in_channels
        args = (self.norm_type, self.spatial_dims, self.is_separable, self.kernel_init)
        self.down_conv_ab = _DownConv(out, *args, s2d=self.s2d)
        if self.use_inverse:
            self.down_conv_ba = _DownConv(out, *args, s2d=self.s2d)
        self.core = InvertibleSequence(
            channels=out, n_blocks=self.n_conv_blocks, norm_type=self.norm_type,
            spatial_dims=self.spatial_dims, use_memory_saving=self.use_memory_saving,
            kernel_init=self.kernel_init,
            block_template=VnetInvBlock(out // 2, *args, s2d=self.s2d),
            s2d=self.s2d)
        self.relu = PReLU(out, s2d_rn=self.s2d ** self.spatial_dims)

    def __call__(self, x, inverse: bool = False):
        if self.is_initializing() and self.use_inverse:
            self.down_conv_ba(x)
        down_conv = self.down_conv_ba if inverse else self.down_conv_ab
        down = down_conv(x)
        out = self.core(down, inverse=inverse)
        return self.relu(out + down)


class UpBlock(nn.Module):
    in_channels: int
    out_channels: int
    n_conv_blocks: int
    norm_type: str
    spatial_dims: int
    use_memory_saving: bool
    use_inverse: bool
    is_separable: bool
    kernel_init: Callable
    s2d: int = 0

    def setup(self):
        args = (self.norm_type, self.spatial_dims, self.is_separable, self.kernel_init)
        self.up_conv_ab = _UpConv(self.out_channels // 2, *args, s2d=self.s2d)
        if self.use_inverse:
            self.up_conv_ba = _UpConv(self.out_channels // 2, *args, s2d=self.s2d)
        self.core = InvertibleSequence(
            channels=self.out_channels, n_blocks=self.n_conv_blocks,
            norm_type=self.norm_type, spatial_dims=self.spatial_dims,
            use_memory_saving=self.use_memory_saving, kernel_init=self.kernel_init,
            block_template=VnetInvBlock(self.out_channels // 2, *args,
                                        s2d=self.s2d),
            s2d=self.s2d)
        self.relu = PReLU(self.out_channels,
                          s2d_rn=self.s2d ** self.spatial_dims)

    def __call__(self, x, skipx, inverse: bool = False):
        if self.is_initializing() and self.use_inverse:
            self.up_conv_ba(x)
        up_conv = self.up_conv_ba if inverse else self.up_conv_ab
        up = up_conv(x)
        xcat = jnp.concatenate([up, skipx], axis=-1)
        out = self.core(xcat, inverse=inverse)
        return self.relu(out + xcat)


class OutBlock(nn.Module):
    in_channels: int
    out_channels: int
    norm_type: str
    spatial_dims: int
    is_separable: bool
    kernel_init: Callable
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        conv = _conv(self.is_separable, self.spatial_dims, self.s2d)
        h = conv(self.in_channels, 5, padding=2, use_bias=use_bias,
                 bias_inert=inert_bias(self.norm_type),
                 kernel_init=self.kernel_init, name="conv1")(x)
        h = _norm_prelu(self.norm_type, h, self.in_channels, self.s2d,
                        self.spatial_dims)
        h = conv(self.out_channels, 1, kernel_init=self.kernel_init, name="conv2")(h)
        return jnp.tanh(h)


class VnetGenerator(nn.Module):
    in_channels: int
    out_channels: int
    norm_type: str = "instance"
    first_layer_channels: int = 16
    down_blocks: Tuple[int, ...] = (1, 2, 3, 2)
    up_blocks: Tuple[int, ...] = (2, 2, 1, 1)
    use_memory_saving: bool = True
    use_inverse: bool = True
    is_separable: bool = False
    # Per-down-level SAGAN attention (SelfAttentionVnet3D when any True).
    enable_attention_block: Optional[Tuple[bool, ...]] = None
    spatial_dims: int = 3
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02
    # Beyond-reference TPU execution mode (exact, same parameters): run the
    # whole network in c-major space-to-depth space (ops/s2d_space.py) so
    # every conv is >=128 output lanes on the MXU. 3D, zero-pad,
    # instance/none norm, even spatial extents at every level (separable
    # convs supported via per-dim mixed kernel plans). Measured ~4x on
    # V-Net level-0 convs (docs/benchmarks.md).
    use_s2d_exec: bool = False

    def setup(self):
        if self.first_layer_channels % self.in_channels:
            raise ValueError("`first_layer_channels` has to be divisible by `in_channels`.")
        if len(self.down_blocks) != len(self.up_blocks):
            raise ValueError("Number of `down_blocks` and `up_blocks` has to be equal.")
        if self.use_s2d_exec:
            if self.spatial_dims not in (2, 3):
                raise ValueError("use_s2d_exec requires spatial_dims in "
                                 "(2, 3).")
        s2d = 2 if self.use_s2d_exec else 0

        init = make_initializer(self.weight_init_type, self.weight_init_gain)
        flc = self.first_layer_channels
        args = (self.norm_type, self.spatial_dims, self.is_separable, init)

        self.in_ab = InputBlock(self.in_channels, flc, *args, s2d=s2d)
        self.out_ab = OutBlock(flc * 2, self.out_channels, *args, s2d=s2d)
        if self.use_inverse:
            self.in_ba = InputBlock(self.in_channels, flc, *args, s2d=s2d)
            self.out_ba = OutBlock(flc * 2, self.out_channels, *args, s2d=s2d)

        downs, attns, factors = [], [], []
        for i, num_convs in enumerate(self.down_blocks):
            factor = 2 ** i
            downs.append(DownBlock(flc * factor, num_convs, self.norm_type,
                                   self.spatial_dims, self.use_memory_saving,
                                   self.use_inverse, self.is_separable, init,
                                   s2d=s2d))
            if self.enable_attention_block and self.enable_attention_block[i]:
                attns.append(SelfAttentionBlock(flc * factor * 2, kernel_init=init))
            else:
                attns.append(None)
            factors.append(factor)
        self.downs = downs
        self.attns = attns

        up_factors = [f * 2 for f in reversed(factors)]
        ups = [UpBlock(flc * up_factors[0], flc * up_factors[0],
                       self.up_blocks[0], self.norm_type, self.spatial_dims,
                       self.use_memory_saving, self.use_inverse,
                       self.is_separable, init, s2d=s2d)]
        for i, num_convs in enumerate(self.up_blocks[1:]):
            ups.append(UpBlock(flc * up_factors[i], flc * up_factors[i + 1],
                               num_convs, self.norm_type, self.spatial_dims,
                               self.use_memory_saving, self.use_inverse,
                               self.is_separable, init, s2d=s2d))
        self.ups = ups

    @property
    def num_feature_levels(self):
        return 1 + len(self.down_blocks)

    def torch_param_order_rank(self, path):
        """Sort key aligning flax param-creation order with the reference's
        torch registration order (vnet3d.py registers in_ab, in_ba, out_ab,
        out_ba, downs, ups — and ab-convs before ba-convs inside each block,
        while our init trace touches the ba branches first). Consumed by
        utils.torch_import.flax_param_spec."""
        name = path[0]
        top = {"in_ab": (0, 0), "in_ba": (1, 0),
               "out_ab": (2, 0), "out_ba": (3, 0)}.get(name)
        if top is None:
            kind, _, idx = name.rpartition("_")
            idx = int(idx) if idx.isdigit() else 0
            if kind == "downs":
                top = (4, idx)
            elif kind == "attns":
                # torch registers the whole attn ModuleList AFTER all downs
                # (selfattention_vnet3d.py:108-109).
                top = (5, idx)
            elif kind == "ups":
                top = (6, idx)
            else:
                top = (9, 0)
        sub = {"down_conv_ab": 0, "up_conv_ab": 0,
               "down_conv_ba": 1, "up_conv_ba": 1,
               "core": 2, "relu": 3}.get(path[1], 0) if len(path) > 1 else 0
        return (*top, sub)

    def __call__(self, x, inverse: bool = False,
                 extract_features: Optional[Sequence[int]] = None):
        if inverse and not self.use_inverse:
            raise ValueError(
                "Trying to perform inverse forward while `use_inverse` flag is turned off.")

        if self.use_s2d_exec:
            depth = len(self.down_blocks)
            for d in x.shape[1:-1]:
                if d % (2 ** (depth + 1)):
                    raise ValueError(
                        f"use_s2d_exec needs spatial extents divisible by "
                        f"2^(levels+1)={2 ** (depth + 1)}, got {x.shape[1:-1]}.")
            from ganslate_tpu.ops.s2d_space import decode, encode
            x = encode(x, 2)

        if self.is_initializing() and self.use_inverse:
            self.out_ba(
                jnp.zeros((*x.shape[:-1],
                           self.first_layer_channels * 2 *
                           (8 if self.use_s2d_exec else 1)), x.dtype))
            self.in_ba(x)

        in_block = self.in_ba if inverse else self.in_ab
        out_block = self.out_ba if inverse else self.out_ab

        # Input block output doubles as the last skip connection.
        out1 = in_block(x)
        features = [out1]

        down_outs = []
        h = out1
        for i, (down, attn) in enumerate(zip(self.downs, self.attns)):
            h = down(h, inverse=inverse)
            if attn is not None:
                if self.use_s2d_exec:
                    # Attention runs in the original space (its softmax mixes
                    # spatial positions, which folding would change): decode,
                    # attend, re-encode — two one-hot convs per attended level.
                    from ganslate_tpu.ops.s2d_space import decode, encode
                    c_level = self.first_layer_channels * 2 ** (i + 1)
                    h = encode(attn(decode(h, c_level, 2)), 2)
                else:
                    h = attn(h)
            down_outs.append(h)
            features.append(h)

        if extract_features is not None:
            if self.use_s2d_exec:
                # Decode only the requested taps back to the original grid
                # (one-hot transposed convs) so CUT's patch sampling sees the
                # same geometry as plain execution.
                from ganslate_tpu.ops.s2d_space import decode
                flc = self.first_layer_channels
                true_c = [flc] + [flc * 2 ** (i + 1)
                                  for i in range(len(self.down_blocks))]
                return [decode(features[i], true_c[i], 2)
                        for i in extract_features]
            return [features[i] for i in extract_features]

        down_outs_reversed = list(reversed(down_outs))
        out = down_outs_reversed[0]
        for i, up in enumerate(self.ups):
            skip = out1 if i == len(self.ups) - 1 else down_outs_reversed[i + 1]
            out = up(out, skip, inverse=inverse)

        out = out_block(out)
        if self.use_s2d_exec:
            from ganslate_tpu.ops.s2d_space import decode
            out = decode(out, self.out_channels, 2)
        return out
