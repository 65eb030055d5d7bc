"""Rank-generic U-Net generator (pix2pix's recursive skip architecture).

Architecture parity with the reference Unet2D/Unet3D
(/root/reference/ganslate/nn/generators/unet/unet2d.py:17-157): recursive
UnetSkipConnectionBlock — k4 s2 down-convs, k4 s2 transposed up-convs, skip
concatenation at every level, `num_downs` levels (outermost -> 3 widening
levels ngf..ngf*8 -> (num_downs-5) constant ngf*8 levels -> innermost),
LeakyReLU(0.2) down / ReLU up, tanh output, optional dropout(0.5) on the
constant-width middle levels.

One implementation serves 2D and 3D (spatial rank from `spatial_dims`),
channels-last. Recursion is unrolled into an explicit down/up loop — same
graph, friendlier to read and to XLA.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu.nn.layers import (Conv, ConvTranspose,
                                    apply_norm_s2d, get_norm_layer,
                                    is_bias_before_norm, leaky_relu,
                                    make_initializer)


class UnetGenerator(nn.Module):
    in_channels: int
    out_channels: int
    num_downs: int = 7
    ngf: int = 64
    norm_type: str = "instance"
    use_dropout: bool = False
    spatial_dims: int = 2
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02
    # Beyond-reference TPU execution mode (exact, same parameters; see
    # ops/s2d_space.py and docs/benchmarks.md): run the OUTERMOST levels in
    # c-major space-to-depth space so the small-channel k4 convs get >=128
    # MXU output lanes. Unlike the V-Net (all levels, constant extents), the
    # U-Net halves extents all the way down to 1 — so only the outermost
    # `s2d_depth` levels (where the original extent at every level stays
    # divisible by 4) execute folded; deeper levels (ngf*8 wide — already
    # lane-saturated) run plain, with a decode/encode pair at the boundary.
    use_s2d_exec: bool = False

    def _s2d_depth(self, spatial_shape):
        """Levels 0..L-1 run in s2d space: level i's down conv needs its
        input extent divisible by 4 (input cells even AND output extent even,
        so both are representable as r=2 cell grids)."""
        depth = 0
        while depth < self.num_downs and all(
                (d >> depth) % 4 == 0 and d % (1 << depth) == 0
                for d in spatial_shape):
            depth += 1
        return depth

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = make_initializer(self.weight_init_type, self.weight_init_gain)
        norm = get_norm_layer(self.norm_type)
        use_bias = is_bias_before_norm(self.norm_type)
        k = (4,) * self.spatial_dims

        # Per-level widths, outermost first. Reference structure: ngf, ngf*2,
        # ngf*4, then ngf*8 for all deeper levels.
        widths = [min(self.ngf * (2 ** i), self.ngf * 8)
                  for i in range(self.num_downs)]
        # Middle levels (constant ngf*8, excluding innermost) carry dropout.
        dropout_levels = set(range(4, self.num_downs - 1)) if self.use_dropout else set()

        # s2d execution: levels 0..L-1 folded, deeper levels plain.
        s2d_depth = 0
        if self.use_s2d_exec:
            if self.spatial_dims != 3:
                raise ValueError("use_s2d_exec is for the 3D U-Net (2D convs "
                                 "already run at MXU peak; docs/benchmarks.md)")
            s2d_depth = self._s2d_depth(x.shape[1:-1])
            if s2d_depth == 0:
                raise ValueError(
                    f"use_s2d_exec needs spatial extents divisible by 4, "
                    f"got {x.shape[1:-1]}")
            from ganslate_tpu.ops.s2d_space import decode, encode
            x = encode(x, 2)

        def s2d_of(level):
            return 2 if level < s2d_depth else 0

        def apply_norm(h, channels, level):
            if s2d_of(level):
                return apply_norm_s2d(self.norm_type, h, channels, 2)
            return norm()(h)

        # ---- Encoder. Level i down-conv: widths[i] filters.
        skips = []
        h = x
        for i, w in enumerate(widths):
            if i > 0:
                h = leaky_relu(h)
            if self.use_s2d_exec and i == s2d_depth:
                # Boundary: deeper levels run plain — decode (one one-hot
                # transposed conv) and continue on the original grid.
                h = decode(h, widths[i - 1], 2)
            h = Conv(w, k, strides=2, padding=1, use_bias=use_bias,
                     kernel_init=init, s2d_space=s2d_of(i),
                     name=f"down{i}")(h)
            if 0 < i < self.num_downs - 1:
                h = apply_norm(h, w, i)
            skips.append(h)

        # ---- Decoder. Level i up-conv mirrors down level i.
        for i in reversed(range(self.num_downs)):
            h = nn.relu(h)
            is_outermost = i == 0
            out_w = self.out_channels if is_outermost else widths[i - 1]
            h = ConvTranspose(out_w, k, strides=2, padding=1,
                              use_bias=True if is_outermost else use_bias,
                              kernel_init=init, s2d_space=s2d_of(i),
                              name=f"up{i}")(h)
            if not is_outermost:
                h = apply_norm(h, out_w, i)
                if i in dropout_levels:
                    h = nn.Dropout(rate=0.5, deterministic=not train)(h)
                if self.use_s2d_exec and i == s2d_depth:
                    # Boundary (mirrored): the plain up{L} output meets the
                    # folded skips[L-1] — re-enter the s2d space here.
                    h = encode(h, 2)
                # Skip connection: concat with the matching encoder output
                # (lane-contiguous in c-major s2d space, exactly as plain).
                h = jnp.concatenate([skips[i - 1], h], axis=-1)

        if self.use_s2d_exec:
            h = decode(h, self.out_channels, 2)
        return jnp.tanh(h)
