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

from ganslate_tpu.nn.layers import (Conv, ConvTranspose, get_norm_layer,
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

        # ---- Encoder. Level i down-conv: widths[i] filters.
        skips = []
        h = x
        for i, w in enumerate(widths):
            if i > 0:
                h = leaky_relu(h)
            h = Conv(w, k, strides=2, padding=1, use_bias=use_bias,
                     kernel_init=init, name=f"down{i}")(h)
            if 0 < i < self.num_downs - 1:
                h = norm()(h)
            skips.append(h)

        # ---- Decoder. Level i up-conv mirrors down level i.
        for i in reversed(range(self.num_downs)):
            h = nn.relu(h)
            is_outermost = i == 0
            is_innermost = i == self.num_downs - 1
            out_w = self.out_channels if is_outermost else widths[i - 1]
            h = ConvTranspose(out_w, k, strides=2, padding=1,
                              use_bias=True if is_outermost else use_bias,
                              kernel_init=init, name=f"up{i}")(h)
            if not is_outermost:
                h = norm()(h)
                if i in dropout_levels:
                    h = nn.Dropout(rate=0.5, deterministic=not train)(h)
                # Skip connection: concat with the matching encoder output.
                h = jnp.concatenate([skips[i - 1], h], axis=-1)

        return jnp.tanh(h)
