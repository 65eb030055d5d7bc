"""Depth-separable 3D convolutions: a (1, kh, kw) in-plane conv followed by a
(kd, 1, 1) through-plane conv (and the transposed pair).

Reference parity: /root/reference/ganslate/nn/separable.py — note this is a
spatial factorization across full channels (both convs mix channels), not a
channelwise-depthwise separable conv. Used by the V-Net family via
`is_separable` to cut FLOPs on anisotropic medical volumes.
"""

from typing import Callable, Sequence, Tuple, Union

from flax import linen as nn

from ganslate_tpu.nn.layers import Conv, ConvTranspose


def _triple(v) -> Tuple[int, int, int]:
    return (v,) * 3 if isinstance(v, int) else tuple(v)


class SeparableConv3d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    # Only the LAST factor's bias feeds the following norm directly (the
    # first factor's bias passes through the second conv's zero padding, so
    # it does NOT cancel); see layers.Conv.bias_inert.
    bias_inert: bool = False
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    s2d_space: int = 0  # both factors run in the s2d execution space

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        p = _triple(self.padding)
        h = Conv(self.features, (1, k[1], k[2]), strides=(1, s[1], s[2]),
                 padding=(0, p[1], p[2]), use_bias=self.use_bias,
                 kernel_init=self.kernel_init, s2d_space=self.s2d_space,
                 name="depthwise")(x)
        return Conv(self.features, (k[0], 1, 1), strides=(s[0], 1, 1),
                    padding=(p[0], 0, 0), use_bias=self.use_bias,
                    bias_inert=self.bias_inert,
                    kernel_init=self.kernel_init, s2d_space=self.s2d_space,
                    name="pointwise")(h)


class SeparableConvTranspose3d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    # See SeparableConv3d.bias_inert: last factor only.
    bias_inert: bool = False
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    s2d_space: int = 0  # both factors run in the s2d execution space

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        p = _triple(self.padding)
        h = ConvTranspose(self.features, (1, k[1], k[2]), strides=(1, s[1], s[2]),
                          padding=(0, p[1], p[2]), use_bias=self.use_bias,
                          kernel_init=self.kernel_init,
                          s2d_space=self.s2d_space, name="depthwise")(x)
        return ConvTranspose(self.features, (k[0], 1, 1), strides=(s[0], 1, 1),
                             padding=(p[0], 0, 0), use_bias=self.use_bias,
                             bias_inert=self.bias_inert,
                             kernel_init=self.kernel_init,
                             s2d_space=self.s2d_space, name="pointwise")(h)
