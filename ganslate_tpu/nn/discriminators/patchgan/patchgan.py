"""Rank-generic PatchGAN discriminator (the 70x70 PatchGAN family).

Architecture parity with the reference PatchGAN2D/3D
(/root/reference/ganslate/nn/discriminators/patchgan/patchgan2d.py:17-66):
k4 s2 conv ndf -> LeakyReLU(0.2), then (n_layers-1) k4 s2 conv blocks doubling
channels (capped at 8*ndf) with norm, one k4 s1 block, and a final k4 s1 conv
to a 1-channel patch map (no sigmoid — the adversarial loss handles logits).

Channels-last, rank inferred from kernel_size; serves 2D and 3D.
"""

from typing import Sequence, Tuple

from flax import linen as nn

from ganslate_tpu.nn.layers import (Conv, NormAct, inert_bias,
                                    is_bias_before_norm, leaky_relu,
                                    make_initializer)


class PatchGAN(nn.Module):
    in_channels: int
    ndf: int = 64
    n_layers: int = 3
    kernel_size: Tuple[int, ...] = (4, 4)
    norm_type: str = "instance"
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        init = make_initializer(self.weight_init_type, self.weight_init_gain)
        use_bias = is_bias_before_norm(self.norm_type)
        inert = inert_bias(self.norm_type)
        kw = tuple(self.kernel_size)
        padw = 1

        h = Conv(self.ndf, kw, strides=2, padding=padw, kernel_init=init, name="stem")(x)
        h = leaky_relu(h)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = Conv(self.ndf * nf_mult, kw, strides=2, padding=padw, use_bias=use_bias,
                     bias_inert=inert, kernel_init=init, name=f"down{n}")(h)
            h = NormAct(self.norm_type, "leaky_relu")(h)

        nf_mult = min(2 ** self.n_layers, 8)
        h = Conv(self.ndf * nf_mult, kw, strides=1, padding=padw, use_bias=use_bias,
                 bias_inert=inert, kernel_init=init, name="penultimate")(h)
        h = NormAct(self.norm_type, "leaky_relu")(h)

        return Conv(1, kw, strides=1, padding=padw, kernel_init=init, name="head")(h)
