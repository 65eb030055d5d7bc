"""3D PatchGAN with SAGAN self-attention: stride-3 stem (memory), two
attention blocks after the widest conv stages.

Reference parity: /root/reference/ganslate/nn/discriminators/patchgan/
selfattention_patchgan3d.py.
"""

from dataclasses import dataclass
from typing import Tuple

from flax import linen as nn

from ganslate_tpu import configs
from ganslate_tpu.nn.attention import SelfAttentionBlock
from ganslate_tpu.nn.layers import (Conv, get_norm_layer, inert_bias,
                                    is_bias_before_norm,
                                    leaky_relu, make_initializer)


@dataclass
class SelfAttentionPatchGAN3DConfig(configs.base.BaseDiscriminatorConfig):
    ndf: int = 64
    n_layers: int = 3
    kernel_size: Tuple[int] = (4, 4, 4)


class SelfAttentionPatchGAN3D(nn.Module):
    in_channels: int
    ndf: int = 64
    n_layers: int = 3
    kernel_size: Tuple[int, ...] = (4, 4, 4)
    norm_type: str = "instance"
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        init = make_initializer(self.weight_init_type, self.weight_init_gain)
        norm = get_norm_layer(self.norm_type)
        use_bias = is_bias_before_norm(self.norm_type)
        kw = tuple(self.kernel_size)
        padw = 1

        # Stride-3 stem keeps attention's N x N matrix affordable.
        h = Conv(self.ndf, kw, strides=3, padding=padw, kernel_init=init,
                 name="stem")(x)
        h = leaky_relu(h)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = Conv(self.ndf * nf_mult, kw, strides=2, padding=padw,
                     use_bias=use_bias, bias_inert=inert_bias(self.norm_type),
                     kernel_init=init, name=f"down{n}")(h)
            h = norm()(h)
            h = leaky_relu(h)

        h = SelfAttentionBlock(self.ndf * nf_mult, kernel_init=init,
                               name="attn1")(h)

        nf_mult = min(2 ** self.n_layers, 8)
        h = Conv(self.ndf * nf_mult, kw, strides=1, padding=padw,
                 use_bias=use_bias, bias_inert=inert_bias(self.norm_type),
                 kernel_init=init, name="penultimate")(h)
        h = norm()(h)
        h = leaky_relu(h)

        h = SelfAttentionBlock(self.ndf * nf_mult, kernel_init=init,
                               name="attn2")(h)
        return Conv(1, kw, strides=1, padding=padw, kernel_init=init,
                    name="head")(h)
