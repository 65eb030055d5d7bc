"""Partially-invertible ResNet 3D generator (RevGAN's generator).

Architecture parity with the reference Piresnet3D
(/root/reference/ganslate/nn/generators/resnet/piresnet3d.py): separate
AB/BA down-convs (replication-pad k5 conv -> norm -> relu -> k3 s2 conv ->
norm -> relu) and up-convs (k3 s2 transpose -> norm -> relu -> replication-pad
k5 conv -> tanh) around a SHARED invertible additive-coupling core of `depth`
blocks; `inverse=True` runs BA: downconv_ba -> inverted core -> upconv_ba.
`use_memory_saving` enables recompute-by-inverse backprop through the core
(see ganslate_tpu.nn.invertible).
"""

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu import configs
from ganslate_tpu.configs.omega import MISSING
from ganslate_tpu.nn.invertible import InvertibleSequence
from ganslate_tpu.nn.layers import (Conv, ConvTranspose, apply_norm_s2d,
                                    inert_bias, is_bias_before_norm, make_initializer)


@dataclass
class Piresnet3DConfig(configs.base.BaseGeneratorConfig):
    """Partially-invertible Resnet generator — the RevGAN-compatible ResNet."""
    # Memory saving (recompute-by-inverse) for the invertible core.
    use_memory_saving: bool = True
    # Build the BA-direction convs so inverse forward is available.
    use_inverse: bool = True
    first_layer_channels: int = 32
    depth: int = MISSING
    # TPU s2d execution space (exact, same checkpoints): every conv fills
    # the MXU lanes. Needs spatial extents divisible by 4.
    use_s2d_exec: bool = False


class _DownConv(nn.Module):
    features: int
    norm_type: str
    spatial_dims: int
    kernel_init: Callable
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        k5, k3 = (5,) * self.spatial_dims, (3,) * self.spatial_dims
        h = Conv(self.features, k5, padding=2, pad_mode="replicate",
                 use_bias=use_bias, bias_inert=inert_bias(self.norm_type),
                 kernel_init=self.kernel_init,
                 s2d_space=self.s2d, name="conv1")(x)
        h = nn.relu(apply_norm_s2d(self.norm_type, h, self.features, self.s2d))
        h = Conv(self.features * 2, k3, strides=2, padding=1, use_bias=use_bias,
                 bias_inert=inert_bias(self.norm_type),
                 kernel_init=self.kernel_init, s2d_space=self.s2d,
                 name="conv2")(h)
        return nn.relu(apply_norm_s2d(self.norm_type, h, self.features * 2,
                                      self.s2d))


class _UpConv(nn.Module):
    features: int
    out_channels: int
    norm_type: str
    spatial_dims: int
    kernel_init: Callable
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        k5, k3 = (5,) * self.spatial_dims, (3,) * self.spatial_dims
        h = ConvTranspose(self.features, k3, strides=2, padding=1,
                          output_padding=1, use_bias=use_bias,
                          bias_inert=inert_bias(self.norm_type),
                          kernel_init=self.kernel_init, s2d_space=self.s2d,
                          name="convt")(x)
        h = nn.relu(apply_norm_s2d(self.norm_type, h, self.features, self.s2d))
        h = Conv(self.out_channels, k5, padding=2, pad_mode="replicate",
                 kernel_init=self.kernel_init, s2d_space=self.s2d,
                 name="conv")(h)
        return jnp.tanh(h)


class Piresnet3D(nn.Module):
    in_channels: int
    out_channels: int
    depth: int
    norm_type: str = "instance"
    first_layer_channels: int = 64
    use_memory_saving: bool = True
    use_inverse: bool = True
    spatial_dims: int = 3
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02
    # TPU s2d execution space (ops/s2d_space.py): exact, same checkpoints.
    use_s2d_exec: bool = False

    def setup(self):
        if self.use_s2d_exec and self.spatial_dims != 3:
            raise ValueError("use_s2d_exec requires spatial_dims=3.")
        s2d = 2 if self.use_s2d_exec else 0
        init = make_initializer(self.weight_init_type, self.weight_init_gain)
        flc = self.first_layer_channels
        self.down_ab = _DownConv(flc, self.norm_type, self.spatial_dims, init,
                                 s2d=s2d)
        self.up_ab = _UpConv(flc, self.out_channels, self.norm_type,
                             self.spatial_dims, init, s2d=s2d)
        if self.use_inverse:
            self.down_ba = _DownConv(flc, self.norm_type, self.spatial_dims,
                                     init, s2d=s2d)
            self.up_ba = _UpConv(flc, self.out_channels, self.norm_type,
                                 self.spatial_dims, init, s2d=s2d)
        self.core = InvertibleSequence(
            channels=flc * 2, n_blocks=self.depth, norm_type=self.norm_type,
            pad_mode="replicate", spatial_dims=self.spatial_dims,
            use_memory_saving=self.use_memory_saving, kernel_init=init,
            s2d=s2d)

    def torch_param_order_rank(self, path):
        """Align with the reference's registration order (piresnet3d.py:46-56:
        downconv_ab, upconv_ab, downconv_ba, upconv_ba, core) for the
        torch-checkpoint importer."""
        return ({"down_ab": 0, "up_ab": 1, "down_ba": 2, "up_ba": 3,
                 "core": 4}.get(path[0], 9),)

    def __call__(self, x, inverse: bool = False,
                 extract_features: Optional[Sequence[int]] = None):
        if inverse and not self.use_inverse:
            raise ValueError(
                "Trying to perform inverse forward while `use_inverse` flag is turned off.")

        if self.use_s2d_exec:
            for d in x.shape[1:-1]:
                if d % 4:
                    raise ValueError(
                        f"use_s2d_exec needs spatial extents divisible by 4, "
                        f"got {x.shape[1:-1]}.")
            from ganslate_tpu.ops.s2d_space import encode
            x = encode(x, 2)

        # Touch every submodule at init so both directions' params exist in
        # the variables tree regardless of the traced direction.
        if self.is_initializing() and self.use_inverse:
            h_init = self.down_ba(x)
            self.up_ba(h_init)

        down = self.down_ba if inverse else self.down_ab
        up = self.up_ba if inverse else self.up_ab

        h = down(x)
        feats = [h]
        h = self.core(h, inverse=inverse)
        feats.append(h)
        if extract_features is not None:
            # Coarse encoder taps: 0 = downconv output, 1 = core output.
            if self.use_s2d_exec:
                from ganslate_tpu.ops.s2d_space import decode
                return [decode(feats[i], self.first_layer_channels * 2, 2)
                        for i in extract_features]
            return [feats[i] for i in extract_features]
        out = up(h)
        if self.use_s2d_exec:
            from ganslate_tpu.ops.s2d_space import decode
            out = decode(out, self.out_channels, 2)
        return out
