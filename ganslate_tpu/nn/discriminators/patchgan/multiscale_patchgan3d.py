"""Multi-scale 3D PatchGAN: one PatchGAN3D per scale, each judging a randomly
cropped patch of size 1/scale; returns a dict of outputs which the
adversarial loss averages.

Reference parity: /root/reference/ganslate/nn/discriminators/patchgan/
multiscale_patchgan3d.py (MONAI RandSpatialCrop -> keyed `jax.random` crop
with static sizes; `lax.dynamic_slice` keeps the program shape-static).
When no 'crop' RNG is provided to apply() (e.g. at inference), crops are
center crops — deterministic evaluation.
"""

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu import configs
from ganslate_tpu.nn.discriminators.patchgan.patchgan import PatchGAN


@dataclass
class MultiScalePatchGAN3DConfig(configs.base.BaseDiscriminatorConfig):
    ndf: int = 64
    n_layers: int = 3
    kernel_size: Tuple[int] = (4, 4, 4)
    # Scale s judges a random patch of 1/s the spatial size; scales=2 means
    # the original plus a half-size random patch.
    scales: int = 2


class MultiScalePatchGAN3D(nn.Module):
    # Train steps read this to thread a fresh 'crop' key into every apply
    # site (reference takes a new RandSpatialCrop per call).
    stochastic_rngs = ("crop",)

    in_channels: int
    ndf: int = 64
    n_layers: int = 3
    kernel_size: Tuple[int, ...] = (4, 4, 4)
    scales: int = 2
    norm_type: str = "instance"
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02

    def _crop(self, x, scale: int):
        """Random (or center, without a 'crop' rng) crop of 1/scale size."""
        spatial = x.shape[1:-1]
        crop = tuple(s // scale for s in spatial)
        if crop == spatial:
            return x
        if self.has_rng("crop"):
            key = self.make_rng("crop")
            keys = jax.random.split(key, len(spatial))
            starts = [jax.random.randint(k, (), 0, s - c + 1)
                      for k, s, c in zip(keys, spatial, crop)]
        else:
            starts = [(s - c) // 2 for s, c in zip(spatial, crop)]
        start_indices = (jnp.zeros((), jnp.int32), *starts,
                         jnp.zeros((), jnp.int32))
        return jax.lax.dynamic_slice(
            x, start_indices, (x.shape[0], *crop, x.shape[-1]))

    @nn.compact
    def __call__(self, x):
        outputs = {}
        for scale in range(1, self.scales + 1):
            patch = self._crop(x, scale)
            outputs[str(scale)] = PatchGAN(
                in_channels=self.in_channels, ndf=self.ndf,
                n_layers=self.n_layers, kernel_size=tuple(self.kernel_size),
                norm_type=self.norm_type,
                weight_init_type=self.weight_init_type,
                weight_init_gain=self.weight_init_gain,
                name=f"scale{scale}")(patch)
        return outputs
