"""3D partially-invertible V-Net (reference parity:
nn/generators/vnet/vnet3d.py — dual AB/BA paths, separable option, encoder
taps for CUT)."""

from dataclasses import dataclass
from typing import Tuple

from ganslate_tpu import configs
from ganslate_tpu.nn.generators.vnet.vnet import VnetGenerator


@dataclass
class Vnet3DConfig(configs.base.BaseGeneratorConfig):
    """Partially-invertible V-Net generator."""
    use_memory_saving: bool = False
    use_inverse: bool = False
    first_layer_channels: int = 16
    down_blocks: Tuple[int] = (1, 2, 3, 2)
    up_blocks: Tuple[int] = (2, 2, 1, 1)
    is_separable: bool = False
    # Beyond-reference TPU execution mode: run the whole network in c-major
    # space-to-depth space (exact, same checkpoints) so every conv fills the
    # MXU lanes — ~4x on the flc=16 levels. Needs even spatial extents at
    # every level; no attention/separable/CUT-feature-taps.
    use_s2d_exec: bool = False


class Vnet3D(VnetGenerator):
    spatial_dims: int = 3
