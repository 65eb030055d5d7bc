"""3D U-Net generator (reference parity: nn/generators/unet/unet3d.py —
Conv3d variant of the recursive skip architecture)."""

from dataclasses import dataclass

from ganslate_tpu import configs
from ganslate_tpu.nn.generators.unet.unet import UnetGenerator


@dataclass
class Unet3DConfig(configs.base.BaseGeneratorConfig):
    num_downs: int = 7
    ngf: int = 64
    use_dropout: bool = False
    # TPU s2d execution space (exact, same checkpoints): fold the outermost
    # levels whose extents allow it; see nn/generators/unet/unet.py.
    use_s2d_exec: bool = False


class Unet3D(UnetGenerator):
    spatial_dims: int = 3
