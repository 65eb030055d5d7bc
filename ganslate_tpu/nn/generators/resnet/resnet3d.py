"""3D ResNet generator (reference parity: nn/generators/resnet/resnet3d.py —
Conv3d + ReplicationPad3d variant of the 2D architecture)."""

from dataclasses import dataclass

from ganslate_tpu import configs
from ganslate_tpu.nn.generators.resnet.resnet import ResnetGenerator


@dataclass
class Resnet3DConfig(configs.base.BaseGeneratorConfig):
    n_residual_blocks: int = 9
    # Base width (the reference hardcodes 64; exposed here as a knob).
    ngf: int = 64
    # TPU s2d execution space (exact, same checkpoints); see
    # nn/generators/resnet/resnet.py.
    use_s2d_exec: bool = False


class Resnet3D(ResnetGenerator):
    spatial_dims: int = 3
    pad_mode: str = "replicate"
