"""2D ResNet generator (reference parity: nn/generators/resnet/resnet2d.py)."""

from dataclasses import dataclass

from ganslate_tpu import configs
from ganslate_tpu.nn.generators.resnet.resnet import ResnetGenerator


@dataclass
class Resnet2DConfig(configs.base.BaseGeneratorConfig):
    n_residual_blocks: int = 9
    # Base width (the reference hardcodes 64; exposed here as a knob).
    ngf: int = 64
    # Boundary-cells execution (exact, same checkpoints): fold the
    # lane-starved stem/head convs; see nn/generators/resnet/resnet.py.
    use_cells_boundary: bool = False


class Resnet2D(ResnetGenerator):
    spatial_dims: int = 2
    pad_mode: str = "reflect"
