"""2D partially-invertible V-Net (reference parity:
nn/generators/vnet/vnet2d.py — Conv2d variant, no separable option)."""

from dataclasses import dataclass

from ganslate_tpu import configs
from ganslate_tpu.nn.generators.vnet.vnet import VnetGenerator


@dataclass
class Vnet2DConfig(configs.base.BaseGeneratorConfig):
    """Partially-invertible V-Net generator."""
    use_memory_saving: bool = True
    use_inverse: bool = True
    first_layer_channels: int = 16
    # TPU execution mode (exact, same checkpoints): run the network with
    # 2x2 spatial cells folded into channels (ops/s2d_space.py).
    use_s2d_exec: bool = False


class Vnet2D(VnetGenerator):
    spatial_dims: int = 2
