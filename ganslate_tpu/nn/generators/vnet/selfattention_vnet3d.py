"""V-Net 3D with per-level SAGAN self-attention after selected down blocks
(reference parity: nn/generators/vnet/selfattention_vnet3d.py)."""

from dataclasses import dataclass
from typing import Tuple

from ganslate_tpu import configs
from ganslate_tpu.nn.generators.vnet.vnet import VnetGenerator


@dataclass
class SelfAttentionVnet3DConfig(configs.base.BaseGeneratorConfig):
    """Partially-invertible V-Net generator with self-attention.

    Attention blocks (SAGAN, arxiv 1805.08318) are inserted after selected
    down blocks so distant image regions (e.g. CBCT artifacts) can interact
    beyond convolutional locality."""
    use_memory_saving: bool = True
    use_inverse: bool = True
    first_layer_channels: int = 16
    down_blocks: Tuple[int] = (1, 2, 3, 2)
    up_blocks: Tuple[int] = (2, 2, 1, 1)
    is_separable: bool = False
    # One flag per down block.
    enable_attention_block: Tuple[bool] = (False, False, True, True)


class SelfAttentionVnet3D(VnetGenerator):
    spatial_dims: int = 3
    enable_attention_block: Tuple[bool, ...] = (True, True, True, True)
