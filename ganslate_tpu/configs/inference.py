"""Inference-mode config (reference parity: /root/reference/ganslate/configs/inference.py)."""

from dataclasses import dataclass, field
from typing import Optional

from ganslate_tpu.configs import base, validation_testing


@dataclass
class InferenceConfig(base.BaseEngineConfig):
    # Deployment mode: no loader/tracker; caller invokes Inferer.infer() directly.
    is_deployment: bool = False
    dataset: Optional[base.BaseDatasetConfig] = None
    sliding_window: Optional[validation_testing.SlidingWindowConfig] = None
    spatial_sharding: Optional[validation_testing.SpatialShardingConfig] = None
    checkpointing: base.CheckpointingConfig = field(default_factory=base.CheckpointingConfig)
