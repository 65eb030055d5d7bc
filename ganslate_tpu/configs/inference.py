"""Inference-mode config (reference parity: /root/reference/ganslate/configs/inference.py)."""

from dataclasses import dataclass, field
from typing import Optional

from ganslate_tpu.configs import base, validation_testing


@dataclass
class InferenceConfig(base.BaseEngineConfig):
    # Deployment mode: no loader/tracker; caller invokes Inferer.infer() directly.
    is_deployment: bool = False
    # Wire dtype for host<->device volume transfers in serving. The network
    # computes in bf16 anyway, so shipping inputs/predictions as bf16 halves
    # the transfer bytes (the measured e2e path is transport-bound:
    # docs/benchmarks.md) and the input rounding is bit-identical to the
    # in-network cast; the blended prediction loses only sub-bf16 bits.
    # Non-deployment runs upcast to fp32 on the host before saving/metrics.
    # Set "float32" for full-precision transfers.
    wire_dtype: str = "bfloat16"
    dataset: Optional[base.BaseDatasetConfig] = None
    sliding_window: Optional[validation_testing.SlidingWindowConfig] = None
    spatial_sharding: Optional[validation_testing.SpatialShardingConfig] = None
    checkpointing: base.CheckpointingConfig = field(default_factory=base.CheckpointingConfig)
