"""Training-mode config (reference parity: /root/reference/ganslate/configs/training.py)."""

from dataclasses import dataclass, field
from typing import Optional

from ganslate_tpu.configs import base
from ganslate_tpu.configs.omega import MISSING


@dataclass
class TrainMetricsConfig:
    # Log mean discriminator outputs on real/fake (D evolution).
    discriminator_evolution: bool = False
    # Log cycle-consistency SSIM during training.
    ssim: bool = False


@dataclass
class TrainCheckpointingConfig(base.CheckpointingConfig):
    # How often (in iters) to save checkpoints during training.
    freq: int = 2000
    # After which iteration checkpointing begins.
    start_after: int = 0
    # If False, saved optimizer state is not loaded when continuing training.
    load_optimizers: bool = True
    # Iteration number of the checkpoint to load for continuing training.
    load_iter: Optional[int] = None


@dataclass
class PerfConfig:
    """Optional overrides for the framework perf flags (ganslate_tpu/flags.py
    has the defaults, measured deltas, and scoping rules). Fields left at
    None keep the framework default; `build_gan` applies the section via
    `flags.apply_config` before tracing the train step, so YAMLs pin only
    what they care about (e.g. `train.perf.bias_inert: false`)."""
    bias_inert: Optional[bool] = None
    pad_custom_vjp: Optional[bool] = None
    pad_fwd_onepass: Optional[bool] = None
    polyphase_2d: Optional[bool] = None
    transpose_custom_grad: Optional[bool] = None
    fused_d_forward: Optional[bool] = None
    paired_apply: Optional[bool] = None
    scan_unroll: Optional[int] = None
    plain_unroll_full: Optional[bool] = None


@dataclass
class TrainConfig(base.BaseEngineConfig):
    # -------- overriding BaseEngineConfig defaults --------
    output_dir: str = MISSING
    batch_size: int = MISSING
    cuda: bool = True
    mixed_precision: bool = False
    opt_level: str = "O1"
    checkpointing: TrainCheckpointingConfig = field(default_factory=TrainCheckpointingConfig)
    logging: base.LoggingConfig = field(default_factory=base.LoggingConfig)
    # ------------------------------------------------------

    # Iterations at full learning rate.
    n_iters: int = MISSING
    # Final iterations over which learning rates decay linearly to zero.
    n_iters_decay: int = MISSING

    gan: base.BaseGANConfig = MISSING

    seed: Optional[int] = None
    metrics: TrainMetricsConfig = field(default_factory=TrainMetricsConfig)

    # Perf-flag overrides (see PerfConfig / ganslate_tpu/flags.py).
    perf: PerfConfig = field(default_factory=PerfConfig)

    # Multi-step dispatch (beyond-reference, TPU-native): run this many
    # train steps per device dispatch — the trainer stacks that many loader
    # batches and the fused step runs under one `lax.scan`, amortizing the
    # per-dispatch host/transport overhead (measured 2-10 ms/dispatch on
    # relay-backed PJRT; docs/benchmarks.md). Logging/checkpoint/validation
    # frequencies snap to chunk boundaries, so keep them multiples of this.
    # 1 = reference-identical per-iteration dispatch.
    steps_per_dispatch: int = 1

    # Spatially-sharded training (beyond-reference, SURVEY.md 5.7): reserve
    # this many mesh devices on a `spatial` axis and shard each sample's
    # FIRST spatial dim across them (the remaining devices form the `data`
    # axis). XLA/GSPMD inserts the conv halo exchanges and makes
    # normalization reductions global automatically — gradients are exact vs
    # unsharded (tests/test_spatial_sharding.py). Lets a full 240^3-class
    # volume train un-patched on a v5e-8.
    spatial_mesh: Optional[int] = None
