"""Pallas TPU kernels for hot memory-bound ops.

Import submodules explicitly (e.g. `from ganslate_tpu.ops.instance_norm
import instance_norm`) — the package does not re-export functions to avoid
shadowing module names.
"""
