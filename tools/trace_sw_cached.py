"""Trace the sliding-window forward with the s2d kernel cache supplied."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.nn.layers import precompute_s2d_kernels
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer
from tools.trace_step import dump_op_stats

roi = (32, 176, 176)
model = Vnet3D(in_channels=1, out_channels=1,
               down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
               use_memory_saving=False, use_inverse=False,
               use_s2d_exec=True)
params = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, *roi, 1), jnp.bfloat16))["params"]
params = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16)
    if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
cache = precompute_s2d_kernels(model, params, jnp.zeros((1, *roi, 1), jnp.bfloat16))

def network(p, x):
    # bf16 predictions end-to-end — MUST match bench.py's network exactly
    # (an .astype(float32) here doubles the gather/blend bytes and inflates
    # the copy category ~70 ms/call).
    return model.apply({"params": p["params"], "s2d_kernels": p["s2d_kernels"]},
                       x.astype(jnp.bfloat16))

pc = {"params": params, "s2d_kernels": cache}
inferer = SlidingWindowInferer(roi_size=roi, sw_batch_size=28,
                               overlap=0.25, mode="gaussian")
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.uniform(-1, 1, (2, 155, 240, 240, 1)).astype(np.float32))
out = inferer(vol, network, pc)
float(jax.device_get(out.ravel()[0]))
trace_dir = f"/tmp/trace_swc_{int(time.time())}"
jax.profiler.start_trace(trace_dir)
out = inferer(vol, network, pc)
float(jax.device_get(out.ravel()[0]))
jax.profiler.stop_trace()
print("trace:", trace_dir)
