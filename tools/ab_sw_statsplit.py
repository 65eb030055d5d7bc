"""A/B the stat-epilogue split (ops.s2d_space.STAT_SPLIT) on the 28-window
BRaTS sliding-window forward. Fused conv+stat tuple fusions force a
full-activation layout copy before the next conv (~74 ms/call traced);
splitting trades that round-trip for one extra activation read."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(tag, split, repeats=5):
    import jax
    import jax.numpy as jnp

    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.nn.layers import precompute_s2d_kernels
    from ganslate_tpu.ops import s2d_space
    from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

    s2d_space.STAT_SPLIT = split
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
    cache = precompute_s2d_kernels(model, params,
                                   jnp.zeros((1, *roi, 1), jnp.bfloat16))
    pc = {"params": params, "s2d_kernels": cache}

    def network(p, x):
        return model.apply(
            {"params": p["params"], "s2d_kernels": p["s2d_kernels"]},
            x.astype(jnp.bfloat16))

    inferer = SlidingWindowInferer(roi_size=roi, sw_batch_size=28,
                                   overlap=0.25, mode="gaussian")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(-1, 1,
                                  (2, 155, 240, 240, 1)).astype(np.float32))
    out = inferer(vol, network, pc)
    v0 = float(jax.device_get(out.ravel()[123456]))
    out = inferer(vol, network, pc)
    float(jax.device_get(out.ravel()[0]))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = inferer(vol, network, pc)
        float(jax.device_get(out.ravel()[0]))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"{tag}: {2 / dt:.3f} vols/s ({dt * 1e3:.1f} ms/call) "
          f"probe={v0:.6f}", flush=True)


if __name__ == "__main__":
    run("fused #1", False)
    run("split #2", True)
    run("split #3", True)
    run("fused #4", False)
