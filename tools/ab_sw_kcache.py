"""A/B the s2d kernel-transform cache (serving-time weight preprocessing)
in the sliding-window bench. Runs uncached/cached/cached/uncached to cancel
the relay's position warm-up artifact (see docs/benchmarks.md)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.nn.layers import precompute_s2d_kernels
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

ROI = (32, 176, 176)
VOL = (2, 155, 240, 240, 1)


def main(repeats=3):
    model = Vnet3D(in_channels=1, out_channels=1,
                   down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
                   use_memory_saving=False, use_inverse=False,
                   use_s2d_exec=True)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, *ROI, 1), jnp.bfloat16))["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    cache = precompute_s2d_kernels(model, params,
                                   jnp.zeros((1, *ROI, 1), jnp.bfloat16))

    def net_plain(p, x):
        return model.apply({"params": p}, x.astype(jnp.bfloat16)).astype(jnp.float32)

    def net_cached(p, x):
        return model.apply({"params": p["params"], "s2d_kernels": p["s2d_kernels"]},
                           x.astype(jnp.bfloat16)).astype(jnp.float32)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(-1, 1, VOL).astype(np.float32))
    inferer = SlidingWindowInferer(roi_size=ROI, sw_batch_size=28,
                                   overlap=0.25, mode="gaussian")

    def run(tag, network, p):
        out = inferer(vol, network, p)
        float(jax.device_get(out.ravel()[0]))
        start = time.perf_counter()
        for _ in range(repeats):
            out = inferer(vol, network, p)
        checksum = float(jax.device_get(jnp.sum(out[..., ::97, ::97, :])))
        elapsed = time.perf_counter() - start
        print(f"{tag}: {VOL[0] * repeats / elapsed:.3f} vols/s "
              f"({elapsed / repeats / VOL[0] * 1e3:.0f} ms/vol) "
              f"checksum {checksum:.4f}", flush=True)

    pc = {"params": params, "s2d_kernels": cache}
    run("uncached#1", net_plain, params)
    run("cached  #2", net_cached, pc)
    run("cached  #3", net_cached, pc)
    run("uncached#4", net_plain, params)


if __name__ == "__main__":
    main()
