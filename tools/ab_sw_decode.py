"""A/B the s2d `decode` lowering (polyphase depth-to-space vs lhs-dilated
one-hot transposed conv) inside the sliding-window bench. Both orders in one
process to cancel the relay warm-up artifact (docs/benchmarks.md)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.ops import s2d_space
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

ROI = (32, 176, 176)
VOL = (2, 155, 240, 240, 1)


def run(tag, dilated, repeats=3):
    s2d_space.DECODE_DILATED = dilated
    model = Vnet3D(in_channels=1, out_channels=1,
                   down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
                   use_memory_saving=False, use_inverse=False,
                   use_s2d_exec=True)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, *ROI, 1), jnp.bfloat16))["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    def network(p, x):
        return model.apply({"params": p}, x.astype(jnp.bfloat16)).astype(jnp.float32)

    inferer = SlidingWindowInferer(roi_size=ROI, sw_batch_size=28,
                                   overlap=0.25, mode="gaussian")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(-1, 1, VOL).astype(np.float32))
    out = inferer(vol, network, params)
    float(jax.device_get(out.ravel()[0]))
    start = time.perf_counter()
    for _ in range(repeats):
        out = inferer(vol, network, params)
    checksum = float(jax.device_get(jnp.sum(out[..., ::97, ::97, :])))
    elapsed = time.perf_counter() - start
    print(f"{tag}: {VOL[0] * repeats / elapsed:.3f} vols/s "
          f"({elapsed / repeats / VOL[0] * 1e3:.0f} ms/vol) "
          f"checksum {checksum:.4f}", flush=True)


if __name__ == "__main__":
    run("polyphase#1", False)
    run("dilated  #2", True)
    run("dilated  #3", True)
    run("polyphase#4", False)
