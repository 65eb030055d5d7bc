"""A/B controls for the sliding-window bench:
  1. fold OFF (round-1 configuration) — regression control
  2. fold OFF + two volumes per call (window batch 56 through every conv)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.ops import batch_fold as bf
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

ROI = (32, 176, 176)


def run(n_vols, fold_cells):
    bf.FOLD_MAX_CELLS = fold_cells
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
    vol = jnp.asarray(rng.uniform(-1, 1, (n_vols, 155, 240, 240, 1))
                      .astype(np.float32))
    out = inferer(vol, network, params)
    float(jax.device_get(out.ravel()[0]))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = inferer(vol, network, params)
    float(jax.device_get(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"n_vols={n_vols} fold_cells={fold_cells}: "
          f"{n_vols / dt:.3f} vols/s ({dt*1e3:.0f} ms/call)", flush=True)


if __name__ == "__main__":
    run(3, 0)
    run(4, 0)
