"""A/B batch-fold (ops/batch_fold.py) in the SW bench, post scan-unroll.

The fold regressed at 1.679 vols/s with unroll=1 partly because the
per-iteration pad/reshape broke the scan-body fusion; the coupling scans are
now fully unrolled (invertible.PLAIN_UNROLL_FULL), so re-measure.

Usage: python tools/ab_sw_fold.py [max_cells ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.ops import batch_fold
from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

ROI = (32, 176, 176)
VOL = (2, 155, 240, 240, 1)


def run(max_cells, repeats=3):
    batch_fold.FOLD_MAX_CELLS = max_cells
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
    vps = VOL[0] * repeats / elapsed
    print(f"fold_max_cells={max_cells}: {vps:.3f} vols/s "
          f"({elapsed / repeats / VOL[0] * 1e3:.0f} ms/vol), checksum {checksum:.4f}",
          flush=True)
    return vps


if __name__ == "__main__":
    cells = [int(a) for a in sys.argv[1:]] or [0, 2000]
    for c in cells:
        run(c)
