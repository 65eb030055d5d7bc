"""A/B the sliding-window bench forward with coupling-scan unrolling.

With SCAN_UNROLL=1 (default) each coupling is one lax.scan iteration: the
carry (the concat of the two halves) is materialized to HBM every block and
XLA cannot fuse norm/PReLU/add chains across blocks. Unrolling the short
sequences (2-3 blocks) lets XLA elide the lane-contiguous split/concat pairs
and fuse across blocks — pure HBM-traffic savings at identical FLOPs.

Usage: python tools/ab_sw_unroll.py [unroll ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn import invertible
from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

ROI = (32, 176, 176)
VOL = (2, 155, 240, 240, 1)


def run(unroll, repeats=3):
    invertible.SCAN_UNROLL = unroll
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

    t0 = time.perf_counter()
    out = inferer(vol, network, params)
    float(jax.device_get(out.ravel()[0]))
    compile_s = time.perf_counter() - t0

    start = time.perf_counter()
    for _ in range(repeats):
        out = inferer(vol, network, params)
    checksum = float(jax.device_get(jnp.sum(out[..., ::97, ::97, :])))
    elapsed = time.perf_counter() - start
    vps = VOL[0] * repeats / elapsed
    print(f"unroll={unroll}: {vps:.3f} vols/s ({elapsed / repeats / VOL[0] * 1e3:.0f} "
          f"ms/vol), compile {compile_s:.0f}s, checksum {checksum:.4f}", flush=True)
    return vps


if __name__ == "__main__":
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 3]
    for u in unrolls:
        run(u)
