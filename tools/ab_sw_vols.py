"""Sweep the serving volume batch for the BRaTS sliding-window bench.

Round-1 note: 2 volumes/call beat 1 by +15%; 3 exceeded v5e HBM with fp32
predictions. The bf16-prediction blend halves the gather/stack bytes, so
re-probe 1/2/3/4. Measured in BOTH orders in one process (relay warm-up
reads the first timed config 10-25% slow — docs/benchmarks.md).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.nn.layers import precompute_s2d_kernels
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

ROI = (32, 176, 176)


def build():
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
    pc = {"params": params, "s2d_kernels": cache}

    def network(p, x):
        return model.apply(
            {"params": p["params"], "s2d_kernels": p["s2d_kernels"]},
            x.astype(jnp.bfloat16))

    return network, pc


def measure(network, pc, n_vols, repeats=3):
    inferer = SlidingWindowInferer(roi_size=ROI, sw_batch_size=28,
                                   overlap=0.25, mode="gaussian")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(
        -1, 1, (n_vols, 155, 240, 240, 1)).astype(np.float32))
    try:
        out = inferer(vol, network, pc)
        float(jax.device_get(out.ravel()[0]))
    except Exception as e:  # OOM etc.
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    start = time.perf_counter()
    for _ in range(repeats):
        out = inferer(vol, network, pc)
    float(jax.device_get(out.ravel()[0]))
    elapsed = time.perf_counter() - start
    return n_vols * repeats / elapsed, None


def main():
    network, pc = build()
    order = [1, 2, 3, 4]
    results = {}
    for sweep in (order, list(reversed(order))):
        for n in sweep:
            rate, err = measure(network, pc, n)
            if err:
                print(f"vols={n}: FAILED {err}")
                results.setdefault(n, []).append(None)
            else:
                print(f"vols={n}: {rate:.3f} vols/s")
                results.setdefault(n, []).append(rate)
    print("\nsummary (both orders):")
    for n, rates in sorted(results.items()):
        vals = [f"{r:.3f}" if r else "fail" for r in rates]
        print(f"  vols={n}: {' / '.join(vals)}")


if __name__ == "__main__":
    main()
