"""Interleaved A/B of BIAS_INERT (and the kernel cache) on the sliding-
window serving call: r2 traced 740.6 ms device per 2-volume call; r3
traces 822 ms with ~52 ms more layout copies. The V-Net conv biases
feeding instance norms are skipped since BIAS_INERT — check whether that
moved the conv+stat fusion boundaries."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(bias_inert):
    import jax
    import jax.numpy as jnp
    from ganslate_tpu.nn import layers
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.nn.layers import precompute_s2d_kernels
    from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

    layers.BIAS_INERT = bias_inert
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
    vol = jnp.asarray(rng.uniform(-1, 1, (2, 155, 240, 240, 1))
                      .astype(np.float32))
    out = inferer(vol, network, pc)
    float(jax.device_get(out.ravel()[0]))
    layers.BIAS_INERT = True
    return inferer, network, pc, vol


def main(rounds=5):
    import jax

    variants = [("inert  ", build(True)), ("bias-on", build(False))]
    times = {tag: [] for tag, _ in variants}
    for r in range(rounds):
        for tag, (inferer, network, pc, vol) in variants:
            t0 = time.perf_counter()
            out = inferer(vol, network, pc)
            float(jax.device_get(out.ravel()[0]))
            times[tag].append(time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{tag.strip()}={2 / times[tag][-1]:.2f}v/s" for tag, _ in variants),
            flush=True)
    for tag, _ in variants:
        dt = float(np.median(times[tag]))
        print(f"{tag}: {2 / dt:.3f} vols/s ({dt * 1e3:.0f} ms/call)",
              flush=True)


if __name__ == "__main__":
    main()
