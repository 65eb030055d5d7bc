"""A/B ops/transpose_grad.py on the 3D s2d V-Net TRAINING gradient (the
BRaTS-patch generator objective): the s2d up convs are lhs-dilated, so
XLA's kernel grads reverse full cell-grid tensors there too. Interleaved
rounds (relay drift cancels)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(custom):
    import jax
    import jax.numpy as jnp
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.ops import transpose_grad as tg

    tg.TRANSPOSE_CUSTOM_GRAD = custom
    model = Vnet3D(in_channels=1, out_channels=1,
                   down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
                   use_memory_saving=True, use_inverse=False,
                   use_s2d_exec=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 32, 176, 176, 1)).astype(np.float32)).astype(jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    @jax.jit
    def step(p, v):
        def loss(pp):
            y = model.apply({"params": pp}, v)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))
        l, g = jax.value_and_grad(loss)(p)
        return l, g

    l, g = step(params, x)
    float(jax.device_get(l))
    tg.TRANSPOSE_CUSTOM_GRAD = True
    return step, params, x


def main(rounds=5, iters=3):
    import jax

    variants = [("custom", build(True)), ("xla   ", build(False))]
    times = {tag: [] for tag, _ in variants}
    for r in range(rounds):
        for tag, (step, params, x) in variants:
            t0 = time.perf_counter()
            for _ in range(iters):
                l, _ = step(params, x)
            float(jax.device_get(l))
            times[tag].append((time.perf_counter() - t0) / iters)
        print(f"round {r}: " + "  ".join(
            f"{tag.strip()}={times[tag][-1] * 1e3:.0f}ms" for tag, _ in variants),
            flush=True)
    for tag, _ in variants:
        dt = float(np.median(times[tag]))
        print(f"{tag}: {dt * 1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
