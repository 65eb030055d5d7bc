"""Where does the 596 ms/volume of sliding-window V-Net inference go?

Breaks the bench (bench.py:bench_vnet3d_sliding_window) into:
  1. end-to-end inferer call
  2. the batch-28 window forward alone
  3. the inferer with an identity network (gather + scatter + blend cost)
  4. per-stage V-Net timings (standalone stage modules at bench shapes)

Timing: ops here are 10-600 ms, so naive timing with a device_get fence is
within a few % (the relay's ~2-10 ms dispatch overhead only matters for
microbenchmarks; see docs/benchmarks.md for the slope method used there).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.generators import Vnet3D
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

ROI = (32, 176, 176)
VOL = (1, 155, 240, 240, 1)
SWB = 28


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    fence(out if not isinstance(out, (tuple, list)) else out[0])
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    fence(out if not isinstance(out, (tuple, list)) else out[0])
    return (time.perf_counter() - t0) / repeats


def main():
    rng = np.random.default_rng(0)

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

    vol = jnp.asarray(rng.uniform(-1, 1, VOL).astype(np.float32))

    # 1. end to end
    inferer = SlidingWindowInferer(roi_size=ROI, sw_batch_size=SWB,
                                   overlap=0.25, mode="gaussian")
    t_e2e = timeit(lambda v: inferer(v, network, params), vol)
    print(f"end-to-end inferer:        {t_e2e*1e3:8.1f} ms/vol")

    # 2. forward alone, batch 28
    x28 = jnp.asarray(rng.uniform(-1, 1, (SWB, *ROI, 1)).astype(np.float32))
    fwd = jax.jit(network)
    t_fwd = timeit(lambda x: fwd(params, x), x28)
    print(f"batch-28 window forward:   {t_fwd*1e3:8.1f} ms")
    cost = fwd.lower(params, x28).compile().cost_analysis()
    fl = cost.get("flops", 0) / 1e12
    gb = cost.get("bytes accessed", 0) / 1e9
    print(f"  XLA: {fl:.1f} TFLOP -> {fl/197*1e3/t_fwd*1e-0:6.3f}"
          f" (frac of 197 TF/s peak = {fl/1e0/197/t_fwd:.3f});"
          f" {gb:.1f} GB -> {gb/t_fwd:.0f} GB/s apparent")

    # 3. identity network (pure gather/scatter/blend overhead)
    ident = SlidingWindowInferer(roi_size=ROI, sw_batch_size=SWB,
                                 overlap=0.25, mode="gaussian")
    identity_net = lambda x: x  # hoisted: the inferer caches on id(network)
    t_id = timeit(lambda v: ident(v, identity_net, None), vol)
    print(f"identity-network inferer:  {t_id*1e3:8.1f} ms/vol (gather+blend)")

    # 4. per-stage standalone modules at bench shapes (s2d space, r=2).
    from ganslate_tpu.nn.generators.vnet.vnet import (
        InputBlock, DownBlock, UpBlock, OutBlock)
    from ganslate_tpu.nn.layers import make_initializer
    from ganslate_tpu.ops.s2d_space import encode, decode

    init = make_initializer("normal", 0.02)
    flc = 16
    stages = []

    def add(name, mod, xshape, n_args=1):
        p = jax.jit(mod.init)(jax.random.key(0),
                              *[jnp.zeros(s, jnp.bfloat16) for s in
                                (xshape if n_args > 1 else [xshape])])
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
        xs = [jnp.asarray(rng.uniform(-1, 1, s).astype(np.float32)
                          ).astype(jnp.bfloat16)
              for s in (xshape if n_args > 1 else [xshape])]
        f = jax.jit(lambda p, *x: mod.apply(p, *x))
        t = timeit(lambda: f(p, *xs))
        c = f.lower(p, *xs).compile().cost_analysis()
        stages.append((name, t, c.get("flops", 0) / 1e12,
                       c.get("bytes accessed", 0) / 1e9))

    args = ("instance", 3, False, init)
    # Exact stage replicas: same constructors as VnetGenerator.setup with
    # s2d=2 — true channel counts, s2d-space inputs (lanes = C_true * 8).
    g = (SWB, 16, 88, 88)      # s2d grid of the (32,176,176) window
    g1 = (SWB, 8, 44, 44)
    g2 = (SWB, 4, 22, 22)
    g3 = (SWB, 2, 11, 11)
    add("encode+in_block (1->16 lanes128)",
        InputBlock(1, 16, *args, s2d=2), (*g, 8))
    add("down0 (16->32 @g1, 2c)",
        DownBlock(16, 2, "instance", 3, False, False, False, init, s2d=2),
        (*g, 128))
    add("down1 (32->64 @g2, 2c)",
        DownBlock(32, 2, "instance", 3, False, False, False, init, s2d=2),
        (*g1, 256))
    add("down2 (64->128 @g3, 3c)",
        DownBlock(64, 3, "instance", 3, False, False, False, init, s2d=2),
        (*g2, 512))
    add("up0  (128->128 @g2, 3c)",
        UpBlock(128, 128, 3, "instance", 3, False, False, False, init, s2d=2),
        [(*g3, 1024), (*g2, 512)], n_args=2)
    add("up1  (128->64 @g1, 3c)",
        UpBlock(128, 64, 3, "instance", 3, False, False, False, init, s2d=2),
        [(*g2, 1024), (*g1, 256)], n_args=2)
    add("up2  (64->32 @g, 3c)",
        UpBlock(64, 32, 3, "instance", 3, False, False, False, init, s2d=2),
        [(*g1, 512), (*g, 128)], n_args=2)
    add("out_block (32->1 @g)",
        OutBlock(32, 1, *args, s2d=2), (*g, 256))

    tot = 0.0
    print("\nper-stage (proxy modules at s2d shapes):")
    for name, t, fl, gb in stages:
        tot += t
        print(f"  {name:34s} {t*1e3:7.1f} ms  {fl:5.2f} TF "
              f"({fl/197/t:4.1%} peak)  {gb:5.1f} GB ({gb/t:4.0f} GB/s)")
    print(f"  {'SUM':34s} {tot*1e3:7.1f} ms   (fwd measured {t_fwd*1e3:.1f})")


if __name__ == "__main__":
    main()
