"""Second-level attribution for the CycleGAN G forward (real network).

Slope-times the REAL Resnet2D apply under configurations that isolate one
suspect each:
  1. as shipped (instance norm)
  2. norm_type='none'           -> norm cost in situ
  3. dilated vs polyphase ConvTranspose at the up shapes
  4. reflect-pad k7 stem conv vs zero-pad
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.generators import Resnet2D

B = 16


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32)[..., :1, :1])))


def slope(build, n1=1, n2=3, reps=3):
    f1, a1 = build(n1)
    f2, a2 = build(n2)
    fence(f1(*a1)); fence(f2(*a2))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f1(*a1)
    fence(o)
    t1 = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f2(*a2)
    fence(o)
    t2 = (time.perf_counter() - t0) / reps
    return (t2 - t1) / (n2 - n1)


def bench_resnet(name, **kw):
    model = Resnet2D(in_channels=3, out_channels=3, n_residual_blocks=9, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    p = jax.jit(model.init)(jax.random.key(0), x)["params"]
    p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16)
                               if jnp.issubdtype(a.dtype, jnp.floating)
                               else a, p)

    def build(n):
        @jax.jit
        def f(p, x):
            h = x
            for i in range(n):
                pj = jax.tree_util.tree_map(
                    lambda v: v + jnp.asarray(i * 1e-6, v.dtype), p)
                h = model.apply({"params": pj}, h)
            return h
        return f, (p, x)

    t = slope(build)
    print(f"  {name:46s} {t*1e3:7.2f} ms", flush=True)
    return t


def bench_transpose(name, polyphase):
    from ganslate_tpu.nn.layers import ConvTranspose
    mod = ConvTranspose(64, (3, 3), strides=2, padding=1, output_padding=1,
                        polyphase=polyphase)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    p0 = jax.jit(mod.init)(jax.random.key(0), x)
    p0 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16)
                                if jnp.issubdtype(a.dtype, jnp.floating)
                                else a, p0)

    def build(n):
        @jax.jit
        def f(p, x):
            h = x
            for i in range(n):
                pj = jax.tree_util.tree_map(
                    lambda v: v + jnp.asarray(i * 1e-6, v.dtype), p)
                h = mod.apply(pj, h)[:, ::2, ::2, :]
                h = jnp.concatenate([h, h[..., :64]], -1)  # back to 128 ch
            return h
        return f, (p0, x)

    t = slope(build)
    fl = 2 * 9 * 128 * 64 * B * 256 * 256
    print(f"  {name:46s} {t*1e3:7.2f} ms ({fl/197e12/t:5.1%} of dilated-flop peak)",
          flush=True)


def main():
    print("Real Resnet2D G apply (batch 16 @256, slope-timed):", flush=True)
    t_in = bench_resnet("instance norm (as shipped)")
    t_no = bench_resnet("norm_type='none'", norm_type="none")
    print(f"  -> in-situ norm cost {1e3*(t_in-t_no):.2f} ms/apply", flush=True)
    bench_transpose("up transpose k3s2 dilated", polyphase=False)
    bench_transpose("up transpose k3s2 polyphase", polyphase=True)


if __name__ == "__main__":
    main()
