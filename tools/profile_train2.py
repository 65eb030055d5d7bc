"""Why is the CycleGAN G forward at 44% MFU? Slope-time the pieces at bench
shapes (batch 16, Resnet2D-9 @256):
  1. bare k3 256ch conv @64x64          (the res-block workhorse)
  2. conv + Pallas instance_norm + relu (the res-block body as shipped)
  3. conv + XLA instance_norm + relu    (fallback norm path)
  4. Pallas instance_norm alone
  5. k7 reflect-pad conv 3->64 @256x256 (c7s1 stem)
  6. dilated transpose conv 128->64 @128->256 (up path, 2D default)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.ops import instance_norm as in_mod

B = 16


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32)[..., :1, :1])))


def slope(build, n1=2, n2=6, reps=3):
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


def conv_chain(name, spatial, cin, cout, k, pad, body=None, flops_mult=1):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, *spatial, cin)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        ks = [jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32)
                          ).astype(jnp.bfloat16) for _ in range(n)]

        @jax.jit
        def f(x, *ks):
            h = x
            for kk in ks:
                dn = jax.lax.conv_dimension_numbers(
                    h.shape, kk.shape, ("NHWC", "HWIO", "NHWC"))
                h = jax.lax.conv_general_dilated(
                    h, kk, (1, 1), [(pad, pad)] * 2, dimension_numbers=dn)
                if body is not None:
                    h = body(h)
                h = h[..., :cin] if cout != cin else h
            return h
        return f, (x, *ks)

    t = slope(build)
    fl = 2 * k * k * cin * cout * B * int(np.prod(spatial)) * flops_mult
    print(f"  {name:44s} {t*1e3:7.2f} ms  ({fl/197e12/t:5.1%} peak)",
          flush=True)
    return t


def main():
    print("CycleGAN G-forward pieces (slope-timed):", flush=True)
    conv_chain("bare k3 256ch @64x64", (64, 64), 256, 256, 3, 1)
    conv_chain("k3 + Pallas instnorm + relu @64x64", (64, 64), 256, 256, 3, 1,
               body=lambda h: jax.nn.relu(in_mod.instance_norm(h)))
    conv_chain("k3 + XLA instnorm + relu @64x64", (64, 64), 256, 256, 3, 1,
               body=lambda h: jax.nn.relu(
                   in_mod._xla_forward(h, 1e-5, "none", 0.2)[0]))

    # norm alone
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 64, 64, 256)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build_norm(n):
        @jax.jit
        def f(x):
            h = x
            for i in range(n):
                h = in_mod.instance_norm(h + jnp.bfloat16(i * 1e-3))
            return h
        return f, (x,)

    t = slope(build_norm)
    gb = B * 64 * 64 * 256 * 2 * 2 / 1e9
    print(f"  {'Pallas instnorm alone @64x64x256':44s} {t*1e3:7.2f} ms  "
          f"(min-io {gb:4.2f} GB -> {gb/t:4.0f} GB/s)", flush=True)

    conv_chain("k7 3->64 @256x256 (stem, zero-pad proxy)", (256, 256), 64, 64,
               7, 3)
    conv_chain("k3 64ch @256x256 (level-0 class)", (256, 256), 64, 64, 3, 1)
    conv_chain("k3 128ch @128x128 (level-1 class)", (128, 128), 128, 128, 3, 1)


if __name__ == "__main__":
    main()
