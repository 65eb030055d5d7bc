"""Hybrid-level feasibility: plain-exec (un-folded) conv rates at the DEEP
V-Net levels, where true channels are already >= 64 and the s2d lanes-win no
longer applies but its 1.73x FLOP inflation still costs. Slope-timed.

Levels at bench geometry (window 32x176x176, batch 28):
  L2: (8,44,44) C=64   — s2d equivalent ran at 27.7% peak w/ 1.73x flops
  L3: (4,22,22) C=128  — s2d equivalent ran at  4.8% peak w/ 1.73x flops
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

SWB = 28


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32)[..., :1, :1])))


def slope(build, n1=2, n2=6):
    f1, a1 = build(n1)
    f2, a2 = build(n2)
    fence(f1(*a1)); fence(f2(*a2))
    reps = 3
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


def conv_plain(name, spatial, c, k=5, pad=2):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(SWB, *spatial, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        ks = [jnp.asarray(rng.normal(size=(k, k, k, c, c)).astype(np.float32)
                          ).astype(jnp.bfloat16) for _ in range(n)]

        @jax.jit
        def f(x, *ks):
            h = x
            dnums = None
            for kk in ks:
                dn = jax.lax.conv_dimension_numbers(
                    h.shape, kk.shape, ("NDHWC", "DHWIO", "NDHWC"))
                h = jax.lax.conv_general_dilated(
                    h, kk, (1, 1, 1), [(pad, pad)] * 3, dimension_numbers=dn)
            return h
        return f, (x, *ks)

    t = slope(build)
    fl = 2 * k ** 3 * c * c * SWB * int(np.prod(spatial))
    print(f"  plain k{k} {name:26s} {t*1e3:7.2f} ms  {fl/1e12:5.2f} TF "
          f"({fl/197e12/t:5.1%} peak)")


def main():
    print("plain-exec deep-level convs (slope-timed):")
    conv_plain("L2 C=64  @(8,44,44)", (8, 44, 44), 64)
    conv_plain("L3 C=128 @(4,22,22)", (4, 22, 22), 128)
    conv_plain("L2 C=64  k3 @(8,44,44)", (8, 44, 44), 64, k=3, pad=1)
    conv_plain("L3 C=128 k3 @(4,22,22)", (4, 22, 22), 128, k=3, pad=1)


if __name__ == "__main__":
    main()
