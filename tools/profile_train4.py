"""Pin the ~46%-of-peak plateau of the real CycleGAN G forward.

Chains at the res-block workhorse shape (batch 16, 64x64, 256ch, k3):
  1. bare conv                      (97.5% measured earlier)
  2. conv + bias
  3. conv + bias + relu
  4. full res block: conv+bias+relu+conv+bias + skip add
  5. full res block + XLA instance norms (the shipped structure)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.ops import instance_norm as in_mod

B = 16
S = 64
C = 256


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32)[..., :1, :1])))


def slope(build, n1=4, n2=24, reps=6):
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


def conv(h, k, b=None):
    dn = jax.lax.conv_dimension_numbers(h.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(h, k, (1, 1), [(1, 1)] * 2,
                                     dimension_numbers=dn)
    return y if b is None else y + b


def run(name, step_fn, convs_per_step):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        ks = [(jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32)
                           ).astype(jnp.bfloat16),
               jnp.asarray(rng.normal(size=(C,)).astype(np.float32)
                           ).astype(jnp.bfloat16),
               jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32)
                           ).astype(jnp.bfloat16),
               jnp.asarray(rng.normal(size=(C,)).astype(np.float32)
                           ).astype(jnp.bfloat16))
              for _ in range(n)]

        @jax.jit
        def f(x, *ks):
            h = x
            for kk in ks:
                h = step_fn(h, *kk)
            return h
        return f, (x, *ks)

    t = slope(build)
    fl = 2 * 9 * C * C * B * S * S * convs_per_step
    print(f"  {name:48s} {t*1e3:7.2f} ms  ({fl/197e12/t:5.1%} peak)",
          flush=True)


def main():
    print(f"res-block anatomy (batch {B}, {S}x{S}x{C}, slope-timed):",
          flush=True)
    run("bare conv", lambda h, k1, b1, k2, b2: conv(h, k1), 1)
    run("conv + bias", lambda h, k1, b1, k2, b2: conv(h, k1, b1), 1)
    run("conv + bias + relu",
        lambda h, k1, b1, k2, b2: jax.nn.relu(conv(h, k1, b1)), 1)
    run("res block (2x conv+bias, relu, skip)",
        lambda h, k1, b1, k2, b2: h + conv(jax.nn.relu(conv(h, k1, b1)),
                                           k2, b2), 2)

    def norm(h):
        return in_mod._xla_forward(h, 1e-5, "none", 0.2)[0]

    run("res block + XLA instnorms (shipped form)",
        lambda h, k1, b1, k2, b2: h + norm(conv(jax.nn.relu(
            norm(conv(h, k1, b1))), k2, b2)), 2)


if __name__ == "__main__":
    main()
