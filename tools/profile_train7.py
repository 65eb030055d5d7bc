"""Pin the bandwidth wall behind the G boundary layers.

profile_train6: folded boundary islands run no faster than plain (~10% of
plain-flop peak) — so the @256^2 layers are HBM-bound, not MXU-lane-bound.
This measures (slope-timed):
  1. streaming bandwidth: y = x * a + 1 on the stem-activation tensor
  2. instance norm + relu on the same tensor (stat pass + normalize pass)
  3. each boundary conv ALONE (no norm), plain vs folded
so the per-op effective GB/s can be read off and compared to the copy peak.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu.nn.layers import Conv, ConvTranspose
from ganslate_tpu.ops.s2d_space import decode, encode
from ganslate_tpu.ops import instance_norm as in_mod

B = 16


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32)[..., :1, :1])))


def slope(build, n1=4, n2=16, reps=6):
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


def chain(name, step, shape, traffic_gb, flops=0.0):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, *shape)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        @jax.jit
        def f(x):
            h = x
            for i in range(n):
                h = step(h, i)
            return h
        return f, (x,)

    t = slope(build)
    msg = f"  {name:44s} {t*1e3:7.2f} ms  {traffic_gb*1e3:6.0f} MB -> {traffic_gb/t:6.0f} GB/s"
    if flops:
        msg += f"  ({flops/197e12/t:5.1%} peak)"
    print(msg, flush=True)
    return t


def conv_stage(name, mod, in_shape, flops, post):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, *in_shape)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    p0 = jax.jit(mod.init)(jax.random.key(0), x)
    p0 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, p0)

    def build(n):
        @jax.jit
        def f(p, x):
            h = x
            for i in range(n):
                pj = jax.tree_util.tree_map(
                    lambda v: v + jnp.asarray(i * 1e-6, v.dtype), p)
                h = post(mod.apply(pj, h))
            return h
        return f, (p0, x)

    t = slope(build)
    print(f"  {name:44s} {t*1e3:7.2f} ms  ({flops/197e12/t:5.1%} peak)",
          flush=True)


class StemPlain(nn.Module):
    @nn.compact
    def __call__(self, x):
        return Conv(64, (7, 7), padding=3, use_bias=True, name="c")(x)


class StemS2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = encode(x, 2)
        h = Conv(64, (7, 7), padding=3, use_bias=True, s2d_space=2,
                 name="c")(h)
        return decode(h, 64, 2)


class FinalPlain(nn.Module):
    @nn.compact
    def __call__(self, x):
        return Conv(3, (7, 7), padding=3, use_bias=True, name="c")(x)


class FinalS2d(nn.Module):
    r: int = 2

    @nn.compact
    def __call__(self, x):
        h = encode(x, self.r)
        h = Conv(3, (7, 7), padding=3, use_bias=True, s2d_space=self.r,
                 name="c")(h)
        return decode(h, 3, self.r)


class UpPlain(nn.Module):
    @nn.compact
    def __call__(self, x):
        return ConvTranspose(64, (3, 3), strides=2, padding=1,
                             output_padding=1, name="c")(x)


class UpS2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = encode(x, 2)
        h = ConvTranspose(64, (3, 3), strides=2, padding=1, output_padding=1,
                          s2d_space=2, name="c")(h)
        return decode(h, 64, 2)


def main():
    gb = 1e-9
    big = (256, 256, 64)          # 134 MB bf16 stem activation
    nbytes = B * 256 * 256 * 64 * 2

    print(f"bandwidth wall (batch {B}, slope-timed):", flush=True)
    chain("axpy on stem act (read+write)",
          lambda h, i: h * jnp.bfloat16(1.0 + i * 1e-6) + jnp.bfloat16(1e-6),
          big, 2 * nbytes * gb)
    chain("instance norm + relu on stem act",
          lambda h, i: jax.nn.relu(
              in_mod._xla_forward(h, 1e-5 + i * 1e-9, "none", 0.2)[0]),
          big, 3 * nbytes * gb)

    print("boundary convs alone (no norms):", flush=True)
    conv_stage("stem conv7 3->64 plain", StemPlain(), (256, 256, 3),
               2 * 49 * 3 * 64 * B * 256 * 256,
               post=lambda h: h[..., :3])
    conv_stage("stem conv7 3->64 s2d r2 (enc+dec)", StemS2d(), (256, 256, 3),
               2 * 49 * 3 * 64 * B * 256 * 256,
               post=lambda h: h[..., :3])
    conv_stage("final conv7 64->3 plain", FinalPlain(), (256, 256, 64),
               2 * 49 * 64 * 3 * B * 256 * 256,
               post=lambda h: jnp.tile(h, (1, 1, 1, 22))[..., :64])
    conv_stage("final conv7 64->3 s2d r2 (enc+dec)", FinalS2d(2),
               (256, 256, 64), 2 * 49 * 64 * 3 * B * 256 * 256,
               post=lambda h: jnp.tile(h, (1, 1, 1, 22))[..., :64])
    conv_stage("final conv7 64->3 s2d r4 (enc+dec)", FinalS2d(4),
               (256, 256, 64), 2 * 49 * 64 * 3 * B * 256 * 256,
               post=lambda h: jnp.tile(h, (1, 1, 1, 22))[..., :64])
    conv_stage("up1 k3s2^T 128->64 plain", UpPlain(), (128, 128, 128),
               2 * 9 * 128 * 64 * B * 256 * 256,
               post=lambda h: jnp.tile(h[:, ::2, ::2, :], (1, 1, 1, 2)))
    conv_stage("up1 k3s2^T 128->64 s2d r2 (enc+dec)", UpS2d(),
               (128, 128, 128), 2 * 9 * 128 * 64 * B * 256 * 256,
               post=lambda h: jnp.tile(h[:, ::2, ::2, :], (1, 1, 1, 2)))


if __name__ == "__main__":
    main()
