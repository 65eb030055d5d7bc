"""Boundary-island s2d A/B for the CycleGAN-256 G (batch 16, slope-timed).

profile_train5 attribution: stem c7s1-64 3.0 ms (3.3% peak), final c7s1-3
5.6 ms (1.8%, output-lane-bound 3/128), up1 2.3 ms (34%), down0 1.2 ms
(17%) — ~12 ms of a ~19 ms G forward in four boundary layers while the res
core runs at 85%+. The old ops/s2d_conv.py fast path lost in-context
because it materializes its relayout (XLA space_to_depth transposes move at
~10 GB/s here); the ops/s2d_space.py machinery relays out via one-hot convs
at MXU rate. This measures folded ISLANDS (encode -> folded layers ->
decode, transitions included) against their plain counterparts.

Zero padding on both sides of every A/B (the real stem/final use reflection
padding; padding mode does not change layout or FLOPs — reflect support in
cell space is a follow-up if the islands win).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu.nn.layers import Conv, ConvTranspose, NormAct
from ganslate_tpu.ops.s2d_space import decode, encode, group_instance_norm

B = 16


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32)[..., :1, :1])))


def slope(build, n1=4, n2=12, reps=6):
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


def stage(name, mod, in_shape, flops, post):
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
    print(f"  {name:46s} {t*1e3:7.2f} ms  ({flops/197e12/t:5.1%} of "
          f"plain-flop peak)", flush=True)


class EncPlain(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = Conv(64, (7, 7), padding=3, use_bias=True, name="stem")(x)
        h = NormAct("instance", "relu")(h)
        h = Conv(128, (3, 3), strides=2, padding=1, use_bias=True,
                 name="down0")(h)
        h = NormAct("instance", "relu")(h)
        return h


class EncS2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = encode(x, 2)
        h = Conv(64, (7, 7), padding=3, use_bias=True, s2d_space=2,
                 name="stem")(h)
        h = jax.nn.relu(group_instance_norm(h, 64, 4))
        h = Conv(128, (3, 3), strides=2, padding=1, use_bias=True,
                 s2d_space=2, name="down0")(h)
        h = jax.nn.relu(group_instance_norm(h, 128, 4))
        return decode(h, 128, 2)


class DecPlain(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = ConvTranspose(64, (3, 3), strides=2, padding=1, output_padding=1,
                          name="up1")(x)
        h = NormAct("instance", "relu")(h)
        h = Conv(3, (7, 7), padding=3, use_bias=True, name="final")(h)
        return jnp.tanh(h)


class DecS2d(nn.Module):
    r_final: int = 2

    @nn.compact
    def __call__(self, x):
        h = encode(x, 2)
        h = ConvTranspose(64, (3, 3), strides=2, padding=1, output_padding=1,
                          s2d_space=2, name="up1")(h)
        h = jax.nn.relu(group_instance_norm(h, 64, 4))
        if self.r_final == 4:
            # Nested r2-of-r2 phases are bit-interleaved, not r4 c-major —
            # go through the original space (both hops are one-hot convs).
            h = encode(decode(h, 64, 2), 4)
        h = Conv(3, (7, 7), padding=3, use_bias=True,
                 s2d_space=self.r_final, name="final")(h)
        h = decode(h, 3, self.r_final)
        return jnp.tanh(h)


def main():
    print(f"boundary islands (batch {B} @256, slope-timed):", flush=True)
    enc_fl = (2 * 49 * 3 * 64 * B * 256 * 256
              + 2 * 9 * 64 * 128 * B * 128 * 128)
    dec_fl = (2 * 9 * 128 * 64 * B * 256 * 256
              + 2 * 49 * 64 * 3 * B * 256 * 256)
    # Map island outputs back to island inputs so chains compose.
    post_enc = lambda h: h[..., :3].repeat(2, 1).repeat(2, 2)
    post_dec = lambda h: jnp.tile(h, (1, 1, 1, 43))[..., :128][
        :, ::2, ::2, :]
    stage("encoder island plain (stem+down0)", EncPlain(),
          (256, 256, 3), enc_fl, post_enc)
    stage("encoder island s2d r=2", EncS2d(),
          (256, 256, 3), enc_fl, post_enc)
    stage("decoder island plain (up1+final)", DecPlain(),
          (128, 128, 128), dec_fl, post_dec)
    stage("decoder island s2d r=2", DecS2d(),
          (128, 128, 128), dec_fl, post_dec)
    stage("decoder island s2d r=2, final r=4", DecS2d(r_final=4),
          (128, 128, 128), dec_fl, post_dec)


if __name__ == "__main__":
    main()
