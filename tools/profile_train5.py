"""Per-stage attribution of the real CycleGAN G forward (batch 16 @256).

profile_train4 showed the res-block body (conv+bias+relu+XLA-norm chain at
64x64x256) runs at 85% of peak in isolation, yet the full G forward is
~19.5 ms for ~1.59 TF => ~50%. This slope-times each stage AT ITS REAL
SHAPE to find where the other half goes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.nn.layers import Conv, ConvTranspose, NormAct, pad_spatial

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


def stage(name, mod_fn, in_shape, flops, post=None, n2=16):
    """Slope-time `y = post(mod.apply(p_i, x))` chains.

    post() must map y back to in_shape so the chain composes; its cost is
    attributed to the stage (it is the glue the real network also pays).
    """
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, *in_shape)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mod = mod_fn()
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
                h = mod.apply(pj, h)
                if post is not None:
                    h = post(h)
            return h
        return f, (p0, x)

    t = slope(build, n2=n2)
    eff = flops / 197e12 / t
    print(f"  {name:44s} {t*1e3:7.2f} ms  {flops/1e9:7.1f} GF  ({eff:5.1%} peak)",
          flush=True)
    return t


def main():
    from flax import linen as nn

    class StemMod(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = pad_spatial(x, (3, 3), "reflect")
            h = Conv(64, (7, 7), padding=0, use_bias=True, name="c")(h)
            h = NormAct("instance", "relu")(h)
            return h

    class DownMod(nn.Module):
        cin: int
        cout: int

        @nn.compact
        def __call__(self, x):
            h = Conv(self.cout, (3, 3), strides=2, padding=1, use_bias=True,
                     name="c")(x)
            h = NormAct("instance", "relu")(h)
            return h

    class UpMod(nn.Module):
        cin: int
        cout: int
        polyphase: bool = False

        @nn.compact
        def __call__(self, x):
            h = ConvTranspose(self.cout, (3, 3), strides=2, padding=1,
                              output_padding=1, polyphase=self.polyphase,
                              name="c")(x)
            h = NormAct("instance", "relu")(h)
            return h

    class FinalMod(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = pad_spatial(x, (3, 3), "reflect")
            h = Conv(3, (7, 7), padding=0, use_bias=True, name="c")(h)
            return jnp.tanh(h)

    print(f"G stage anatomy (batch {B} @256, slope-timed, real shapes):",
          flush=True)

    gf = 1e9
    # stem: conv7 3->64 @256^2 (+ reflect pad + norm + relu)
    stage("stem c7s1-64 +IN+relu @256^2",
          lambda: StemMod(), (256, 256, 3),
          2 * 49 * 3 * 64 * B * 256 * 256,
          post=lambda h: h[..., :3], n2=12)
    # down0: 64->128 s2 @128^2 out
    stage("down0 k3s2 64->128 +IN+relu",
          lambda: DownMod(64, 128), (256, 256, 64),
          2 * 9 * 64 * 128 * B * 128 * 128,
          post=lambda h: jnp.tile(h[..., :64], (1, 2, 2, 1)), n2=12)
    # down1: 128->256 s2 @64^2 out
    stage("down1 k3s2 128->256 +IN+relu",
          lambda: DownMod(128, 256), (128, 128, 128),
          2 * 9 * 128 * 256 * B * 64 * 64,
          post=lambda h: jnp.tile(h[..., :128], (1, 2, 2, 1)), n2=12)
    # up0: 256->128 @128^2 out (dilated + polyphase)
    for pp in (False, True):
        stage(f"up0 k3s2^T 256->128 +IN+relu poly={pp}",
              lambda pp=pp: UpMod(256, 128, pp), (64, 64, 256),
              2 * 9 * 256 * 128 * B * 128 * 128,
              post=lambda h: h[:, ::2, ::2, :].repeat(2, -1), n2=12)
        stage(f"up1 k3s2^T 128->64 +IN+relu poly={pp}",
              lambda pp=pp: UpMod(128, 64, pp), (128, 128, 128),
              2 * 9 * 128 * 64 * B * 256 * 256,
              post=lambda h: h[:, ::2, ::2, :].repeat(2, -1), n2=12)
    # final c7s1-3 + tanh
    stage("final c7s1-3 + tanh @256^2",
          lambda: FinalMod(), (256, 256, 64),
          2 * 49 * 64 * 3 * B * 256 * 256,
          post=lambda h: h.repeat(22, -1)[..., :64], n2=12)


if __name__ == "__main__":
    main()
