"""Attribute the CycleGAN-256 train step's 41.6% MFU.

Slope-timed components (docs/benchmarks.md method):
  1. full fused train step, chained inside one jit (states evolve ->
     no CSE) — the honest per-step time net of dispatch
  2. G forward alone (batch 16)
  3. G-loss value_and_grad (4 G + 2 D forwards + backward)
  4. D-loss value_and_grad
Residual of (1) - (3) - (4) = pools + optimizer + metrics + dispatch glue.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.utils.builders import build_gan
from ganslate_tpu.utils.testing import make_cyclegan_conf

B, S = 16, 256


def fence(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))[None][0]))


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


def main():
    conf = make_cyclegan_conf(batch_size=B, image_size=S,
                              mixed_precision=True, n_iters=10_000)
    rng = np.random.default_rng(0)
    batch = {k: rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32)
             for k in ("A", "B")}
    model = build_gan(conf)
    model.setup(example_batch=batch)
    model.set_input(batch)
    step = model.make_train_step()
    state0 = model.state
    dev_batch = model._batch

    # 1. chained full steps
    def build_steps(n):
        @jax.jit
        def f(state, batch):
            for _ in range(n):
                state, logs = step(state, batch)
            return state
        return f, (state0, dev_batch)

    t_step = slope(build_steps)
    cost = jax.jit(step).lower(state0, dev_batch).compile().cost_analysis()
    fl = cost.get("flops", 0) / 1e12
    print(f"full step (chained): {t_step*1e3:7.2f} ms  {fl:.2f} TF "
          f"-> MFU {fl/197/t_step:5.1%}")

    # shared pieces
    params_G = model.group_params(state0.params, "G")
    params_D = model.group_params(state0.params, "D")
    apply = model.apply
    a = dev_batch["A"]
    b = dev_batch["B"]

    # 2. G forward alone (chained fake->fake with param jitter per step)
    def build_gfwd(n):
        @jax.jit
        def f(params_G, x):
            h = x
            for i in range(n):
                p = jax.tree_util.tree_map(lambda v: v + jnp.bfloat16(i * 1e-6)
                                           if v.dtype == jnp.bfloat16 else v,
                                           params_G["G_AB"])
                h = apply("G_AB", p, h)
            return h
        return f, (params_G, a)

    t_gfwd = slope(build_gfwd)
    print(f"G forward (batch {B}): {t_gfwd*1e3:7.2f} ms")

    # 3/4. grad closures, chained by feeding loss back into params
    crit = model.criterion_adv
    crit_G = model.criterion_G

    def g_loss(params_G, params_D, ra, rb, key):
        ks = jax.random.split(key, 8)
        fake_B = apply("G_AB", params_G["G_AB"], ra, rng=ks[0])
        rec_A = apply("G_BA", params_G["G_BA"], fake_B, rng=ks[1])
        fake_A = apply("G_BA", params_G["G_BA"], rb, rng=ks[2])
        rec_B = apply("G_AB", params_G["G_AB"], fake_A, rng=ks[3])
        vis = {"real_A": ra, "fake_B": fake_B, "rec_A": rec_A,
               "real_B": rb, "fake_A": fake_A, "rec_B": rec_B}
        pred_B = apply("D_B", params_D["D_B"], fake_B, rng=ks[6])
        pred_A = apply("D_A", params_D["D_A"], fake_A, rng=ks[7])
        losses = {"G_AB": crit(pred_B, True), "G_BA": crit(pred_A, True)}
        losses.update(crit_G(vis))
        return sum(jax.tree_util.tree_leaves(losses), jnp.float32(0))

    def build_ggrad(n):
        @jax.jit
        def f(params_G, params_D, ra, rb):
            total = jnp.float32(0)
            for i in range(n):
                pg = jax.tree_util.tree_map(
                    lambda v: v + total.astype(v.dtype) * 0 +
                    jnp.asarray(i * 1e-6, v.dtype), params_G)
                l, g = jax.value_and_grad(g_loss)(pg, params_D, ra, rb,
                                                  jax.random.key(i))
                total = total + l
            return total
        return f, (params_G, params_D, a, b)

    t_ggrad = slope(build_ggrad)
    print(f"G value_and_grad: {t_ggrad*1e3:7.2f} ms")

    def d_loss(params_D, ra, rb, fa, fb, key):
        ks = jax.random.split(key, 4)
        lb = (crit(apply("D_B", params_D["D_B"], rb, rng=ks[0]), True) +
              crit(apply("D_B", params_D["D_B"], fb, rng=ks[1]), False))
        la = (crit(apply("D_A", params_D["D_A"], ra, rng=ks[2]), True) +
              crit(apply("D_A", params_D["D_A"], fa, rng=ks[3]), False))
        return la + lb

    def build_dgrad(n):
        @jax.jit
        def f(params_D, ra, rb):
            total = jnp.float32(0)
            for i in range(n):
                pd = jax.tree_util.tree_map(
                    lambda v: v + jnp.asarray(i * 1e-6, v.dtype), params_D)
                l, g = jax.value_and_grad(d_loss)(pd, ra, rb, ra, rb,
                                                  jax.random.key(i))
                total = total + l
            return total
        return f, (params_D, a, b)

    t_dgrad = slope(build_dgrad)
    print(f"D value_and_grad: {t_dgrad*1e3:7.2f} ms")
    print(f"residual (pool+opt+metrics+glue): "
          f"{(t_step - t_ggrad - t_dgrad)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
