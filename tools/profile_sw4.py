"""Batch-fold packing for small-grid convs: fold the window batch into the
leading spatial dim with a (pad_lo+pad_hi)-zero gap between samples, so a
(28,4,22,22,C) conv becomes a (1,168,22,22,C) conv — identical math (the
gap zeros ARE each sample's explicit zero padding), but XLA sees a big
spatial extent it can tile properly. Slope-timed vs the batched form.
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


def conv_batchfold(name, grid, lanes, taps=3, pad=1):
    """Stride-1 conv with symmetric zero pad, batch folded into D."""
    rng = np.random.default_rng(0)
    d, h, w = grid
    dd = d + 2 * pad
    x = jnp.asarray(rng.normal(size=(SWB, *grid, lanes)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        ks = [jnp.asarray(rng.normal(size=(taps, taps, taps, lanes, lanes))
                          .astype(np.float32)).astype(jnp.bfloat16)
              for _ in range(n)]

        @jax.jit
        def f(x, *ks):
            hcur = x
            for kk in ks:
                xp = jnp.pad(hcur, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
                xf = xp.reshape(1, SWB * dd, h, w, lanes)
                dn = jax.lax.conv_dimension_numbers(
                    xf.shape, kk.shape, ("NDHWC", "DHWIO", "NDHWC"))
                y = jax.lax.conv_general_dilated(
                    xf, kk, (1, 1, 1), [(0, 0), (pad, pad), (pad, pad)],
                    dimension_numbers=dn)
                # output row s*dd + j is sample s's row j (valid for j < d);
                # re-pad to length SWB*dd so the per-sample rows realign.
                y = jnp.pad(y[0], ((0, taps - 1), (0, 0), (0, 0), (0, 0)))
                hcur = y.reshape(SWB, dd, h, w, lanes)[:, :d]
            return hcur
        return f, (x, *ks)

    t = slope(build)
    fl = 2 * taps ** 3 * lanes * lanes * SWB * int(np.prod(grid))
    print(f"  bfold {name:30s} {t*1e3:7.2f} ms  {fl/1e12:5.2f} TF "
          f"({fl/197e12/t:5.1%} peak)")


def main():
    print("batch-folded small-grid convs (slope-timed):")
    conv_batchfold("s2d-L3 (512 lanes @2,11,11)", (2, 11, 11), 512)
    conv_batchfold("s2d-L2 (512 lanes @4,22,22)", (4, 22, 22), 512)
    conv_batchfold("s2d-L2b (256 lanes @4,22,22)", (4, 22, 22), 256)
    conv_batchfold("s2d-L1 (256 lanes @8,44,44)", (8, 44, 44), 256)


if __name__ == "__main__":
    main()
