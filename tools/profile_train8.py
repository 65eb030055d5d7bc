"""to-cells / from-cells boundary convs (raw lax prototypes, slope-timed).

profile_train7: stem conv7 3->64 plain = 1.99 ms (5% peak) and the input-
encoded s2d form is WORSE (3.49) — but final conv7 64->3 s2d r2 wins 2.9x.
Hypothesis: the boundary pathology is OUTPUT-side (few output lanes /
strided-small-channel lowerings), so fold only the output into r^2 phase
channels — a stride-r conv STRAIGHT from the plain image with a phase-
stacked kernel (no input encode at all):

  y_cells[t, (p, c)] = sum_o K[o - p, ci, c] x[r t + o - pad]   (extent k+r-1)

and consume cells directly in down0 with a from-cells kernel producing
PLAIN output (orig stride 2 == cell stride 1). Zero padding throughout
(reflect handled outside the conv in the real wiring).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

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


def run(name, step, in_shape, make_ks, flops):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, *in_shape)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        ks = [jnp.asarray(make_ks(rng).astype(np.float32)).astype(jnp.bfloat16)
              for _ in range(n)]

        @jax.jit
        def f(x, *ks):
            h = x
            for kk in ks:
                h = step(h, kk)
            return h
        return f, (x, *ks)

    t = slope(build)
    print(f"  {name:52s} {t*1e3:7.2f} ms  ({flops/197e12/t:5.1%} "
          f"of plain-flop peak)", flush=True)


def to_cells_kernel(K, r, pad):
    """(k, k, ci, co) -> (k + r - 1, k + r - 1, ci, r*r*co) c-?? phase-major
    stacking [(p1, p2), co]; kernel tap o maps orig offset o - pad for
    phase 0; phase p shifts by p."""
    k = K.shape[0]
    ci, co = K.shape[2], K.shape[3]
    ext = k + r - 1
    Kt = np.zeros((ext, ext, ci, r * r * co), K.dtype)
    for p1 in range(r):
        for p2 in range(r):
            Kt[p1:p1 + k, p2:p2 + k, :, (p1 * r + p2) * co:(p1 * r + p2 + 1) * co] = K
    return Kt


def from_cells_kernel(K, r, pad):
    """Stride-r conv consuming r-cells, producing PLAIN output: the output
    at orig t reads orig inputs r*t + d - pad (kernel index d); the orig
    input r*(t+u) + q is cell offset u, phase q. One tap per d:
    u = (d - pad) // r (floor), q = (d - pad) mod r. (k,k,ci,co) ->
    (ext, ext, r*r*ci, co) with c-major cell channels [(ci, q)]? NO —
    ops/s2d_space encode is c-major: channel index = ci * r^n + phase.
    Here the test builds its own cell layout (phase-major blocks) — both
    sides of the A/B use it consistently, so timing is representative."""
    k = K.shape[0]
    ci, co = K.shape[2], K.shape[3]
    taps = {}  # u -> list of (q, d)
    for d in range(k):
        u, q = divmod(d - pad, r)
        taps.setdefault(u, []).append((q, d))
    us = sorted(taps)
    ext = us[-1] - us[0] + 1
    Kt = np.zeros((ext, ext, r * r * ci, co), K.dtype)
    for u1 in us:
        for q1, d1 in taps[u1]:
            for u2 in us:
                for q2, d2 in taps[u2]:
                    block = q1 * r + q2
                    Kt[u1 - us[0], u2 - us[0],
                       block * ci:(block + 1) * ci, :] += K[d1, d2]
    return Kt, -us[0]


def conv(x, k, strides, pads):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, strides, pads,
                                        dimension_numbers=dn)


def main():
    r = 2
    stem_fl = 2 * 49 * 3 * 64 * B * 256 * 256
    down_fl = 2 * 9 * 64 * 128 * B * 128 * 128

    print("to-cells stem (plain image in, s2d cells out):", flush=True)
    run("stem conv7 3->64 plain (baseline)",
        lambda h, kk: conv(h, kk, (1, 1), [(3, 3)] * 2)[..., :3],
        (256, 256, 3),
        lambda rng: rng.normal(size=(7, 7, 3, 64)) * 0.05,
        stem_fl)
    run("stem to-cells r2 (stride2, ext8, 256 lanes)",
        lambda h, kk: conv(h, kk, (2, 2), [(3, 4)] * 2)[..., :3]
        .repeat(2, 1).repeat(2, 2),
        (256, 256, 3),
        lambda rng: to_cells_kernel(rng.normal(size=(7, 7, 3, 64)) * 0.05, 2, 3),
        stem_fl)
    run("stem to-cells r4 (stride4, ext10, 1024 lanes)",
        lambda h, kk: conv(h, kk, (4, 4), [(3, 6)] * 2)[..., :3]
        .repeat(4, 1).repeat(4, 2),
        (256, 256, 3),
        lambda rng: to_cells_kernel(rng.normal(size=(7, 7, 3, 64)) * 0.05, 4, 3),
        stem_fl)

    print("from-cells down0 (s2d cells in, plain out):", flush=True)
    run("down0 k3s2 64->128 plain (baseline)",
        lambda h, kk: conv(h, kk, (2, 2), [(1, 1)] * 2).repeat(2, 1)
        .repeat(2, 2)[..., :64],
        (256, 256, 64),
        lambda rng: rng.normal(size=(3, 3, 64, 128)) * 0.05,
        down_fl)

    Kt, padc = from_cells_kernel(
        np.random.default_rng(1).normal(size=(3, 3, 64, 128)) * 0.05, 2, 1)
    print(f"  (from-cells kernel extent {Kt.shape[0]}, cell pad {padc})",
          flush=True)
    run("down0 from-cells (cell stride 1, plain 128 out)",
        lambda h, kk: jnp.tile(
            conv(h, kk, (1, 1), [(padc, Kt.shape[0] - 1 - padc)] * 2),
            (1, 1, 1, 2)),
        (128, 128, 256),
        lambda rng: Kt + rng.normal(size=Kt.shape) * 1e-6,
        down_fl)


if __name__ == "__main__":
    main()
