"""Slope-timed microbenchmarks behind docs/benchmarks.md.

On this chip's remote-relay PJRT transport, per-dispatch overhead is
~2-10 ms and even chained `fori_loop` iterations carry 0.3-1.7 ms, so naive
timing under-reports by 2-10x. Each probe therefore builds an op chain at
two unroll depths n1 < n2 inside one jit — with DISTINCT weights per step so
XLA cannot CSE or algebraically collapse the chain — and reports the slope
(T(n2) - T(n1)) / (n2 - n1), which cancels every fixed overhead. Fencing is
a scalar `device_get(sum(...))` (block_until_ready can return early here).

Usage:  python tools/benchmarks/microbench.py [probe ...]
Probes: matmul conv2d conv3d_c16 conv3d_c32 conv3d_s2d  (default: all)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _conv(h, w, stride=1, pad="SAME"):
    n = h.ndim - 2
    spatial = "DHW"[3 - n:]
    dn = jax.lax.conv_dimension_numbers(
        h.shape, w.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    return jax.lax.conv_general_dilated(h, w, (stride,) * n, pad,
                                        dimension_numbers=dn)


def slope_bench(name, step, x0, ws, ns, flops, reps=5):
    """step(h, w) -> h' chained ns[i] times; prints the slope rate."""
    ts = []
    for n in ns:
        @jax.jit
        def run(x, ws):
            h = x
            for i in range(n):
                h = step(h, ws[i % len(ws)])
            return jnp.sum(h.astype(jnp.float32))
        out = run(x0, ws)
        float(jax.device_get(out))          # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x0, ws)
        float(jax.device_get(out))
        ts.append((time.perf_counter() - t0) / reps)
    slope = (ts[-1] - ts[0]) / (ns[-1] - ns[0])
    print(f"{name}: {slope * 1e6:.1f} us/op  {flops / slope / 1e12:.1f} TFLOP/s",
          flush=True)
    return slope


def probe_matmul(r):
    a = jnp.asarray(r.normal(size=(8192, 8192)), jnp.bfloat16)
    slope_bench("matmul 8192^3 bf16",
                lambda h, w: (h @ w) * jnp.bfloat16(1e-4),
                a, a[None], (2, 6), flops=2 * 8192 ** 3)


def probe_conv2d(r):
    x = jnp.asarray(r.normal(size=(16, 64, 64, 256)), jnp.bfloat16)
    ws = jnp.asarray(r.normal(size=(8, 3, 3, 256, 256)) * 0.06, jnp.bfloat16)
    gf = 16 * 64 * 64 * 256 * 9 * 256 * 2
    slope_bench("conv3x3 256ch @64^2 B16 (res-block conv)",
                lambda h, w: _conv(h, w) * jnp.bfloat16(0.05),
                x, ws, (4, 12), flops=gf)


def probe_conv3d_c16(r):
    x = jnp.asarray(r.normal(size=(7, 32, 176, 176, 16)), jnp.bfloat16)
    ws = jnp.asarray(r.normal(size=(4, 5, 5, 5, 16, 16)) * 0.05, jnp.bfloat16)
    gf = 7 * 32 * 176 * 176 * 125 * 16 * 16 * 2
    slope_bench("conv5^3 C=16 (V-Net level 0)",
                lambda h, w: _conv(h, w) * jnp.bfloat16(0.5),
                x, ws, (2, 6), flops=gf)


def probe_conv3d_c32(r):
    x = jnp.asarray(r.normal(size=(7, 16, 88, 88, 32)), jnp.bfloat16)
    ws = jnp.asarray(r.normal(size=(4, 5, 5, 5, 32, 32)) * 0.05, jnp.bfloat16)
    gf = 7 * 16 * 88 * 88 * 125 * 32 * 32 * 2
    slope_bench("conv5^3 C=32 (V-Net level 1)",
                lambda h, w: _conv(h, w) * jnp.bfloat16(0.5),
                x, ws, (2, 6), flops=gf)


def probe_conv3d_s2d(r):
    """The s2d-space equivalent of the level-0 conv: k3, C=128, half grid.
    FLOP rate is on the s2d envelope (1.73x the useful level-0 MACs)."""
    x = jnp.asarray(r.normal(size=(7, 16, 88, 88, 128)), jnp.bfloat16)
    ws = jnp.asarray(r.normal(size=(4, 3, 3, 3, 128, 128)) * 0.02, jnp.bfloat16)
    gf = 7 * 16 * 88 * 88 * 27 * 128 * 128 * 2
    slope_bench("conv3^3 C=128 on half grid (s2d space)",
                lambda h, w: _conv(h, w) * jnp.bfloat16(0.1),
                x, ws, (2, 6), flops=gf)


PROBES = {
    "matmul": probe_matmul,
    "conv2d": probe_conv2d,
    "conv3d_c16": probe_conv3d_c16,
    "conv3d_c32": probe_conv3d_c32,
    "conv3d_s2d": probe_conv3d_s2d,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    r = np.random.default_rng(0)
    for name in names:
        PROBES[name](r)


if __name__ == "__main__":
    main()
