"""Separate conv-vs-glue inside the s2d V-Net stages.

For the hot stage geometries, slope-time (docs/benchmarks.md method: two
unroll depths, distinct weights, (T2-T1)/(n2-n1)):
  a) the bare transformed 3x3x3 s2d conv        (what the couplings run)
  b) a dense matmul with the same logical FLOPs (MXU sanity ceiling)
  c) group_instance_norm alone
  d) PReLU alone
  e) a full coupling block (split + conv/norm/prelu + add + concat)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganslate_tpu.ops import s2d_space as sp

SWB = 28


def fence(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32)[..., :1, :1])))


def slope(build, n1=2, n2=6):
    """build(n) -> jitted fn + args running the op n times with distinct
    weights; returns secs/op."""
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


def conv3_s2d(name, grid, lanes_in, lanes_out, true_c_in, true_c_out):
    """Bare transformed k5->3^3 s2d conv at stage geometry."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(SWB, *grid, lanes_in)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        ks = [jnp.asarray(rng.normal(size=(5, 5, 5, true_c_in, true_c_out))
                          .astype(np.float32)).astype(jnp.bfloat16)
              for _ in range(n)]

        @jax.jit
        def f(x, *ks):
            h = x
            for k in ks:
                kt = sp.transform_stride1_kernel(k, 2, 2)
                lo, hi = sp.stride1_pads(5, 2, 2)
                dn = jax.lax.conv_dimension_numbers(
                    h.shape, kt.shape, ("NDHWC", "DHWIO", "NDHWC"))
                h = jax.lax.conv_general_dilated(
                    h, kt, (1, 1, 1), [(lo, hi)] * 3, dimension_numbers=dn)
                h = h[..., :lanes_in] if h.shape[-1] != lanes_in else h
            return h
        return f, (x, *ks)

    t = slope(build)
    cells = SWB * np.prod(grid)
    # padded (structural-zero-inclusive) flops as XLA counts them
    fl = 2 * 27 * lanes_in * lanes_out * cells
    io_gb = (cells * (lanes_in + lanes_out) * 2) / 1e9
    print(f"  conv3 {name:28s} {t*1e3:7.2f} ms  {fl/1e12:5.2f} TF "
          f"({fl/197e12/t:5.1%} peak)  min-io {io_gb:4.1f} GB "
          f"({io_gb/t:4.0f} GB/s)")
    return t


def matmul(name, rows, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, cin)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        ws = [jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32)
                          ).astype(jnp.bfloat16) for _ in range(n)]

        @jax.jit
        def f(x, *ws):
            h = x
            for w in ws:
                h = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
                h = h[:, :cin] if cout != cin else h
            return h
        return f, (x, *ws)

    t = slope(build)
    fl = 2 * rows * cin * cout
    print(f"  matmul {name:27s} {t*1e3:7.2f} ms  {fl/1e12:5.2f} TF "
          f"({fl/197e12/t:5.1%} peak)")


def norm(name, grid, lanes, true_c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(SWB, *grid, lanes)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def build(n):
        @jax.jit
        def f(x):
            h = x
            for i in range(n):
                h = sp.group_instance_norm(h + jnp.bfloat16(i * 1e-3),
                                           true_c, lanes // true_c)
            return h
        return f, (x,)

    t = slope(build)
    gb = SWB * np.prod(grid) * lanes * 2 * 2 / 1e9
    print(f"  norm {name:29s} {t*1e3:7.2f} ms  min-io {gb:4.1f} GB "
          f"({gb/t:4.0f} GB/s)")


def prelu(name, grid, lanes):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(SWB, *grid, lanes)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    slp = jnp.asarray(rng.normal(size=(lanes,)).astype(np.float32))

    def build(n):
        @jax.jit
        def f(x, slp):
            h = x
            for i in range(n):
                h = jnp.where(h >= 0, h, h * (slp + i).astype(h.dtype))
            return h
        return f, (x, slp)

    t = slope(build)
    gb = SWB * np.prod(grid) * lanes * 2 * 2 / 1e9
    print(f"  prelu {name:28s} {t*1e3:7.2f} ms  min-io {gb:4.1f} GB "
          f"({gb/t:4.0f} GB/s)")


def main():
    print("stage geometry microbenches (slope-timed):")
    g = (16, 88, 88)
    g1 = (8, 44, 44)
    g2 = (4, 22, 22)
    g3 = (2, 11, 11)

    # coupling convs per stage: half-width lanes
    conv3_s2d("up2 (128 lanes @16,88,88)", g, 128, 128, 16, 16)
    conv3_s2d("up1 (256 lanes @8,44,44)", g1, 256, 256, 32, 32)
    conv3_s2d("up0 (512 lanes @4,22,22)", g2, 512, 512, 64, 64)
    conv3_s2d("down2 (512 lanes @2,11,11)", g3, 512, 512, 64, 64)

    matmul("up2-equivalent (3.47M x 128)", SWB * 16 * 88 * 88, 128, 128)
    matmul("up0-equivalent (54k x 512)", SWB * 4 * 22 * 22, 512, 512)

    norm("up2 (256 lanes @16,88,88)", g, 256, 32)
    norm("up1 (512 lanes @8,44,44)", g1, 512, 64)
    prelu("up2 (256 lanes @16,88,88)", g, 256)


if __name__ == "__main__":
    main()
