"""Fused InstanceNorm(+activation) Pallas kernel.

Instance norm dominates the memory traffic of every generator in the zoo
(2 reads + 1 write per tensor in XLA's two-pass form, plus another pass for
the following activation). This kernel does stats + normalize + activation in
ONE pass over VMEM-resident data: one HBM read, one HBM write per sample.

Forward = Pallas (grid over (batch,) with the whole (spatial, C) slab of one
sample in VMEM); backward = standard instance-norm VJP in XLA from saved
(mean, rstd) — cheap relative to forward and fuses with surrounding ops.

Falls back to a pure-XLA implementation when the slab exceeds the VMEM
budget or when not running on TPU (CPU tests, interpret overhead).
"""

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ganslate_tpu.flags import FLAGS

# Per-slab VMEM budget (bytes). Measured on v5e (CycleGAN-256, batch 16):
# running the kernel on the large 6MB+ res-block slabs LOSES to XLA's fused
# two-pass form (60.0 vs 65.1 img/s) — the single-sample grid can't pipeline
# the HBM reads. Keep the kernel for slabs small enough to double-buffer.
_VMEM_BUDGET = 4 * 1024 * 1024

# Test hook: run the Pallas kernel in interpreter mode (CPU).
_INTERPRET = False

_ACTIVATIONS = ("none", "relu", "leaky_relu")


def _act(y, activation: str, negative_slope: float):
    if activation == "relu":
        return jnp.maximum(y, 0)
    if activation == "leaky_relu":
        return jnp.where(y >= 0, y, y * negative_slope)
    return y


def _act_grad(y, activation: str, negative_slope: float):
    """d act(y) / dy as a function of the PRE-activation y."""
    if activation == "relu":
        return (y > 0).astype(jnp.float32)
    if activation == "leaky_relu":
        return jnp.where(y >= 0, 1.0, negative_slope).astype(jnp.float32)
    return jnp.ones_like(y, dtype=jnp.float32)


def _xla_forward(x, eps, activation, negative_slope):
    axes = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x32 - mean) * rstd
    out = _act(y, activation, negative_slope).astype(x.dtype)
    return out, mean.reshape(x.shape[0], x.shape[-1]), rstd.reshape(x.shape[0], x.shape[-1])


def _pallas_forward(x, eps, activation, negative_slope):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    c = x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    x2d = x.reshape(n, s, c)

    def kernel(x_ref, o_ref, mean_ref, rstd_ref):
        xv = x_ref[0].astype(jnp.float32)                 # (S, C)
        mean = jnp.mean(xv, axis=0, keepdims=True)        # (1, C)
        var = jnp.mean(jnp.square(xv - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        y = (xv - mean) * rstd
        o_ref[0] = _act(y, activation, negative_slope).astype(o_ref.dtype)
        mean_ref[0, 0] = mean[0]
        rstd_ref[0, 0] = rstd[0]

    out, mean, rstd = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, s, c), x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(x2d)
    return out.reshape(x.shape), mean.reshape(n, c), rstd.reshape(n, c)


def _pallas_forward_tiled(x, eps, activation, negative_slope, tile):
    """Spatially tiled two-pass kernel for slabs that exceed the VMEM budget
    (e.g. CycleGAN-256's 256*256*64 layers): pass 1 accumulates per-channel
    [sum, sum-of-squares] across tiles of one sample (the grid revisits the
    same (2, C) output block, which therefore stays resident in VMEM), pass 2
    normalizes + activates tile-wise. Both passes pipeline HBM through the
    multi-step grid — the single-slab kernel above cannot, which is why it
    loses to XLA on large slabs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    c = x.shape[-1]
    s = int(np.prod(x.shape[1:-1]))
    t = s // tile
    x2d = x.reshape(n, s, c)

    def stats_kernel(x_ref, acc_ref):
        ti = pl.program_id(1)
        xv = x_ref[0].astype(jnp.float32)                 # (tile, C)
        ssum = jnp.sum(xv, axis=0, keepdims=True)
        ssq = jnp.sum(jnp.square(xv), axis=0, keepdims=True)
        both = jnp.concatenate([ssum, ssq], axis=0)       # (2, C)

        @pl.when(ti == 0)
        def _init():
            acc_ref[0] = both

        @pl.when(ti != 0)
        def _accum():
            acc_ref[0] = acc_ref[0] + both

    acc = pl.pallas_call(
        stats_kernel,
        grid=(n, t),
        in_specs=[pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        interpret=_INTERPRET,
    )(x2d)

    mean = acc[:, 0] / s                                  # (N, C)
    # E[x^2] - E[x]^2; fine in fp32 for post-conv activations (|mean|~std).
    var = acc[:, 1] / s - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)

    def norm_kernel(x_ref, mean_ref, rstd_ref, o_ref):
        xv = x_ref[0].astype(jnp.float32)
        y = (xv - mean_ref[0]) * rstd_ref[0]
        o_ref[0] = _act(y, activation, negative_slope).astype(o_ref.dtype)

    # Stats as (N, 1, C): trailing block dims must equal the array dims (or
    # be 8/128-aligned) under the Mosaic lowering.
    out = pl.pallas_call(
        norm_kernel,
        grid=(n, t),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        interpret=_INTERPRET,
    )(x2d, mean.reshape(n, 1, c), rstd.reshape(n, 1, c))
    return out.reshape(x.shape), mean, rstd


# Per-tile byte budget for the tiled kernel (fp32 temp of one tile).
_TILE_BUDGET = 2 * 1024 * 1024
# Measured on v5e (bf16 (16, 256, 256, 64) — CycleGAN-256's largest slab):
# XLA two-pass 1.95 ms vs tiled Pallas 3.45 ms at tile=8192 (the largest
# tile that compiles; 16384 exceeds the 16MB VMEM scoped limit). XLA wins on
# big slabs because it fuses the normalize+activation into neighboring ops
# and pipelines its reduction better than the revisit-accumulate grid, so
# the tiled kernel stays OFF by default. Flip to re-measure on other
# topologies; correctness is covered by tests/test_ops.py either way.


# Whole-slab Pallas kernel default. Round-2 measurement INSIDE the CycleGAN
# res-block chain (slope-timed, v5e, bf16 (16,64,64,256)): conv+norm+relu
# runs at 47.4% of MXU peak with the Pallas kernel vs 67.7% with the XLA
# form, while the bare conv is 97.5% — the custom call is a fusion BARRIER
# between the conv and the elementwise tail, costing far more than its
# saved reduction pass. XLA's two-pass form fuses into both neighbors, so
# it is the default; flip to re-measure on other topologies.



def _pick_tile(s: int, c: int):
    """Largest spatial tile that divides s, is lane-aligned, and fits the
    per-tile budget; None if no usable tile exists."""
    max_tile = _TILE_BUDGET // (4 * c)
    best = None
    for tile in range(8, max_tile + 1, 8):
        if s % tile == 0:
            best = tile
    return best


def _use_pallas(x) -> bool:
    if not FLAGS.inorm_pallas or jax.default_backend() != "tpu":
        return False
    s = int(np.prod(x.shape[1:-1]))
    c = x.shape[-1]
    slab_bytes = s * c * (4 + x.dtype.itemsize)  # f32 temp + io
    return slab_bytes <= _VMEM_BUDGET and s >= 8 and c >= 8


def _use_pallas_tiled(x) -> bool:
    if not FLAGS.inorm_tiled or jax.default_backend() != "tpu":
        return False
    s = int(np.prod(x.shape[1:-1]))
    c = x.shape[-1]
    if c < 8 or s < 8:
        return False
    slab_bytes = s * c * (4 + x.dtype.itemsize)
    return slab_bytes > _VMEM_BUDGET and _pick_tile(s, c) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm(x, eps: float = 1e-5, activation: str = "none",
                  negative_slope: float = 0.2):
    """Fused instance norm + optional activation over (N, *spatial, C)."""
    out, _, _ = _forward(x, eps, activation, negative_slope)
    return out


def _forward(x, eps, activation, negative_slope):
    assert activation in _ACTIVATIONS, activation
    if _use_pallas(x):
        return _pallas_forward(x, eps, activation, negative_slope)
    if _use_pallas_tiled(x):
        s = int(np.prod(x.shape[1:-1]))
        tile = _pick_tile(s, x.shape[-1])
        return _pallas_forward_tiled(x, eps, activation, negative_slope, tile)
    return _xla_forward(x, eps, activation, negative_slope)


def _fwd(x, eps, activation, negative_slope):
    out, mean, rstd = _forward(x, eps, activation, negative_slope)
    return out, (x, mean, rstd)


def _bwd(eps, activation, negative_slope, residuals, g):
    x, mean, rstd = residuals
    axes = tuple(range(1, x.ndim - 1))
    stat_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    mean = mean.reshape(stat_shape)
    rstd = rstd.reshape(stat_shape)

    x32 = x.astype(jnp.float32)
    y = (x32 - mean) * rstd                       # pre-activation output
    gy = g.astype(jnp.float32) * _act_grad(y, activation, negative_slope)

    m = float(np.prod([x.shape[a] for a in axes]))
    mean_gy = jnp.mean(gy, axis=axes, keepdims=True)
    mean_gy_y = jnp.mean(gy * y, axis=axes, keepdims=True)
    dx = rstd * (gy - mean_gy - y * mean_gy_y)
    return (dx.astype(x.dtype),)


instance_norm.defvjp(_fwd, _bwd)
