"""Space-to-depth (S2D) reformulation of stride-1 convolutions, rank-generic.

Two distinct TPU inefficiencies motivate it:

- Large-kernel small-channel 2D convs (CycleGAN's c7s1 boundary layers with
  3-64 channels at 256x256,
  /root/reference/ganslate/nn/generators/resnet/resnet2d.py:23-26,65) run at
  <5% MXU efficiency: the im2col patch traffic is 49x the input and the tiny
  channel counts waste lanes.
- Small-channel 3D convs (V-Net's flc=16 top level,
  /root/reference/ganslate/nn/generators/vnet/vnet3d.py:151-202) waste
  112/128 MXU output lanes: with NDHWC the output-channel count maps to
  lanes, so C_out=16 uses 12.5% of the systolic array.

Folding an r^n spatial block into channels turns a k^n conv into an EXACT
ceil((k+r-1)/r)^n conv over r^n-fold wider channels on an r-fold smaller
grid — e.g. 2D r=4: k7 -> k2(+pad)=k3, 16x channels; 3D r=2: k5 -> k3,
8x channels (C 16 -> 128 fills the lanes at 1.73x the MACs, a net win
whenever the conv is MXU-lane-bound).

The transform is a pure function of the CANONICAL (k..., C, O) kernel, so
parameters, checkpoints, and the torch importer are untouched; gradients
flow through the (static) kernel rearrangement.
"""

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """(N, *spatial, C) -> (N, *spatial/r, r^n * C); channel index =
    (d1, ..., dn, c) in row-major order."""
    n = x.ndim - 2
    c = x.shape[-1]
    shape = [x.shape[0]]
    for i in range(n):
        shape += [x.shape[1 + i] // r, r]
    shape.append(c)
    x = x.reshape(shape)
    # (N, s1, d1, s2, d2, ..., C) -> (N, s1, s2, ..., d1, d2, ..., C)
    perm = [0] + [1 + 2 * i for i in range(n)] + [2 + 2 * i for i in range(n)] \
        + [1 + 2 * n]
    x = x.transpose(perm)
    return x.reshape(x.shape[0], *x.shape[1:n + 1], (r ** n) * c)


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of `space_to_depth`."""
    n = x.ndim - 2
    c = x.shape[-1] // (r ** n)
    x = x.reshape(x.shape[0], *x.shape[1:n + 1], *([r] * n), c)
    perm = [0]
    for i in range(n):
        perm += [1 + i, 1 + n + i]
    perm.append(1 + 2 * n)
    x = x.transpose(perm)
    return x.reshape(x.shape[0],
                     *[x.shape[1 + 2 * i] * r for i in range(n)], c)


@lru_cache(maxsize=None)
def _gather_plan(k: int, r: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Index/mask arrays mapping W[u, ...] onto the transformed kernel
    K'[a, (d, c), (p, o)] = W[r*a + d - p, ...] per spatial dim
    (zero where the index falls outside the original kernel support)."""
    ka = -(-(k + r - 1) // r)               # transformed kernel extent
    a = np.arange(ka)[:, None, None]
    d = np.arange(r)[None, :, None]
    p = np.arange(r)[None, None, :]
    u = r * a + d - p                       # (ka, r, r)
    valid = (u >= 0) & (u < k)
    return np.clip(u, 0, k - 1), valid, ka


def transform_kernel(kernel: jax.Array, r: int) -> jax.Array:
    """(k1..kn, C, O) -> (ka1..kan, r^n * C, r^n * O) transformed kernel.
    Input-channel index = (d1..dn, c); output-channel index = (p1..pn, o),
    both matching `space_to_depth` / `depth_to_space` order."""
    n = kernel.ndim - 2
    ks = kernel.shape[:n]
    c_in, c_out = kernel.shape[n], kernel.shape[n + 1]

    k = kernel
    for i in range(n):
        u, valid, _ = _gather_plan(ks[i], r)
        # axis layout so far: (a1, d1, p1, ..., a_{i-1}, d_{i-1}, p_{i-1},
        #                      k_i, ..., C, O)
        ax = 3 * i
        k = jnp.take(k, jnp.asarray(u.reshape(-1)), axis=ax)
        k = k.reshape(k.shape[:ax] + u.shape + k.shape[ax + 1:])
        mshape = [1] * k.ndim
        mshape[ax], mshape[ax + 1], mshape[ax + 2] = u.shape
        k = k * jnp.asarray(valid.reshape(mshape), k.dtype)

    # (a1, d1, p1, ..., an, dn, pn, C, O) -> (a1..an, d1..dn, C, p1..pn, O)
    perm = ([3 * i for i in range(n)] + [3 * i + 1 for i in range(n)] +
            [3 * n] + [3 * i + 2 for i in range(n)] + [3 * n + 1])
    k = k.transpose(perm)
    kas = k.shape[:n]
    return k.reshape(*kas, (r ** n) * c_in, (r ** n) * c_out)


def s2d_applicable(padded_spatial: Tuple[int, ...], kernel_shape, strides,
                   r: int) -> bool:
    """The fast path serves stride-1 square/cubic convs whose VALID output
    grid divides by r (output = padded - k + 1)."""
    if r <= 1 or len(padded_spatial) not in (1, 2, 3):
        return False
    k0 = kernel_shape[0]
    if any(kernel_shape[i] != k0 for i in range(len(padded_spatial))):
        return False
    if any(s != 1 for s in strides):
        return False
    outs = [padded_spatial[i] - k0 + 1 for i in range(len(padded_spatial))]
    return all(o > 0 and o % r == 0 for o in outs)


def s2d_conv(x_padded: jax.Array, kernel: jax.Array, r: int) -> jax.Array:
    """VALID stride-1 conv of a (pre-padded) channels-last input with a
    canonical-layout kernel (k1..kn, C, O), computed in space-to-depth form.
    Exact.

    x_padded: (N, *padded, C); output: (N, *(padded - k + 1), O)."""
    n = x_padded.ndim - 2
    sp = x_padded.shape[1:-1]
    ks = kernel.shape[:n]
    k0 = ks[0]
    assert all(ki == k0 for ki in ks), f"cubic kernels only, got {ks}"
    outs = [sp[i] - ks[i] + 1 for i in range(n)]
    _, _, ka = _gather_plan(k0, r)

    # Align the transformed grid to the padded input's origin; extend on the
    # far side so every transformed tap exists (the extension is only
    # touched through structurally-zero kernel entries).
    pad_cfg = [(0, 0)]
    for i in range(n):
        need = outs[i] + r * (ka - 1) + r   # last tap block + block size
        need = -(-need // r) * r            # block grid must divide by r
        pad_cfg.append((0, max(0, need - sp[i])))
    pad_cfg.append((0, 0))
    if any(p for _, p in pad_cfg):
        x_padded = jnp.pad(x_padded, pad_cfg)

    xt = space_to_depth(x_padded, r)        # (N, *sp/r, r^n C)
    kt = transform_kernel(kernel, r)        # (ka.., r^n C, r^n O)

    spatial = "DHW"[3 - n:]
    dn = jax.lax.conv_dimension_numbers(
        xt.shape, kt.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    yt = jax.lax.conv_general_dilated(xt, kt.astype(xt.dtype), (1,) * n,
                                      [(0, 0)] * n, dimension_numbers=dn)
    y = depth_to_space(yt, r)               # (N, ..., O)
    return y[tuple([slice(None)] + [slice(0, o) for o in outs])]
