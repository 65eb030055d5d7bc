"""Space-to-depth (S2D) reformulation of large-kernel stride-1 2D convs.

CycleGAN's boundary convs (c7s1 with 3-64 channels at 256x256,
/root/reference/ganslate/nn/generators/resnet/resnet2d.py:23-26,65) run at
<5% MXU efficiency on TPU: the im2col patch traffic is 49x the input and the
tiny channel counts waste lanes. Folding an r x r spatial block into
channels turns the k7 conv into an EXACT k-ceil((7+r-1)/r) conv over r^2-fold
wider channels on an r-fold smaller grid — e.g. r=4: k3 conv, 16x channels,
16x fewer pixels; measured 6.4 ms -> ~1.5 ms for the 64->3 final conv
(bf16, batch 16, v5e).

The transform is a pure function of the CANONICAL (kh, kw, C, O) kernel, so
parameters, checkpoints, and the torch importer are untouched; gradients
flow through the (static) kernel rearrangement.
"""

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """(N, H, W, C) -> (N, H/r, W/r, r*r*C); channel index = (dh*r+dw)*C+c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // r, w // r, r * r * c)


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of `space_to_depth`."""
    n, h, w, rc = x.shape
    c = rc // (r * r)
    x = x.reshape(n, h, w, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c)


@lru_cache(maxsize=None)
def _gather_plan(kh: int, kw: int, r: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Index/mask arrays mapping W[u, v, c, o] onto the transformed kernel
    K'[a, b, (dh, dw, c), (ph, pw, o)] = W[r*a + dh - ph, r*b + dw - pw, ...]
    (zero where the index falls outside the original kernel support)."""
    ka = -(-(kh + r - 1) // r)  # transformed kernel extent
    a = np.arange(ka)[:, None, None]
    d = np.arange(r)[None, :, None]
    p = np.arange(r)[None, None, :]
    u = r * a + d - p                       # (ka, r, r)
    valid = (u >= 0) & (u < kh)
    return np.clip(u, 0, kh - 1), valid, ka


def transform_kernel(kernel: jax.Array, r: int) -> jax.Array:
    """(kh, kw, C, O) -> (ka, ka, r*r*C, r*r*O) transformed conv kernel."""
    kh, kw, c_in, c_out = kernel.shape
    assert kh == kw, f"square kernels only, got ({kh}, {kw})"
    u, valid, ka = _gather_plan(kh, kw, r)
    u = jnp.asarray(u)
    mask = jnp.asarray(valid)

    # K'[a, dh, ph, b, dw, pw, c, o] = W[u[a,dh,ph], u[b,dw,pw], c, o] * masks
    k = kernel[u][:, :, :, u]               # (ka, r, r, ka, r, r, C, O)
    m = (mask[:, :, :, None, None, None] &
         mask[None, None, None, :, :, :]).astype(kernel.dtype)
    k = k * m[..., None, None]
    # -> (ka, ka, (dh, dw, c), (ph, pw, o))
    k = k.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return k.reshape(ka, ka, r * r * c_in, r * r * c_out)


def s2d_applicable(padded_spatial: Tuple[int, ...], kernel_shape, strides,
                   r: int) -> bool:
    """The fast path serves stride-1 square 2D convs whose VALID output grid
    divides by r (output = padded - k + 1)."""
    if len(padded_spatial) != 2 or r <= 1:
        return False
    kh, kw = kernel_shape[0], kernel_shape[1]
    if kh != kw or any(s != 1 for s in strides):
        return False
    out_h = padded_spatial[0] - kh + 1
    out_w = padded_spatial[1] - kw + 1
    return out_h > 0 and out_w > 0 and out_h % r == 0 and out_w % r == 0


def s2d_conv(x_padded: jax.Array, kernel: jax.Array, r: int) -> jax.Array:
    """VALID stride-1 conv of a (pre-padded) NHWC input with an NHWC-layout
    kernel (kh, kw, C, O), computed in space-to-depth form. Exact.

    x_padded: (N, Hp, Wp, C); output: (N, Hp-kh+1, Wp-kw+1, O)."""
    n, hp, wp, c = x_padded.shape
    kh = kernel.shape[0]
    assert kernel.shape[1] == kh, \
        f"square kernels only, got {kernel.shape[:2]}"
    out_h, out_w = hp - kh + 1, wp - kh + 1
    _, _, ka = _gather_plan(kh, kh, r)

    # Align the transformed grid to the padded input's origin; extend on the
    # bottom/right so every transformed tap exists (the extension is only
    # touched through structurally-zero kernel entries).
    need_h = out_h + r * (ka - 1) + r      # last tap block + block size
    need_w = out_w + r * (ka - 1) + r
    pad_h = max(0, need_h - hp)
    pad_w = max(0, need_w - wp)
    if pad_h or pad_w:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    xt = space_to_depth(x_padded, r)        # (N, Hp'/r, Wp'/r, r^2 C)
    kt = transform_kernel(kernel, r)        # (ka, ka, r^2 C, r^2 O)

    dn = jax.lax.conv_dimension_numbers(xt.shape, kt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    yt = jax.lax.conv_general_dilated(xt, kt.astype(xt.dtype), (1, 1),
                                      [(0, 0), (0, 0)],
                                      dimension_numbers=dn)
    y = depth_to_space(yt, r)               # (N, ..., O)
    return y[:, :out_h, :out_w, :]
