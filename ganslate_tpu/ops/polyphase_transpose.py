"""Polyphase (sub-pixel) reformulation of transposed convolutions.

`lax.conv_general_dilated` with `lhs_dilation=s` computes a transposed conv
by inserting s-1 zeros between input samples and sliding the full k-tap
kernel — so a fraction (s^n - 1)/s^n of the MXU MACs multiply structural
zeros (75% waste for the 2D stride-2 upsamplers in CycleGAN's Resnet
generator, /root/reference/ganslate/nn/generators/resnet/resnet2d.py:33-41;
87.5% for V-Net's 3D stride-2 up blocks,
/root/reference/ganslate/nn/generators/vnet/vnet3d.py:205-240).

The polyphase decomposition is EXACT and MAC-optimal: output phase
t ∈ [0,s)^n is an ordinary (dense) convolution of the *undilated* input with
the sub-kernel holding taps u ≡ (t + p) (mod s); every nonzero tap is used
exactly once. All s^n phases are fused into ONE conv with s^n·O output
channels, then interleaved with a depth-to-space. For the k=s, p=0 case
(V-Net up blocks) the conv degenerates to a 1x1(x1) matmul.

Derivation (per spatial dim, torch ConvTranspose semantics
y[m] = sum_j x[j] W[m + p - s j], out = (n-1)s - 2p + k + op):
with m = s q + t, t' = (t+p) mod s, c0 = (t+p-t')//s, a = q + c0 - j:
    y[s q + t] = sum_{a=0}^{At-1} x[q + c0 - a] W[s a + t'],
    At = ceil((k - t') / s).
Each phase is a correlation; sharing one window of length
Wn = c0_max + L + 1 (L = max_t (At - 1 - c0)) across phases lets a single
lax conv produce all of them, with out-of-support taps masked to zero.

The transform is a pure function of the CANONICAL (k..., C, O) kernel —
parameters, checkpoints, and the torch importer are untouched; gradients
flow through the (static) gather/mask rearrangement.
"""

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _phase_plan(k: int, s: int, p: int) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Per-dim gather plan.

    Returns (u, valid, L, W): for window position b in [0, W) and phase
    t in [0, s), the transformed kernel tap is  Wref[u[b, t]]  when
    valid[b, t], else zero.  L is the left input padding.
    """
    t = np.arange(s)
    t_prime = (t + p) % s
    c0 = (t + p) // s
    At = -(-(k - t_prime) // s)             # ceil((k - t') / s)
    L = int(np.max(At - 1 - c0))
    W = int(np.max(c0)) + L + 1

    b = np.arange(W)[:, None]               # (W, 1)
    a = c0[None, :] + L - b                 # (W, s)
    # `ConvTranspose` stores the kernel in lax-correlation orientation
    # (no flip in its lhs-dilated form), so mirror the torch-derived tap
    # index:  u = (k-1) - (s a + t').
    u = (k - 1) - (s * a + t_prime[None, :])
    valid = (a >= 0) & (a < At[None, :])
    return np.clip(u, 0, k - 1), valid, L, W


def transform_kernel(kernel: jax.Array, strides: Sequence[int],
                     padding: Sequence[int],
                     cells_major: bool = False) -> jax.Array:
    """(k1..kn, C, O) -> (W1..Wn, C, prod(s)*O) polyphase conv kernel.

    Output channel index = ((t1*s2 + t2)*s3 + ...)*O + o, matching
    `depth_to_space`'s interleave order — or, with ``cells_major``,
    o*prod(s) + code(t): the c-major CELL order of ops/s2d_space.py, so the
    conv's raw output IS the r-cell representation of the transposed conv
    (no interleave needed when the consumer runs in cell space).
    """
    n = kernel.ndim - 2
    ks = kernel.shape[:n]
    c_in, c_out = kernel.shape[n], kernel.shape[n + 1]

    k = kernel
    for i in range(n):
        u, valid, _, _ = _phase_plan(ks[i], strides[i], padding[i])
        # axis layout so far: (W1, t1, ..., W_{i-1}, t_{i-1}, k_i, ..., C, O)
        ax = 2 * i
        k = jnp.take(k, jnp.asarray(u.reshape(-1)), axis=ax)
        k = k.reshape(k.shape[:ax] + u.shape + k.shape[ax + 1:])
        mshape = [1] * k.ndim
        mshape[ax], mshape[ax + 1] = u.shape
        k = k * jnp.asarray(valid.reshape(mshape), k.dtype)

    if cells_major:
        # (W1, t1, ..., Wn, tn, C, O) -> (W1..Wn, C, O, t1..tn)
        perm = (tuple(range(0, 2 * n, 2)) + (2 * n, 2 * n + 1) +
                tuple(range(1, 2 * n, 2)))
    else:
        # (W1, t1, ..., Wn, tn, C, O) -> (W1..Wn, C, t1..tn, O)
        perm = (tuple(range(0, 2 * n, 2)) + (2 * n,) +
                tuple(range(1, 2 * n, 2)) + (2 * n + 1,))
    k = k.transpose(perm)
    ws = k.shape[:n]
    return k.reshape(*ws, c_in, int(np.prod([strides[i] for i in range(n)])) * c_out)


def depth_to_space(x: jax.Array, factors: Sequence[int]) -> jax.Array:
    """(N, Q1..Qn, prod(f)*C) -> (N, Q1*f1 .. Qn*fn, C); channel index
    = ((t1*f2 + t2)*...)*C + c."""
    n = len(factors)
    qs = x.shape[1:n + 1]
    c = x.shape[-1] // int(np.prod(factors))
    x = x.reshape(x.shape[0], *qs, *factors, c)
    perm = [0]
    for i in range(n):
        perm += [1 + i, 1 + n + i]
    perm.append(1 + 2 * n)
    x = x.transpose(perm)
    return x.reshape(x.shape[0], *[qs[i] * factors[i] for i in range(n)], c)


def polyphase_conv_transpose(x: jax.Array, kernel: jax.Array,
                             strides: Sequence[int], padding: Sequence[int],
                             output_padding: Sequence[int],
                             cells_out: bool = False) -> jax.Array:
    """Transposed conv of channels-last `x` (N, *spatial, C) with canonical
    kernel (k1..kn, C, O), torch ConvTranspose output geometry. Exact.

    ``cells_out``: skip the depth-to-space interleave and return the c-major
    s-CELL representation (N, out/s.., O*prod(s)) directly — valid when
    every output extent divides its stride (so no phase-row trim cuts
    inside a cell). This is the zero-relayout producer for a consumer that
    runs in the s2d execution space (ops/s2d_space.py channel order).
    """
    n = kernel.ndim - 2
    ks = kernel.shape[:n]
    s = tuple(strides)
    p = tuple(padding)
    op = tuple(output_padding)
    in_sp = x.shape[1:n + 1]

    out = [(in_sp[i] - 1) * s[i] - 2 * p[i] + ks[i] + op[i] for i in range(n)]
    q = [-(-out[i] // s[i]) for i in range(n)]          # phase rows

    pads = []
    for i in range(n):
        _, _, L, W = _phase_plan(ks[i], s[i], p[i])
        right = q[i] - 1 + W - L - in_sp[i]
        pads.append((L, max(0, right)))

    if cells_out:
        assert all(out[i] % s[i] == 0 for i in range(n)), \
            f"cells_out needs output extents {out} divisible by strides {s}"

    kt = transform_kernel(kernel, s, p, cells_major=cells_out).astype(x.dtype)
    if n > 3:
        raise ValueError(f"polyphase_conv_transpose supports rank <= 3, got {n}")
    spatial = "DHW"[3 - n:]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kt.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    y = jax.lax.conv_general_dilated(x, kt, (1,) * n, pads,
                                     dimension_numbers=dn)
    y = y[tuple([slice(None)] + [slice(0, q[i]) for i in range(n)])]
    if cells_out:
        return y
    y = depth_to_space(y, s)
    return y[tuple([slice(None)] + [slice(0, out[i]) for i in range(n)])]
