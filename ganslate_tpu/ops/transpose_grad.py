"""Reverse-free gradients for lhs-dilated (transposed) convolutions.

XLA's autodiff of `conv_general_dilated(x, K, lhs_dilation=s)` orients the
kernel-gradient correlation by REVERSING the output gradient — a full-tensor
`lax.rev` materialization per kernel grad (traced 0.82 ms x4 on the
CycleGAN-256 up convs, `tools/attribute_train.py`). Both gradients have
reverse-free forms (validated bit-exact against `jax.vjp`,
tests/test_multistep.py::test_convtranspose_grads_exact):

- kernel grad: a conv with batch as the contraction — lhs = x arranged
  (C, *spatial, N) with lhs_dilation=s, rhs = g arranged (*spatial, N, O);
  the tap offset is a PADDING shift, not a reversal.
- data grad: a stride-s conv of g with the kernel spatially reversed —
  the rev lands on the (k.., C, O) KERNEL (a few KB), not the activation.

Derivation (1-D, pad_lo = A): y[m, o] = sum_u xd[m + u - A, c] K[u, c, o]
with xd = x dilated by s. Then
  dK[u, c, o] = sum_{N, m} xd[m + u - A, c] g[m, o]      (offset A -> padding)
  dx[j, c]    = sum_v g[s j + v - (k-1-A), o] K[k-1-v, c, o]   (rev on K only)
"""

from functools import partial
from typing import Tuple

import jax
from jax import lax

# Gated by flags.transpose_custom_grad (OFF by default: measured NEUTRAL on
# both consumers — 74.0 vs 74.3 img/s on the fused CycleGAN-256 step
# (interleaved A/B) and 541.5 vs 540.4 ms on the 3D s2d V-Net gradient —
# XLA's materialized reverses are paid back by its better-scheduled
# kernel-grad conv, and the batch-as-contraction dK conv here costs what
# the rev saves. Kept because it is bit-exact-tested and one flag
# re-measures it on future XLA versions). See ganslate_tpu/flags.py.


def _dn(lhs_shape, rhs_shape, n: int):
    spatial = "DHW"[3 - n:]
    return lax.conv_dimension_numbers(
        lhs_shape, rhs_shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))


def _raw(x, kernel, s, pads):
    n = x.ndim - 2
    return lax.conv_general_dilated(
        x, kernel, (1,) * n, pads, lhs_dilation=s,
        dimension_numbers=_dn(x.shape, kernel.shape, n))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dilated_conv_transpose(x: jax.Array, kernel: jax.Array,
                           s: Tuple[int, ...],
                           pads: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """`lax.conv_general_dilated(x, kernel, 1, pads, lhs_dilation=s)` with
    reverse-free custom gradients (module docstring). `pads` may be any
    static per-dim (lo, hi) — the torch ConvTranspose geometry and the s2d
    execution-space up convs both lower through here."""
    return _raw(x, kernel, s, pads)


def _fwd(x, kernel, s, pads):
    return _raw(x, kernel, s, pads), (x, kernel)


def _bwd(s, pads, res, g):
    x, kernel = res
    n = x.ndim - 2
    k = kernel.shape[:n]

    # Kernel grad: batch contracts; the pad_lo offset rides the padding.
    perm_in = (x.ndim - 1, *range(1, x.ndim - 1), 0)        # (C, *sp, N)
    perm_g = (*range(1, x.ndim - 1), 0, x.ndim - 1)         # (*sp, N, O)
    j_dil = [(x.shape[1 + i] - 1) * s[i] + 1 for i in range(n)]
    pads_k = [(pads[i][0],
               k[i] - 1 + g.shape[1 + i] - j_dil[i] - pads[i][0])
              for i in range(n)]
    lhs = x.transpose(perm_in)
    rhs = g.transpose(perm_g)
    dk = lax.conv_general_dilated(
        lhs, rhs, (1,) * n, pads_k, lhs_dilation=s,
        dimension_numbers=_dn(lhs.shape, rhs.shape, n))      # (C, *k, O)
    dk = dk.transpose((*range(1, n + 1), 0, n + 1))          # (*k, C, O)

    # Data grad: a stride-s conv of g with the (tiny) kernel reversed.
    krev = lax.rev(kernel, tuple(range(n)))
    krev = krev.swapaxes(-1, -2)                             # (*k, O, C)
    pads_x = []
    for i in range(n):
        lo = k[i] - 1 - pads[i][0]
        hi = (s[i] * (x.shape[1 + i] - 1) + k[i] - 1 - lo
              - g.shape[1 + i] + 1)
        pads_x.append((lo, hi))
    dx = lax.conv_general_dilated(
        g, krev, s, pads_x,
        dimension_numbers=_dn(g.shape, krev.shape, n))
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


dilated_conv_transpose.defvjp(_fwd, _bwd)


def conv_transpose_dilated(x: jax.Array, kernel: jax.Array,
                           s: Tuple[int, ...], p: Tuple[int, ...],
                           op: Tuple[int, ...]) -> jax.Array:
    """Torch ConvTranspose geometry: out = (in-1)s - 2p + k + op."""
    n = x.ndim - 2
    k = kernel.shape[:n]
    pads = tuple((k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(n))
    return dilated_conv_transpose(x, kernel, tuple(s), pads)
