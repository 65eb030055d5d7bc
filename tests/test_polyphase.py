"""Polyphase transposed-conv: exactness vs the lhs-dilated form.

The polyphase path (ops/polyphase_transpose.py) must be bit-comparable to
`lax.conv_general_dilated(lhs_dilation=s)` for every transpose-conv geometry
in the network zoo (Resnet/U-Net up k3 s2 p1 op1; V-Net up k2 s2;
separable 3D pairs) — it is the default implementation inside
`nn.layers.ConvTranspose`, so checkpoints and the torch importer must be
unaffected.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.nn.layers import ConvTranspose
from ganslate_tpu.ops.polyphase_transpose import polyphase_conv_transpose


def _dilated(x, kernel, s, p, op):
    n = kernel.ndim - 2
    k = kernel.shape[:n]
    pads = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(n)]
    spatial = "DHW"[3 - n:]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    return jax.lax.conv_general_dilated(x, kernel, (1,) * n, pads,
                                        lhs_dilation=s, dimension_numbers=dn)


CASES = [
    # (spatial, C, O, k, s, p, op)
    ((9, 7), 3, 5, (3, 3), (2, 2), (1, 1), (1, 1)),     # Resnet/U-Net up
    ((8, 8), 4, 6, (4, 4), (2, 2), (1, 1), (0, 0)),     # U-Net inner k4
    ((6, 5, 7), 3, 4, (2, 2, 2), (2, 2, 2), (0, 0, 0), (0, 0, 0)),  # V-Net up
    ((6, 5, 7), 3, 4, (3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1)),
    ((5, 6), 2, 3, (5, 5), (3, 3), (2, 2), (1, 1)),     # odd geometry
    ((5, 5), 2, 3, (7, 7), (4, 4), (0, 0), (3, 3)),     # k > 2s, output_padding
    ((10,), 2, 2, (6,), (2,), (4,), (0,)),              # padding > k - s
    ((12, 3), 2, 2, (3, 2), (2, 3), (1, 0), (0, 2)),    # mixed per-dim
]


@pytest.mark.parametrize("sp,C,O,k,s,p,op", CASES)
def test_polyphase_matches_dilated(rng, sp, C, O, k, s, p, op):
    x = jnp.asarray(rng.normal(size=(2, *sp, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(*k, C, O)).astype(np.float32))

    @jax.jit
    def both(x, w):
        a = _dilated(x, w, s, p, op)
        b = polyphase_conv_transpose(x, w, s, p, op)
        return a, b

    a, b = both(x, w)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_polyphase_gradients_match_dilated(rng):
    s, p, op = (2, 2), (1, 1), (1, 1)
    x = jnp.asarray(rng.normal(size=(2, 9, 7, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))

    @jax.jit
    def grads(x, w):
        gw1 = jax.grad(lambda w: jnp.sum(jnp.sin(_dilated(x, w, s, p, op))))(w)
        gw2 = jax.grad(lambda w: jnp.sum(
            jnp.sin(polyphase_conv_transpose(x, w, s, p, op))))(w)
        gx1 = jax.grad(lambda x: jnp.sum(jnp.cos(_dilated(x, w, s, p, op))))(x)
        gx2 = jax.grad(lambda x: jnp.sum(
            jnp.cos(polyphase_conv_transpose(x, w, s, p, op))))(x)
        return gw1, gw2, gx1, gx2

    gw1, gw2, gx1, gx2 = grads(x, w)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)


def test_conv_transpose_module_flag_equivalence(rng):
    """ConvTranspose(polyphase=True) == ConvTranspose(polyphase=False) with
    the SAME canonical kernel parameter (checkpoint compatibility)."""
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 6)).astype(np.float32))
    m_poly = ConvTranspose(features=4, kernel_size=(3, 3), strides=2,
                           padding=1, output_padding=1, polyphase=True)
    m_dil = ConvTranspose(features=4, kernel_size=(3, 3), strides=2,
                          padding=1, output_padding=1, polyphase=False)

    @jax.jit
    def run(x):
        params = m_poly.init(jax.random.key(0), x)
        return (m_poly.apply(params, x), m_dil.apply(params, x))

    a, b = run(x)
    assert a.shape == (2, 20, 20, 4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
