"""Verification of the invertible-coupling core (nn/invertible.py) — the
riskiest math in the framework (RevGAN/Piresnet/V-Net depend on it):

1. gradient equality: `use_memory_saving=True` (recompute-by-inverse custom
   VJP) must produce the SAME gradients as `use_memory_saving=False` (plain
   jax.grad through a stored-activation scan), in both directions;
2. memory: with memory saving, backprop temp memory must stay ~flat as
   n_blocks grows (only the sequence output is saved); without it, temp
   memory must grow with depth (closes SURVEY §7 build-order item 6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu.nn.invertible import InvertibleSequence
from ganslate_tpu.nn.layers import Conv

CHANNELS = 8


class _NormFreeBlock(nn.Module):
    """conv+tanh half-block without instance norm: the framework's instance
    norm computes in fp32 regardless of x64 mode, so exact float64 gradient
    comparison needs a norm-free block."""
    features: int

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, (3, 3), padding=1, name="conv")(x)
        return jnp.tanh(h)


def _make(n_blocks, use_memory_saving, norm_free=False):
    template = _NormFreeBlock(CHANNELS // 2) if norm_free else None
    return InvertibleSequence(channels=CHANNELS, n_blocks=n_blocks,
                              spatial_dims=2,
                              use_memory_saving=use_memory_saving,
                              block_template=template)


def _params(module):
    x = jnp.zeros((1, 8, 8, CHANNELS), jnp.float32)
    return jax.jit(module.init)(jax.random.key(0), x)


def _grads(module, variables, x, inverse):
    def loss(params, x):
        y = module.apply(params, x, inverse=inverse)
        return jnp.sum(jnp.square(y))

    return jax.jit(jax.grad(loss, argnums=(0, 1)))(variables, x)


@pytest.mark.parametrize("inverse", [False, True])
def test_gradients_exact_in_float64(inverse, rng):
    """Recompute-by-inverse VJP == plain backprop to machine precision
    (float64, norm-free block — isolates the coupling math itself)."""
    with jax.enable_x64():
        mem = _make(3, True, norm_free=True)
        plain = _make(3, False, norm_free=True)
        x0 = jnp.zeros((1, 8, 8, CHANNELS), jnp.float64)
        variables = jax.jit(mem.init)(jax.random.key(0), x0)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        x = jnp.asarray(rng.normal(size=(2, 12, 12, CHANNELS)))

        g_mem = _grads(mem, variables, x, inverse)
        g_plain = _grads(plain, variables, x, inverse)

        for a, b in zip(jax.tree_util.tree_leaves(g_mem),
                        jax.tree_util.tree_leaves(g_plain)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12, rtol=1e-12)


@pytest.mark.parametrize("inverse", [False, True])
def test_gradients_match_plain_backprop(inverse, rng):
    """Production block (instance norm, fp32): gradients match plain backprop
    within fp32 reconstruction noise (norm stats amplify ~1e-7 inversion
    error; the f64 test above pins the math exactly)."""
    mem = _make(3, True)
    plain = _make(3, False)
    variables = _params(mem)  # same param structure/name for both variants
    x = jnp.asarray(rng.normal(size=(2, 12, 12, CHANNELS)).astype(np.float32))

    g_mem = _grads(mem, variables, x, inverse)
    g_plain = _grads(plain, variables, x, inverse)

    for a, b in zip(jax.tree_util.tree_leaves(g_mem),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("use_memory_saving", [False, True])
def test_forward_inverse_roundtrip(use_memory_saving, rng):
    module = _make(4, use_memory_saving)
    variables = _params(module)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, CHANNELS)).astype(np.float32))
    fwd = jax.jit(lambda v, x: module.apply(v, x))
    inv = jax.jit(lambda v, y: module.apply(v, y, inverse=True))
    y = fwd(variables, x)
    x_rec = inv(variables, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               atol=1e-4, rtol=1e-4)
    assert not np.allclose(np.asarray(y), np.asarray(x))


def _backprop_temp_bytes(n_blocks, use_memory_saving):
    module = _make(n_blocks, use_memory_saving)
    variables = jax.eval_shape(module.init, jax.random.key(0),
                               jnp.zeros((1, 8, 8, CHANNELS), jnp.float32))
    x = jax.ShapeDtypeStruct((1, 64, 64, CHANNELS), jnp.float32)

    def loss(params, x):
        return jnp.sum(jnp.square(module.apply(params, x)))

    compiled = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(variables, x).compile()
    return compiled.memory_analysis().temp_size_in_bytes


def test_memory_constant_backprop():
    """Temp memory vs depth: ~flat with memory saving, growing without."""
    shallow_mem = _backprop_temp_bytes(2, True)
    deep_mem = _backprop_temp_bytes(12, True)
    shallow_plain = _backprop_temp_bytes(2, False)
    deep_plain = _backprop_temp_bytes(12, False)

    # Plain backprop stores activations for every block: 6x depth should
    # cost at least 2x the temp memory.
    assert deep_plain > 2.0 * shallow_plain, (shallow_plain, deep_plain)
    # Recompute-by-inverse keeps residuals O(1) in depth (allow slack for
    # per-block gradient workspace).
    assert deep_mem < 1.5 * shallow_mem, (shallow_mem, deep_mem)
    assert deep_mem < deep_plain
