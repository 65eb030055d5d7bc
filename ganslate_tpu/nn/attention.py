"""SAGAN-style self-attention block, rank-generic and channels-last.

Reference parity: /root/reference/ganslate/nn/attention.py — 1x1(x1) q/k/v
convs (query/key at C//8 width), softmax attention over all flattened spatial
positions, learned zero-initialized gamma residual.

TPU notes: the (N, C/8) x (C/8, N) and (N, N) x (N, C) contractions are
expressed with einsum so XLA maps them straight onto the MXU; attention is
computed in fp32 (softmax in bf16 loses too much precision at large N).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class SelfAttentionBlock(nn.Module):
    in_dim: int
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, x):
        # x: (B, *spatial, C)
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        n = 1
        for s in spatial:
            n *= s

        k1 = (1,) * len(spatial)
        query = nn.Conv(max(c // 8, 1), k1, kernel_init=self.kernel_init,
                        name="query")(x)
        key = nn.Conv(max(c // 8, 1), k1, kernel_init=self.kernel_init,
                      name="key")(x)
        value = nn.Conv(c, k1, kernel_init=self.kernel_init, name="value")(x)

        q = query.reshape(x.shape[0], n, -1).astype(jnp.float32)
        k = key.reshape(x.shape[0], n, -1).astype(jnp.float32)
        v = value.reshape(x.shape[0], n, c).astype(jnp.float32)

        energy = jnp.einsum("bnc,bmc->bnm", q, k,
                            preferred_element_type=jnp.float32)
        attention = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attention, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(x.shape).astype(x.dtype)

        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x
