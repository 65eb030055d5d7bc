"""Discriminator history buffer (ImagePool), device-resident and jittable.

The reference ImagePool (/root/reference/ganslate/data/utils/image_pool.py)
is host Python with host RNG: per generated image, if the 50-image buffer is
not yet full the image is stored and returned; otherwise with p=0.5 the image
is returned as-is, else a random stored image is returned and replaced by the
new one. It decorrelates discriminator updates from the latest generator.

TPU-native version: the pool is a fixed-shape ring buffer carried inside the
jitted train state, updated with keyed `jax.random` — the whole train
iteration stays a single compiled program with no host round-trip. The
per-image sequential semantics are preserved with a `lax.scan` over the batch
(trip count = per-step batch, tiny).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


class PoolState(struct.PyTreeNode):
    images: jax.Array  # (pool_size, *image_shape)
    count: jax.Array   # scalar int32, number of valid entries


def init_pool(pool_size: int, image_shape: Tuple[int, ...],
              dtype=jnp.float32) -> PoolState:
    return PoolState(
        images=jnp.zeros((pool_size, *image_shape), dtype=dtype),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def query_pool(pool: PoolState, images: jax.Array, rng: jax.Array
               ) -> Tuple[PoolState, jax.Array]:
    """Push a batch of generated images through the pool; returns the updated
    pool and the images the discriminator should see.

    pool_size == 0 (images field with leading dim 0) degrades to identity,
    matching the reference's `pool_size=0` behavior.
    """
    pool_size = pool.images.shape[0]
    if pool_size == 0:
        return pool, images

    keys = jax.random.split(rng, images.shape[0])

    def body(carry, inp):
        buf, count = carry
        img, key = inp
        k_p, k_idx = jax.random.split(key)
        is_full = count >= pool_size
        use_history = jnp.logical_and(is_full, jax.random.uniform(k_p) > 0.5)
        rand_idx = jax.random.randint(k_idx, (), 0, pool_size)

        returned = jnp.where(use_history, buf[rand_idx], img)

        # Write when (not full: append at `count`) or (full & use_history:
        # replace `rand_idx`); skip the write when full & returning the input.
        write_idx = jnp.where(is_full, rand_idx, count)
        do_write = jnp.logical_or(jnp.logical_not(is_full), use_history)
        new_val = jnp.where(do_write, img, buf[write_idx])
        buf = buf.at[write_idx].set(new_val)

        count = count + jnp.where(is_full, 0, 1).astype(count.dtype)
        return (buf, count), returned

    (buf, count), returned = jax.lax.scan(
        body, (pool.images, pool.count), (images.astype(pool.images.dtype), keys))
    return PoolState(images=buf, count=count), returned.astype(images.dtype)
