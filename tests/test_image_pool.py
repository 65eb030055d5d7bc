"""Device ImagePool tests: reference 50/50 semantics
(/root/reference/ganslate/data/utils/image_pool.py:24-60) under jit."""

import jax
import jax.numpy as jnp
import numpy as np

from ganslate_tpu.data.utils.image_pool import init_pool, query_pool


def test_pool_fills_then_swaps():
    pool = init_pool(4, (2, 2, 1))
    key = jax.random.key(0)

    # While not full, every queried image is stored and returned unchanged.
    imgs = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1) * jnp.ones((4, 2, 2, 1))
    pool, out = jax.jit(query_pool)(pool, imgs, key)
    assert int(pool.count) == 4
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(pool.images), np.asarray(imgs))

    # Once full: each output is either the input image or a stored one; and
    # whenever a stored image is returned, the input must have replaced it.
    new = 100 + jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1) * jnp.ones((4, 2, 2, 1))
    pool2, out2 = jax.jit(query_pool)(pool, new, jax.random.key(1))
    assert int(pool2.count) == 4
    for i in range(4):
        v = float(out2[i, 0, 0, 0])
        assert v in [float(new[i, 0, 0, 0])] + [0.0, 1.0, 2.0, 3.0]


def test_pool_statistics():
    """Over many queries on a full pool, ~50% should return history."""
    pool = init_pool(8, (1,))
    pool, _ = query_pool(pool, jnp.zeros((8, 1)), jax.random.key(0))  # fill with 0s

    returned_history = 0
    total = 0
    q = jax.jit(query_pool)
    for i in range(50):
        value = float(i + 1)  # unique value per query
        imgs = jnp.full((4, 1), value)
        pool, out = q(pool, imgs, jax.random.key(i + 1))
        # history images are the ones that aren't the current input value
        returned_history += int(np.sum(np.asarray(out) != value))
        total += 4
    frac = returned_history / total
    assert 0.25 < frac < 0.75


def test_pool_size_zero_is_identity():
    pool = init_pool(0, (2,))
    imgs = jnp.ones((3, 2))
    pool, out = query_pool(pool, imgs, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
