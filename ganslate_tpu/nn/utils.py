"""NN-level utilities: LR schedules and common re-exports.

Reference parity: /root/reference/ganslate/nn/utils.py. Weight init and norm
factories live in `ganslate_tpu.nn.layers`; this module adds the LR schedule,
which in JAX is a pure `step -> lr` function consumed by optax (the reference
used LambdaLR stepped every iteration, nn/utils.py:83-99).
"""

from ganslate_tpu.nn.layers import (get_norm_layer, is_bias_before_norm,  # noqa: F401
                                    make_initializer)


def make_lr_lambda(n_iters: int, n_iters_decay: int, load_iter: int = 0):
    """Multiplier schedule: 1.0 for the first `n_iters` iterations, then linear
    decay to ~0 over `n_iters_decay` iterations; continuing runs offset by
    `load_iter` (reference parity: nn/utils.py:91-97).

    Clamped at 0 past the horizon: the reference's LambdaLR formula goes
    NEGATIVE after `n_iters + n_iters_decay` (its Trainer loop just never
    reaches that region), and a negative LR is silent gradient ascent —
    measured to blow a CycleGAN up within ~50 steps. Driving the jitted
    step past the configured horizon freezes the parameters instead."""

    def lr_lambda(iter_idx):
        import jax.numpy as jnp
        start_iter = 1 + (load_iter or 0)
        progress = iter_idx + start_iter - n_iters
        return jnp.maximum(
            0.0, 1.0 - jnp.maximum(0.0, progress) / float(n_iters_decay + 1))

    return lr_lambda


def make_lr_schedule(base_lr: float, n_iters: int, n_iters_decay: int, load_iter: int = 0):
    """optax-style schedule: step -> learning rate."""
    lr_lambda = make_lr_lambda(n_iters, n_iters_decay, load_iter)

    def schedule(step):
        return base_lr * lr_lambda(step)

    return schedule
