"""Pix2Pix pixel-wise loss: lambda * L1(fake_B, real_B).
Reference parity: /root/reference/ganslate/nn/losses/pix2pix_losses.py."""

import jax.numpy as jnp


class Pix2PixLoss:

    def __init__(self, conf):
        self.lambda_pix2pix = conf.train.gan.optimizer.lambda_pix2pix

    def __call__(self, fake_B, real_B):
        l1 = jnp.mean(jnp.abs(fake_B.astype(jnp.float32) - real_B.astype(jnp.float32)))
        return self.lambda_pix2pix * l1
