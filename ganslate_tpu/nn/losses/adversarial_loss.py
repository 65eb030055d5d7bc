"""Adversarial (GAN) objectives as pure JAX functions.

Reference parity: /root/reference/ganslate/nn/losses/adversarial_loss.py —
modes lsgan (MSE), vanilla (BCE-with-logits), wgangp (signed mean),
nonsaturating (softplus); dict-of-predictions averaged (multiscale Ds).
Discriminators output raw logits; no sigmoid anywhere.

All losses computed in fp32 regardless of the bf16 compute policy.
"""

import jax
import jax.numpy as jnp

_MODES = ("lsgan", "vanilla", "wgangp", "nonsaturating")


class AdversarialLoss:
    """Callable matching the reference interface:
    ``loss = criterion_adv(prediction, target_is_real)``."""

    def __init__(self, gan_mode: str, target_real_label: float = 1.0,
                 target_fake_label: float = 0.0):
        if gan_mode not in _MODES:
            raise NotImplementedError(f"GAN mode {gan_mode} not implemented.")
        self.gan_mode = gan_mode
        self.real_label = target_real_label
        self.fake_label = target_fake_label

    def _calculate(self, prediction: jax.Array, target_is_real: bool) -> jax.Array:
        pred = prediction.astype(jnp.float32)
        if self.gan_mode == "lsgan":
            target = self.real_label if target_is_real else self.fake_label
            return jnp.mean(jnp.square(pred - target))
        if self.gan_mode == "vanilla":
            target = self.real_label if target_is_real else self.fake_label
            # BCE with logits: max(x,0) - x*t + log(1 + exp(-|x|))
            return jnp.mean(
                jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
        if self.gan_mode == "wgangp":
            return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        # nonsaturating
        logits = -pred if target_is_real else pred
        return jnp.mean(jax.nn.softplus(logits))

    def __call__(self, prediction, target_is_real: bool) -> jax.Array:
        if isinstance(prediction, dict):
            losses = [self._calculate(p, target_is_real) for p in prediction.values()]
            return jnp.mean(jnp.stack(losses))
        return self._calculate(prediction, target_is_real)
