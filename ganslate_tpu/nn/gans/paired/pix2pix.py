"""Pix2Pix conditional GAN (Isola et al., CVPR 2017) as one fused train step.

Algorithm parity with the reference
(/root/reference/ganslate/nn/gans/paired/pix2pix.py): networks G and D; the
discriminator is conditioned on the input by channel-concatenating real_A
with the (real or fake) B image; per iteration — G update with frozen D
(adversarial + lambda*L1), then D update against `stop_gradient`ed fakes;
D loss = loss_real + loss_fake; no image pool.

TPU redesign: identical to CycleGAN's — a single jit-compiled pure function,
gradients via closures, data parallelism via the sharded batch.
"""

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ganslate_tpu import configs
from ganslate_tpu.nn.gans.base import BaseGAN, GANState
from ganslate_tpu.nn.losses.adversarial_loss import AdversarialLoss
from ganslate_tpu.nn.losses.pix2pix_losses import Pix2PixLoss


@dataclass
class OptimizerConfig(configs.base.BaseOptimizerConfig):
    """Pix2Pix optimizer config."""
    lambda_pix2pix: float = 100.0


@dataclass
class Pix2PixConditionalGANConfig(configs.base.BaseGANConfig):
    """Pix2Pix config."""
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)


class Pix2PixConditionalGAN(BaseGAN):

    def __init__(self, conf):
        super().__init__(conf)
        network_names = ["G", "D"] if self.is_train else ["G"]
        self.networks = {name: None for name in network_names}
        self.network_groups = {"G": ["G"], "D": ["D"]}

    def init_criterions(self):
        self.criterion_adv = AdversarialLoss(
            self.conf.train.gan.optimizer.adversarial_loss_type)
        self.criterion_pix2pix = Pix2PixLoss(self.conf)

    def init_optimizers(self):
        optimizer_conf = self.conf.train.gan.optimizer
        self.optimizers = {
            "G": self.make_adam(optimizer_conf.lr_G),
            "D": self.make_adam(optimizer_conf.lr_D),
        }

    def init_state_pools(self, batch_spec) -> Dict[str, Any]:
        return {}

    def _dummy_input(self, name: str, batch_spec):
        """D sees cat([A, B]) along channels (conditional discriminator)."""
        if name == "D":
            a, b = batch_spec["A"], batch_spec["B"]
            shape = (*a.shape[:-1], a.shape[-1] + b.shape[-1])
            return jnp.zeros(shape, a.dtype)
        return super()._dummy_input(name, batch_spec)

    def make_train_step(self):
        apply = self.apply
        apply_batched = self.apply_batched
        criterion_adv = self.criterion_adv
        criterion_pix2pix = self.criterion_pix2pix
        training_metrics = self.training_metrics
        opt_G, opt_D = self.optimizers["G"], self.optimizers["D"]

        def g_loss(params_G, params_D, real_A, real_B, key):
            k_g, k_d = jax.random.split(key)
            fake_B = apply("G", params_G["G"], real_A, rng=k_g)
            pred = apply("D", params_D["D"],
                         jnp.concatenate([real_A, fake_B], axis=-1), rng=k_d)
            losses = {
                "G": criterion_adv(pred, target_is_real=True),
                "pix2pix": criterion_pix2pix(fake_B, real_B),
            }
            total = losses["G"] + losses["pix2pix"]
            return total, (losses, {"real_A": real_A, "fake_B": fake_B,
                                    "real_B": real_B})

        def d_loss(params_D, real_A, real_B, fake_B, key):
            pred_real, pred_fake = apply_batched(
                "D", params_D["D"],
                [jnp.concatenate([real_A, real_B], axis=-1),
                 jnp.concatenate([real_A, fake_B], axis=-1)], rng=key)
            loss = (criterion_adv(pred_real, True) + criterion_adv(pred_fake, False))
            return loss, (pred_real, pred_fake)

        def train_step(state: GANState, batch):
            real_A, real_B = batch["A"], batch["B"]
            rng, k_G, k_D = jax.random.split(state.rng, 3)

            params_G = self.group_params(state.params, "G")
            params_D = self.group_params(state.params, "D")

            (_, (losses_G, visuals)), grads_G = jax.value_and_grad(
                g_loss, has_aux=True)(params_G, params_D, real_A, real_B, k_G)
            updates_G, opt_state_G = opt_G.update(grads_G, state.opt_state["G"], params_G)
            params_G = optax.apply_updates(params_G, updates_G)

            fake_B = jax.lax.stop_gradient(visuals["fake_B"])
            (loss_D, (pred_real, pred_fake)), grads_D = jax.value_and_grad(
                d_loss, has_aux=True)(params_D, real_A, real_B, fake_B, k_D)
            updates_D, opt_state_D = opt_D.update(grads_D, state.opt_state["D"], params_D)
            params_D = optax.apply_updates(params_D, updates_D)

            metrics = {}
            metrics.update(training_metrics.compute_metrics_G(visuals))
            metrics.update(training_metrics.compute_metrics_D("D", pred_real, pred_fake))

            new_state = state.replace(
                step=state.step + 1,
                params={**params_G, **params_D},
                opt_state={"G": opt_state_G, "D": opt_state_D},
                pools={},
                rng=rng,
            )
            logs = {
                "losses": {**losses_G, "D": loss_D},
                "visuals": {k: v.astype(jnp.float32) for k, v in visuals.items()},
                "metrics": metrics,
            }
            return new_state, logs

        return train_step

    def infer(self, x, direction="AB"):
        assert direction == "AB", "Pix2Pix only translates A->B."
        return super().infer(x, direction)
