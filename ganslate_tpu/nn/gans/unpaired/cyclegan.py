"""CycleGAN (Zhu et al., ICCV 2017) as one fused TPU train step.

Algorithm parity with the reference
(/root/reference/ganslate/nn/gans/unpaired/cyclegan.py): networks G_AB, G_BA,
D_B, D_A; Adam pair over {G_AB,G_BA} and {D_B,D_A}; per iteration —
forward both cycles (+ identity when λ_idt > 0), G update with frozen Ds
(adversarial + cycle + identity losses), then D updates against
ImagePool-queried stale fakes; D loss = loss_real + loss_fake.

TPU redesign: the whole iteration is ONE pure function compiled by XLA —
the G gradient is taken with D params closed over as constants (the
reference's `set_requires_grad(D, False)`), the D gradient sees
`stop_gradient`ed pooled fakes (the reference's `.detach()`), and the image
pools are device-resident ring buffers inside the train state. Update order
(G first, then D on pre-update fakes) matches the reference exactly.
"""

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ganslate_tpu import configs
from ganslate_tpu.data.utils.image_pool import init_pool, query_pool
from ganslate_tpu.nn.gans.base import BaseGAN, GANState
from ganslate_tpu.nn.losses.adversarial_loss import AdversarialLoss
from ganslate_tpu.nn.losses.cyclegan_losses import CycleGANLosses


@dataclass
class OptimizerConfig(configs.base.BaseOptimizerConfig):
    """CycleGAN optimizer config."""
    lambda_AB: float = 10.0
    lambda_BA: float = 10.0
    lambda_identity: float = 0
    proportion_ssim: float = 0.84


@dataclass
class CycleGANConfig(configs.base.BaseGANConfig):
    """CycleGAN config."""
    pool_size: int = 50
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)


class CycleGAN(BaseGAN):

    def __init__(self, conf):
        super().__init__(conf)

        network_names = ["G_AB", "G_BA", "D_B", "D_A"] if self.is_train else ["G_AB"]
        self.networks = {name: None for name in network_names}
        self.network_groups = {"G": ["G_AB", "G_BA"], "D": ["D_B", "D_A"]}
        self.pool_size = conf.train.gan.pool_size if self.is_train else 0

    def init_criterions(self):
        self.criterion_adv = AdversarialLoss(
            self.conf.train.gan.optimizer.adversarial_loss_type)
        self.criterion_G = CycleGANLosses(self.conf)

    def init_optimizers(self):
        optimizer_conf = self.conf.train.gan.optimizer
        self.optimizers = {
            "G": self.make_adam(optimizer_conf.lr_G),
            "D": self.make_adam(optimizer_conf.lr_D),
        }

    def init_state_pools(self, batch_spec) -> Dict[str, Any]:
        pool_dtype = self.compute_dtype
        return {
            "fake_B": init_pool(self.pool_size, batch_spec["B"].shape[1:], pool_dtype),
            "fake_A": init_pool(self.pool_size, batch_spec["A"].shape[1:], pool_dtype),
        }

    # ------------------------------------------------------- the train step

    def make_train_step(self):
        apply = self.apply
        apply_batched = self.apply_batched
        criterion_adv = self.criterion_adv
        criterion_G = self.criterion_G
        use_identity = criterion_G.is_using_identity()
        training_metrics = self.training_metrics
        opt_G, opt_D = self.optimizers["G"], self.optimizers["D"]

        apply_paired = self.apply_paired

        def g_forward_and_loss(params_G, params_D, real_A, real_B, key):
            """All generator forwards + the full G objective. `key` drives
            train-time stochasticity (dropout / multiscale-D crops) with a
            distinct subkey per apply site, matching the reference's fresh
            randomness on every module call in train mode.

            Each G/G and D/D pair runs as ONE stacked-weights pass
            (BaseGAN.apply_paired): the two translation directions are
            data-independent stage by stage — {G_AB(A), G_BA(B)}, then
            {G_BA(fake_B), G_AB(fake_A)} — so the symmetric networks
            execute as doubled-batch grouped convs instead of twice the
            fusion count."""
            ks = jax.random.split(key, 4)
            # Fixed (G_AB, G_BA) stacking order at every site so XLA CSEs
            # the param stack to a single materialization.
            fake_B, fake_A = apply_paired(
                ("G_AB", "G_BA"), params_G, (real_A, real_B), rng=ks[0])
            rec_B, rec_A = apply_paired(
                ("G_AB", "G_BA"), params_G, (fake_A, fake_B), rng=ks[1])

            visuals = {"real_A": real_A, "fake_B": fake_B, "rec_A": rec_A,
                       "real_B": real_B, "fake_A": fake_A, "rec_B": rec_B}
            if use_identity:
                visuals["idt_B"], visuals["idt_A"] = apply_paired(
                    ("G_AB", "G_BA"), params_G, (real_B, real_A), rng=ks[2])

            # Adversarial: fool frozen discriminators.
            pred_B, pred_A = apply_paired(
                ("D_B", "D_A"), params_D, (fake_B, fake_A), rng=ks[3])
            losses = {
                "G_AB": criterion_adv(pred_B, target_is_real=True),
                "G_BA": criterion_adv(pred_A, target_is_real=True),
            }
            losses.update(criterion_G(visuals))
            total = sum(jax.tree_util.tree_leaves(losses), jnp.float32(0))
            return total, (losses, visuals)

        def d_loss(params_D, real_A, real_B, fake_A, fake_B, key):
            """Both discriminator objectives against pooled (stale) fakes.
            Real/fake run as one batched D forward when exact
            (BaseGAN.apply_batched), and the D_B/D_A pair additionally runs
            as one stacked-weights pass (BaseGAN.apply_paired) — the whole
            D update is then a SINGLE network execution at 4x batch."""
            m_B, m_A = self.networks["D_B"], self.networks["D_A"]
            if self._batch_fusable(m_B) and self._pair_fusable(m_B, m_A):
                b = real_B.shape[0]
                out_B, out_A = apply_paired(
                    ("D_B", "D_A"), params_D,
                    (jnp.concatenate([real_B, fake_B], axis=0),
                     jnp.concatenate([real_A, fake_A], axis=0)))
                pred_real_B, pred_fake_B = out_B[:b], out_B[b:]
                pred_real_A, pred_fake_A = out_A[:b], out_A[b:]
            else:
                ks = jax.random.split(key, 2)
                pred_real_B, pred_fake_B = apply_batched(
                    "D_B", params_D["D_B"], [real_B, fake_B], rng=ks[0])
                pred_real_A, pred_fake_A = apply_batched(
                    "D_A", params_D["D_A"], [real_A, fake_A], rng=ks[1])
            preds = {"real_B": pred_real_B, "fake_B": pred_fake_B,
                     "real_A": pred_real_A, "fake_A": pred_fake_A}
            loss_D_B = (criterion_adv(preds["real_B"], True) +
                        criterion_adv(preds["fake_B"], False))
            loss_D_A = (criterion_adv(preds["real_A"], True) +
                        criterion_adv(preds["fake_A"], False))
            return loss_D_B + loss_D_A, ({"D_B": loss_D_B, "D_A": loss_D_A}, preds)

        def train_step(state: GANState, batch):
            real_A = batch["A"]
            real_B = batch["B"]
            rng, k_pool_B, k_pool_A, k_G, k_D = jax.random.split(state.rng, 5)

            params_G = self.group_params(state.params, "G")
            params_D = self.group_params(state.params, "D")

            # ---- G update (D params are constants: no grads flow to them).
            (_, (losses_G, visuals)), grads_G = jax.value_and_grad(
                g_forward_and_loss, has_aux=True)(params_G, params_D, real_A,
                                                  real_B, k_G)
            updates_G, opt_state_G = opt_G.update(grads_G, state.opt_state["G"], params_G)
            params_G = optax.apply_updates(params_G, updates_G)

            # ---- Pool query with pre-update fakes (reference order).
            fake_B = jax.lax.stop_gradient(visuals["fake_B"])
            fake_A = jax.lax.stop_gradient(visuals["fake_A"])
            pool_B, fake_B_pooled = query_pool(state.pools["fake_B"], fake_B, k_pool_B)
            pool_A, fake_A_pooled = query_pool(state.pools["fake_A"], fake_A, k_pool_A)

            # ---- D update.
            (_, (losses_D, preds)), grads_D = jax.value_and_grad(
                d_loss, has_aux=True)(params_D, real_A, real_B,
                                      fake_A_pooled, fake_B_pooled, k_D)
            updates_D, opt_state_D = opt_D.update(grads_D, state.opt_state["D"], params_D)
            params_D = optax.apply_updates(params_D, updates_D)

            # ---- Metrics (cheap fused VPU ops; config-gated at trace time).
            metrics = {}
            metrics.update(training_metrics.compute_metrics_G(visuals))
            metrics.update(training_metrics.compute_metrics_D(
                "D_B", preds["real_B"], preds["fake_B"]))
            metrics.update(training_metrics.compute_metrics_D(
                "D_A", preds["real_A"], preds["fake_A"]))

            new_state = state.replace(
                step=state.step + 1,
                params={**params_G, **params_D},
                opt_state={"G": opt_state_G, "D": opt_state_D},
                pools={"fake_B": pool_B, "fake_A": pool_A},
                rng=rng,
            )
            logs = {
                "losses": {**losses_G, **losses_D},
                "visuals": {k: v.astype(jnp.float32) for k, v in visuals.items()},
                "metrics": metrics,
            }
            return new_state, logs

        return train_step

    def infer(self, x, direction="AB"):
        assert direction in ("AB", "BA"), \
            "Specify which generator direction, AB or BA, to use."
        return super().infer(x, direction)
