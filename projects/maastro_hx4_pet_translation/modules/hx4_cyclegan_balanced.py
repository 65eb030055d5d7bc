"""Balanced CycleGAN for HX4-PET synthesis — custom training algorithm.

Port of /root/reference/projects/maastro_hx4_pet_translation/modules/
hx4_cyclegan_balanced.py, demonstrating the TPU framework's extension
contract: a project subclasses CycleGAN and overrides `make_train_step` (the
reference overrode forward/backward_D/backward_G), plus the dummy-input
spec and pools for its asymmetric channel layout.

Notation: A = [FDG-PET, pCT] (2ch), B = [HX4-PET, ldCT] (2ch in data,
generators emit 1ch PET); discriminators judge only the PET channel; cycle
losses apply only to PET channels; CT channels are passed through as
conditioning.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ganslate_tpu.data.utils.image_pool import init_pool, query_pool
from ganslate_tpu.nn.gans.base import GANState
from ganslate_tpu.nn.gans.unpaired import cyclegan
from ganslate_tpu.nn.losses.adversarial_loss import AdversarialLoss

from .hx4_cyclegan_balanced_losses import HX4CycleGANBalancedLosses


@dataclass
class HX4CycleGANBalancedConfig(cyclegan.CycleGANConfig):
    """HX4CycleGANBalanced config."""
    pass


class HX4CycleGANBalanced(cyclegan.CycleGAN):

    def init_criterions(self):
        self.criterion_adv = AdversarialLoss(
            self.conf.train.gan.optimizer.adversarial_loss_type)
        self.criterion_G = HX4CycleGANBalancedLosses(self.conf)

    def _dummy_input(self, name, batch_spec):
        """Ds see 1-channel PET; generators see the 2-channel domains."""
        if name.startswith("D"):
            spec = batch_spec["A" if name.endswith("_A") else "B"]
            return jnp.zeros((*spec.shape[:-1], 1), spec.dtype)
        return super()._dummy_input(name, batch_spec)

    def init_state_pools(self, batch_spec):
        # Pools hold the 1-channel PET fakes the discriminators consume.
        shape = (*batch_spec["B"].shape[1:-1], 1)
        return {
            "fake_B": init_pool(self.pool_size, shape, self.compute_dtype),
            "fake_A": init_pool(self.pool_size, shape, self.compute_dtype),
        }

    def make_train_step(self):
        apply = self.apply
        criterion_adv = self.criterion_adv
        criterion_G = self.criterion_G
        training_metrics = self.training_metrics
        opt_G, opt_D = self.optimizers["G"], self.optimizers["D"]

        def g_loss(params_G, params_D, real_A, real_B, key):
            ks = jax.random.split(key, 6)
            # Forward cycle: [fake HX4-PET] from [FDG-PET, pCT]; reconstruct
            # FDG-PET from [fake HX4-PET, real pCT].
            fake_B1 = apply("G_AB", params_G["G_AB"], real_A, rng=ks[0])
            real_A2 = real_A[..., 1:]  # pCT
            rec_A1 = apply("G_BA", params_G["G_BA"],
                           jnp.concatenate([fake_B1, real_A2], axis=-1),
                           rng=ks[1])

            # Backward cycle with [HX4-PET, ldCT].
            fake_A1 = apply("G_BA", params_G["G_BA"], real_B, rng=ks[2])
            real_B2 = real_B[..., 1:]  # ldCT
            rec_B1 = apply("G_AB", params_G["G_AB"],
                           jnp.concatenate([fake_A1, real_B2], axis=-1),
                           rng=ks[3])

            # Fill the CT channel of fakes/recs with zeros so the visuals
            # have the same channel split as the reals (logging contract).
            zeros_dummy = jnp.zeros_like(real_A2)
            visuals = {
                "real_A": real_A, "real_B": real_B,
                "fake_B": jnp.concatenate([fake_B1, zeros_dummy], axis=-1),
                "rec_A": jnp.concatenate([rec_A1, zeros_dummy], axis=-1),
                "fake_A": jnp.concatenate([fake_A1, zeros_dummy], axis=-1),
                "rec_B": jnp.concatenate([rec_B1, zeros_dummy], axis=-1),
            }

            pred_B = apply("D_B", params_D["D_B"], fake_B1, rng=ks[4])
            pred_A = apply("D_A", params_D["D_A"], fake_A1, rng=ks[5])
            losses = {
                "G_AB": criterion_adv(pred_B, target_is_real=True),
                "G_BA": criterion_adv(pred_A, target_is_real=True),
            }
            losses.update(criterion_G(visuals))
            total = sum(jax.tree_util.tree_leaves(losses), jnp.float32(0))
            return total, (losses, visuals)

        def d_loss(params_D, real_A1, real_B1, fake_A1, fake_B1, key):
            ks = jax.random.split(key, 4)
            preds = {
                "real_B": apply("D_B", params_D["D_B"], real_B1, rng=ks[0]),
                "fake_B": apply("D_B", params_D["D_B"], fake_B1, rng=ks[1]),
                "real_A": apply("D_A", params_D["D_A"], real_A1, rng=ks[2]),
                "fake_A": apply("D_A", params_D["D_A"], fake_A1, rng=ks[3]),
            }
            loss_D_B = (criterion_adv(preds["real_B"], True) +
                        criterion_adv(preds["fake_B"], False))
            loss_D_A = (criterion_adv(preds["real_A"], True) +
                        criterion_adv(preds["fake_A"], False))
            return loss_D_B + loss_D_A, ({"D_B": loss_D_B, "D_A": loss_D_A}, preds)

        def train_step(state: GANState, batch):
            real_A, real_B = batch["A"], batch["B"]
            rng, k_pool_B, k_pool_A, k_G, k_D = jax.random.split(state.rng, 5)

            params_G = self.group_params(state.params, "G")
            params_D = self.group_params(state.params, "D")

            (_, (losses_G, visuals)), grads_G = jax.value_and_grad(
                g_loss, has_aux=True)(params_G, params_D, real_A, real_B, k_G)
            updates_G, opt_state_G = opt_G.update(grads_G, state.opt_state["G"], params_G)
            params_G = optax.apply_updates(params_G, updates_G)

            # Pools + D step only on the PET channel.
            fake_B1 = jax.lax.stop_gradient(visuals["fake_B"][..., :1])
            fake_A1 = jax.lax.stop_gradient(visuals["fake_A"][..., :1])
            pool_B, fake_B_pooled = query_pool(state.pools["fake_B"], fake_B1, k_pool_B)
            pool_A, fake_A_pooled = query_pool(state.pools["fake_A"], fake_A1, k_pool_A)

            (_, (losses_D, preds)), grads_D = jax.value_and_grad(
                d_loss, has_aux=True)(params_D, real_A[..., :1], real_B[..., :1],
                                      fake_A_pooled, fake_B_pooled, k_D)
            updates_D, opt_state_D = opt_D.update(grads_D, state.opt_state["D"], params_D)
            params_D = optax.apply_updates(params_D, updates_D)

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

    def get_pure_infer(self, direction="AB"):
        """Generator emits 1ch PET; pad a zero CT channel to match visuals."""
        name = f"G_{direction}"
        assert name in self.networks
        key = f"pure_hx4_{name}"
        if key not in self._infer_fns:
            module = self.networks[name]
            dtype = self.compute_dtype

            def fn(params, x):
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
                fake_B1 = module.apply({"params": p}, x.astype(dtype))
                zeros_dummy = jnp.zeros_like(x[..., 1:]).astype(fake_B1.dtype)
                return jnp.concatenate([fake_B1, zeros_dummy],
                                       axis=-1).astype(jnp.float32)

            self._infer_fns[key] = fn
        return self._infer_fns[key], self.state.params[name]

    def infer(self, x, direction="AB"):
        assert direction in ("AB", "BA"), \
            "Specify which generator direction, AB or BA, to use."
        fn, params = self.get_pure_infer(direction)
        jitted_key = f"jit_hx4_G_{direction}"
        if jitted_key not in self._infer_fns:
            self._infer_fns[jitted_key] = jax.jit(fn)
        return self._infer_fns[jitted_key](params, x)
