"""CycleGAN-balanced for multimodal RGB+geometry translation (v3).

Port of /root/reference/projects/cleargrasp_depth_estimation/modules/
cyclegan_multimodal_v3.py to the TPU framework's extension contract (the
custom graph lives in an overridden `make_train_step`).

Notation: A = [rgb_A (3ch), normalmap (3ch)], B = [rgb_B (3ch), depthmap
(1ch)] (B is just depthmap (1ch) outside the balanced variant). G_AB emits a
depthmap conditioned on RGB; G_BA emits a normalmap; cycles reuse the real
RGB as conditioning; discriminators judge only the geometry channels.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ganslate_tpu.data.utils.image_pool import init_pool, query_pool
from ganslate_tpu.nn.gans.base import GANState
from ganslate_tpu.nn.gans.unpaired import cyclegan
from ganslate_tpu.nn.losses.adversarial_loss import AdversarialLoss

from .cyclegan_losses_for_v3 import CycleGANLossesForV3


@dataclass
class CycleGANMultiModalV3Config(cyclegan.CycleGANConfig):
    """CycleGANMultiModalV3 config."""
    pass


class CycleGANMultiModalV3(cyclegan.CycleGAN):

    def init_criterions(self):
        self.criterion_adv = AdversarialLoss(
            self.conf.train.gan.optimizer.adversarial_loss_type)
        self.criterion_G = CycleGANLossesForV3(self.conf)

    def _dummy_input(self, name, batch_spec):
        """D_B sees the 1ch depthmap, D_A the 3ch normalmap."""
        if name == "D_B":
            spec = batch_spec["B"]
            return jnp.zeros((*spec.shape[:-1], 1), spec.dtype)
        if name == "D_A":
            spec = batch_spec["A"]
            return jnp.zeros((*spec.shape[:-1], 3), spec.dtype)
        return super()._dummy_input(name, batch_spec)

    def init_state_pools(self, batch_spec):
        spatial = batch_spec["B"].shape[1:-1]
        return {
            "fake_B": init_pool(self.pool_size, (*spatial, 1), self.compute_dtype),
            "fake_A": init_pool(self.pool_size, (*spatial, 3), self.compute_dtype),
        }

    def make_train_step(self):
        apply = self.apply
        criterion_adv = self.criterion_adv
        criterion_G = self.criterion_G
        training_metrics = self.training_metrics
        opt_G, opt_D = self.optimizers["G"], self.optimizers["D"]

        def g_loss(params_G, params_D, real_A, real_B, key):
            ks = jax.random.split(key, 6)
            # Forward: depthmap from [rgb_A, normalmap]; reconstruct the
            # normalmap from [rgb_A, fake depthmap].
            fake_B2 = apply("G_AB", params_G["G_AB"], real_A, rng=ks[0])
            real_A1 = real_A[..., :3]  # rgb_A
            rec_A2 = apply("G_BA", params_G["G_BA"],
                           jnp.concatenate([real_A1, fake_B2], axis=-1), rng=ks[1])

            # Backward: normalmap from [rgb_B, depthmap]; reconstruct depth.
            fake_A2 = apply("G_BA", params_G["G_BA"], real_B, rng=ks[2])
            real_B1 = real_B[..., :3]  # rgb_B
            rec_B2 = apply("G_AB", params_G["G_AB"],
                           jnp.concatenate([real_B1, fake_A2], axis=-1), rng=ks[3])

            # Zero-fill the RGB channels of fakes/recs (logging contract).
            dummy = jnp.zeros_like(real_A1)
            visuals = {
                "real_A": real_A, "real_B": real_B,
                "fake_B": jnp.concatenate([dummy, fake_B2], axis=-1),
                "rec_A": jnp.concatenate([dummy, rec_A2], axis=-1),
                "fake_A": jnp.concatenate([dummy, fake_A2], axis=-1),
                "rec_B": jnp.concatenate([dummy, rec_B2], axis=-1),
            }

            pred_B = apply("D_B", params_D["D_B"], fake_B2, rng=ks[4])
            pred_A = apply("D_A", params_D["D_A"], fake_A2, rng=ks[5])
            losses = {
                "G_AB": criterion_adv(pred_B, target_is_real=True),
                "G_BA": criterion_adv(pred_A, target_is_real=True),
            }
            losses.update(criterion_G(visuals))
            total = sum(jax.tree_util.tree_leaves(losses), jnp.float32(0))
            return total, (losses, visuals)

        def d_loss(params_D, real_A2, real_B2, fake_A2, fake_B2, key):
            ks = jax.random.split(key, 4)
            preds = {
                "real_B": apply("D_B", params_D["D_B"], real_B2, rng=ks[0]),
                "fake_B": apply("D_B", params_D["D_B"], fake_B2, rng=ks[1]),
                "real_A": apply("D_A", params_D["D_A"], real_A2, rng=ks[2]),
                "fake_A": apply("D_A", params_D["D_A"], fake_A2, rng=ks[3]),
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

            fake_B2 = jax.lax.stop_gradient(visuals["fake_B"][..., 3:])
            fake_A2 = jax.lax.stop_gradient(visuals["fake_A"][..., 3:])
            pool_B, fake_B_pooled = query_pool(state.pools["fake_B"], fake_B2, k_pool_B)
            pool_A, fake_A_pooled = query_pool(state.pools["fake_A"], fake_A2, k_pool_A)

            (_, (losses_D, preds)), grads_D = jax.value_and_grad(
                d_loss, has_aux=True)(params_D, real_A[..., 3:], real_B[..., 3:],
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
        """Generator emits geometry; pad zero RGB channels to match visuals."""
        name = f"G_{direction}"
        assert name in self.networks
        key = f"pure_v3_{name}"
        if key not in self._infer_fns:
            module = self.networks[name]
            dtype = self.compute_dtype

            def fn(params, x):
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
                fake = module.apply({"params": p}, x.astype(dtype))
                dummy = jnp.zeros_like(x[..., :3]).astype(fake.dtype)
                return jnp.concatenate([dummy, fake], axis=-1).astype(jnp.float32)

            self._infer_fns[key] = fn
        return self._infer_fns[key], self.state.params[name]

    def infer(self, x, direction="AB"):
        assert direction in ("AB", "BA"), \
            "Specify which generator direction, AB or BA, to use."
        fn, params = self.get_pure_infer(direction)
        jitted_key = f"jit_v3_G_{direction}"
        if jitted_key not in self._infer_fns:
            self._infer_fns[jitted_key] = jax.jit(fn)
        return self._infer_fns[jitted_key](params, x)
