"""CUT / FastCUT (Park et al., ECCV 2020) as one fused TPU train step.

Algorithm parity with the reference (/root/reference/ganslate/nn/gans/
unpaired/cut.py): networks G, D and a per-level FeaturePatchMLP; per
iteration — D update first (on current fakes, detached), then a joint G+MLP
update with adversarial loss + PatchNCE between encoder features of real_A
and fake_B (identity-NCE on real_B/idt_B weighted in via lambda_nce_idt);
shared random patch ids between the source and target MLP passes;
FastCUT's optional flip-equivariance regularization.

TPU redesign of the reference's shape-dynamic machinery:
- encoder channels per NCE layer are probed with `jax.eval_shape` (free,
  static) instead of a dummy forward (reference cut.py:315-333);
- per-layer patch selection uses keyed `jax.random.permutation` with a
  STATIC patch count (min(num_patches, positions) resolved at trace time),
  replacing host `randperm` (reference cut.py:259-272);
- the flip branch is a `jnp.where` select on a traced bernoulli, not Python
  control flow, so one compiled program covers both.
"""

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ganslate_tpu import configs
from ganslate_tpu.nn.gans.base import BaseGAN, GANState
from ganslate_tpu.nn.layers import make_initializer
from ganslate_tpu.nn.losses.adversarial_loss import AdversarialLoss
from ganslate_tpu.nn.losses.cut_losses import PatchNCELoss


@dataclass
class OptimizerConfig(configs.base.BaseOptimizerConfig):
    """CUT optimizer config."""
    # Weight for adversarial loss Adv(G(X)).
    lambda_adv: float = 1
    # Weight for NCE loss NCE(G(X), X).
    lambda_nce: float = 1
    # Weight for identity-mapping NCE loss NCE(G(Y), Y), mixed with lambda_nce.
    lambda_nce_idt: float = 0.5
    # Temperature for NCE loss.
    nce_T: float = 0.07


@dataclass
class CUTConfig(configs.base.BaseGANConfig):
    """CUT config."""
    # Encoder layers for the NCE loss; 0 denotes the (padded) input itself.
    nce_layers: Tuple[int] = (0, 4, 8, 12, 16)
    # Width of the projection MLP.
    mlp_nc: int = 256
    # Number of patches per layer.
    num_patches: int = 256
    # Flip-equivariance regularization (FastCUT uses it, CUT does not).
    use_equivariance_flip: bool = False
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)


class FeaturePatchMLP(nn.Module):
    """Per-NCE-layer 2-layer projection MLP + L2 normalization (reference
    parity: cut.py:229-282). Patch selection happens OUTSIDE (pure indexing
    in the train step); this module only owns parameters."""
    channels_per_feature: Tuple[int, ...]
    nc: int = 256
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        """feats: list of (N, C_l) patch matrices; returns list of (N, nc)
        L2-normalized embeddings."""
        init = make_initializer(self.weight_init_type, self.weight_init_gain)
        out = []
        for i, feat in enumerate(feats):
            h = nn.Dense(self.nc, kernel_init=init, name=f"mlp{i}_fc1")(feat)
            h = nn.relu(h)
            h = nn.Dense(self.nc, kernel_init=init, name=f"mlp{i}_fc2")(h)
            norm = jnp.sqrt(jnp.sum(jnp.square(h), axis=-1, keepdims=True))
            out.append(h / (norm + 1e-7))
        return out


def flatten_spatial(feat: jax.Array) -> jax.Array:
    """(B, *spatial, C) -> (B, F, C)."""
    return feat.reshape(feat.shape[0], -1, feat.shape[-1])


class CUT(BaseGAN):

    def __init__(self, conf):
        super().__init__(conf)

        gan_conf = conf.train.gan if self.is_train else None
        if self.is_train:
            optimizer_conf = gan_conf.optimizer
            self.lambda_adv = optimizer_conf.lambda_adv
            self.lambda_nce = optimizer_conf.lambda_nce
            self.lambda_nce_idt = optimizer_conf.lambda_nce_idt
            self.nce_layers = tuple(gan_conf.nce_layers)
            self.num_patches = gan_conf.num_patches
            self.use_equivariance_flip = gan_conf.use_equivariance_flip

        network_names = ["G", "D", "mlp"] if self.is_train else ["G"]
        self.networks = {name: None for name in network_names}
        self.network_groups = {"G": ["G"], "D": ["D"], "mlp": ["mlp"]}

    # -------------------------------------------------------------- networks

    def init_networks(self):
        super().init_networks()
        if self.is_train:
            # Drop NCE layer indices beyond the generator's tap count (the
            # reference silently truncated these through a zip; we warn).
            max_levels = getattr(self.networks["G"], "num_feature_levels", None)
            if max_levels is not None:
                valid = tuple(l for l in self.nce_layers if l < max_levels)
                if valid != self.nce_layers:
                    import logging
                    logging.getLogger(__name__).warning(
                        f"nce_layers {self.nce_layers} exceed the generator's "
                        f"{max_levels} feature taps; using {valid}.")
                    self.nce_layers = valid
            channels = self._probe_network_channels()
            self._nce_feat_channels = channels
            self.networks["mlp"] = FeaturePatchMLP(
                channels_per_feature=channels,
                nc=self.conf.train.gan.mlp_nc,
                weight_init_type=self.conf.train.gan.weight_init_type,
                weight_init_gain=self.conf.train.gan.weight_init_gain,
            )

    def _probe_network_channels(self) -> Tuple[int, ...]:
        """Channel widths at each NCE layer via abstract evaluation — no
        compute, replaces the reference's dummy forward (cut.py:315-333)."""
        module = self.networks["G"]
        in_channels = int(self.conf.train.gan.generator.in_out_channels.AB[0])
        spatial_dims = getattr(module, "spatial_dims", 2)
        spatial = (16, 64, 64) if spatial_dims == 3 else (64, 64)
        x = jax.ShapeDtypeStruct((1, *spatial, in_channels), jnp.float32)

        def probe(x):
            variables = module.init(jax.random.key(0), jnp.zeros(x.shape, x.dtype),
                                    extract_features=list(self.nce_layers))
            feats = module.apply(variables, jnp.zeros(x.shape, x.dtype),
                                 extract_features=list(self.nce_layers))
            return feats

        feats = jax.eval_shape(probe, x)
        return tuple(int(f.shape[-1]) for f in feats)

    def _dummy_input(self, name: str, batch_spec):
        if name == "mlp":
            return [jnp.zeros((self.num_patches, c), jnp.float32)
                    for c in self._nce_feat_channels]
        return super()._dummy_input(name, batch_spec)

    # ----------------------------------------------------------- components

    def init_criterions(self):
        self.criterion_adv = AdversarialLoss(
            self.conf.train.gan.optimizer.adversarial_loss_type)
        self.criterion_nce = [PatchNCELoss(self.conf) for _ in self.nce_layers]

    def init_optimizers(self):
        optimizer_conf = self.conf.train.gan.optimizer
        self.optimizers = {
            "G": self.make_adam(optimizer_conf.lr_G),
            "D": self.make_adam(optimizer_conf.lr_D),
            "mlp": self.make_adam(optimizer_conf.lr_G),
        }

    def init_state_pools(self, batch_spec) -> Dict[str, Any]:
        return {}

    # ------------------------------------------------------- the train step

    def make_train_step(self):
        apply = self.apply
        apply_batched = self.apply_batched
        criterion_adv = self.criterion_adv
        criterion_nce = self.criterion_nce
        nce_layers = list(self.nce_layers)
        num_patches = self.num_patches
        lambda_adv = self.lambda_adv
        lambda_nce = self.lambda_nce
        lambda_nce_idt = self.lambda_nce_idt
        use_flip = self.use_equivariance_flip
        use_idt = lambda_nce_idt > 0
        training_metrics = self.training_metrics
        opts = self.optimizers
        mlp_module = self.networks["mlp"]

        def extract(params_G, x, key=None):
            return apply("G", params_G, x, rng=key, extract_features=nce_layers)

        def mlp_apply(params_mlp, feats):
            return mlp_module.apply({"params": params_mlp}, feats)

        def sample_patch_ids(rng, feats):
            """One shared permutation per level (shared across source/target
            and across the batch, as in the reference)."""
            keys = jax.random.split(rng, len(feats))
            ids = []
            for key, f in zip(keys, feats):
                positions = int(np.prod(f.shape[1:-1]))
                n = min(num_patches, positions)
                ids.append(jax.random.permutation(key, positions)[:n])
            return ids

        def select_patches(feats, patch_ids):
            out = []
            for f, ids in zip(feats, patch_ids):
                flat = flatten_spatial(f)           # (B, F, C)
                sel = jnp.take(flat, ids, axis=1)   # (B, P, C)
                out.append(sel.reshape(-1, sel.shape[-1]).astype(jnp.float32))
            return out

        def nce_loss(params_G, params_mlp, source, target, patch_ids, flip, key):
            k_src, k_tgt = jax.random.split(key)
            source_feats = extract(params_G, source, k_src)
            target_feats = extract(params_G, target, k_tgt)
            if use_flip:
                # Flip target features back (W axis) when inputs were flipped.
                target_feats = [jnp.where(flip, f[..., ::-1, :], f)
                                for f in target_feats]
            source_pool = mlp_apply(params_mlp, select_patches(source_feats, patch_ids))
            target_pool = mlp_apply(params_mlp, select_patches(target_feats, patch_ids))

            total = jnp.float32(0)
            for tgt, src, criterion in zip(target_pool, source_pool, criterion_nce):
                total = total + jnp.mean(criterion(tgt, src)) * lambda_nce
            return total / len(nce_layers)

        def d_loss(params_D, real_B, fake_B, key):
            pred_real, pred_fake = apply_batched(
                "D", params_D["D"], [real_B, fake_B], rng=key)
            loss = criterion_adv(pred_real, True) + criterion_adv(pred_fake, False)
            return loss, (pred_real, pred_fake)

        def g_mlp_loss(params, params_D, real_A, real_B, patch_ids, idt_ids,
                       flip, key):
            ks = jax.random.split(key, 5)
            params_G, params_mlp = params["G"], params["mlp"]
            fake_B = apply("G", params_G, real_A, rng=ks[0])
            idt_B = apply("G", params_G, real_B, rng=ks[1]) if use_idt else None

            losses = {}
            total = jnp.float32(0)
            if lambda_adv > 0:
                pred_fake = apply("D", params_D["D"], fake_B, rng=ks[2])
                losses["G"] = criterion_adv(pred_fake, True) * lambda_adv
                total = total + losses["G"]

            if lambda_nce > 0:
                loss_nce = nce_loss(params_G, params_mlp, real_A, fake_B,
                                    patch_ids, flip, ks[3])
                losses["NCE"] = loss_nce
                if use_idt:
                    loss_nce_idt = lambda_nce_idt * nce_loss(
                        params_G, params_mlp, real_B, idt_B, idt_ids, flip, ks[4])
                    losses["NCE_idt"] = loss_nce_idt
                    loss_nce = (1 - lambda_nce_idt) * loss_nce + loss_nce_idt
                total = total + loss_nce

            visuals = {"real_A": real_A, "fake_B": fake_B, "real_B": real_B}
            if use_idt:
                visuals["idt_B"] = idt_B
            return total, (losses, visuals)

        def train_step(state: GANState, batch):
            real_A, real_B = batch["A"], batch["B"]
            rng, k_flip, k_patch, k_idt, k_fake, k_D, k_G = \
                jax.random.split(state.rng, 7)

            # FastCUT flip-equivariance: one bernoulli flips the whole batch.
            flip = jnp.zeros((), bool)
            if use_flip:
                flip = jax.random.bernoulli(k_flip)
                real_A = jnp.where(flip, real_A[..., ::-1, :], real_A)
                if use_idt:
                    real_B = jnp.where(flip, real_B[..., ::-1, :], real_B)

            params_G = self.group_params(state.params, "G")
            params_D = self.group_params(state.params, "D")
            params_mlp = self.group_params(state.params, "mlp")

            # ---- D update FIRST (reference order, cut.py:115-121).
            fake_B_detached = jax.lax.stop_gradient(
                apply("G", params_G["G"], real_A, rng=k_fake))
            (loss_D, (pred_real, pred_fake)), grads_D = jax.value_and_grad(
                d_loss, has_aux=True)(params_D, real_B, fake_B_detached, k_D)
            updates_D, opt_state_D = opts["D"].update(grads_D, state.opt_state["D"],
                                                      params_D)
            params_D = optax.apply_updates(params_D, updates_D)

            # ---- Joint G + MLP update against the UPDATED D.
            feats = extract(params_G["G"], real_A)
            patch_ids = sample_patch_ids(k_patch, feats)
            idt_ids = sample_patch_ids(k_idt, feats) if use_idt else None

            params_gm = {"G": params_G["G"], "mlp": params_mlp["mlp"]}
            (_, (losses_G, visuals)), grads = jax.value_and_grad(
                g_mlp_loss, has_aux=True)(params_gm, params_D, real_A, real_B,
                                          patch_ids, idt_ids, flip, k_G)
            updates_G, opt_state_G = opts["G"].update(
                {"G": grads["G"]}, state.opt_state["G"], {"G": params_gm["G"]})
            new_G = optax.apply_updates({"G": params_gm["G"]}, updates_G)
            updates_mlp, opt_state_mlp = opts["mlp"].update(
                {"mlp": grads["mlp"]}, state.opt_state["mlp"],
                {"mlp": params_gm["mlp"]})
            new_mlp = optax.apply_updates({"mlp": params_gm["mlp"]}, updates_mlp)

            metrics = {}
            metrics.update(training_metrics.compute_metrics_G(visuals))
            metrics.update(training_metrics.compute_metrics_D("D", pred_real, pred_fake))

            new_state = state.replace(
                step=state.step + 1,
                params={**new_G, **params_D, **new_mlp},
                opt_state={"G": opt_state_G, "D": opt_state_D, "mlp": opt_state_mlp},
                pools={},
                rng=rng,
            )
            logs = {
                "losses": {"D": loss_D, **losses_G},
                "visuals": {k: v.astype(jnp.float32) for k, v in visuals.items()},
                "metrics": metrics,
            }
            return new_state, logs

        return train_step

    def infer(self, x, direction="AB"):
        assert direction == "AB", "CUT only translates A->B."
        return super().infer(x, direction)
