"""PatchNCE contrastive loss (CUT, Park et al. ECCV 2020).

Reference parity: /root/reference/ganslate/nn/losses/cut_losses.py — positive
logit = <q_i, k_i> per patch; negatives = all other patches of the same image
(diagonal masked to -10); cross-entropy at temperature nce_T with the positive
as class 0; per-patch losses returned (caller means them).

The (B, P, C) x (B, C, P) patch-similarity matmuls land on the MXU; keys are
`stop_gradient`ed (reference detaches feat_k).
"""

import jax
import jax.numpy as jnp


class PatchNCELoss:

    def __init__(self, conf):
        self.batch_size = conf.train.batch_size
        self.nce_T = conf.train.gan.optimizer.nce_T

    def __call__(self, feat_q: jax.Array, feat_k: jax.Array) -> jax.Array:
        """feat_q/feat_k: (B*P, C) L2-normalized patch embeddings; returns
        per-patch loss vector (B*P,)."""
        n, dim = feat_q.shape
        feat_q = feat_q.astype(jnp.float32)
        feat_k = jax.lax.stop_gradient(feat_k.astype(jnp.float32))

        # Positive logits: <q_i, k_i>.
        l_pos = jnp.sum(feat_q * feat_k, axis=-1, keepdims=True)  # (B*P, 1)

        # Negative logits: patch-vs-patch within each image.
        b = self.batch_size
        q = feat_q.reshape(b, -1, dim)
        k = feat_k.reshape(b, -1, dim)
        num_patches = q.shape[1]
        l_neg = jnp.einsum("bpc,bqc->bpq", q, k,
                           preferred_element_type=jnp.float32)
        diagonal = jnp.eye(num_patches, dtype=bool)[None]
        l_neg = jnp.where(diagonal, -10.0, l_neg).reshape(-1, num_patches)

        logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.nce_T
        # Cross-entropy with target class 0 (the positive).
        return -jax.nn.log_softmax(logits, axis=1)[:, 0]
