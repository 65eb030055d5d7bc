"""Invertible (additive-coupling) blocks with memory-constant backprop.

The reference wraps memcnn's AdditiveCoupling + InvertibleModuleWrapper
(/root/reference/ganslate/nn/invertible.py): y1 = x1 + F(x2),
y2 = x2 + G(y1); during backprop, inputs are reconstructed by inverting the
block instead of being stored — O(1) activation memory in network depth,
which is what RevGAN relies on to train deep 3D generators.

TPU-native design: the whole sequence of couplings is ONE `lax.scan` over
stacked per-block parameters, wrapped in a `jax.custom_vjp` whose backward
pass reconstructs activations block-by-block by running the INVERSE coupling
(a second reverse `lax.scan`). Only the sequence output is saved as a
residual — true recompute-by-inverse, not mere rematerialization. The same
machinery differentiates through the inverse direction (RevGAN's BA pass).

The half-block F is any pure `apply_fn(params, x_half)`; parameters for the
n blocks (each with independent F and G, matching memcnn's deepcopy) are
stacked on a leading axis so XLA compiles one block body.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu.nn.layers import (Conv, apply_norm_s2d, inert_bias,
                                    is_bias_before_norm)

from ganslate_tpu.flags import FLAGS

# Unroll policy (flags.scan_unroll / flags.plain_unroll_full):
# - memory-saving coupling sequences ride a lax.scan; unroll > 1 lets XLA
#   fuse across coupling blocks (and makes cost_analysis count every
#   block's FLOPs instead of one body) at the cost of compile time.
# - the plain (activation-storing) path fully unrolls instead: with
#   unroll=1 every coupling materializes its concat carry to HBM and XLA
#   cannot fuse the norm/PReLU/add chains across blocks. Sequences are 1-4
#   blocks, so the unrolled program is small — measured +27% on the
#   28-window s2d V-Net sliding-window forward (1.64 -> 2.09 vols/s,
#   tools/ab.py sw), and it COMPILES faster (58 vs 82 s).


def _split(x):
    half = x.shape[-1] // 2
    return x[..., :half], x[..., half:]


def _coupling_forward(apply_fn, p, x):
    x1, x2 = _split(x)
    y1 = x1 + apply_fn(p["F"], x2)
    y2 = x2 + apply_fn(p["G"], y1)
    return jnp.concatenate([y1, y2], axis=-1)


def _coupling_inverse(apply_fn, p, y):
    y1, y2 = _split(y)
    x2 = y2 - apply_fn(p["G"], y1)
    x1 = y1 - apply_fn(p["F"], x2)
    return jnp.concatenate([x1, x2], axis=-1)


def _make_sequence(apply_fn: Callable, reverse_params: bool):
    """Build the custom-vjp scan for one direction.

    reverse_params=False: forward couplings in order (the AB pass).
    reverse_params=True: inverse couplings in reverse order (the BA pass) —
    the exact functional inverse of the forward sequence.
    """
    step_fwd = _coupling_inverse if reverse_params else _coupling_forward
    step_inv = _coupling_forward if reverse_params else _coupling_inverse

    @jax.custom_vjp
    def sequence(params, x):
        def body(h, p):
            return step_fwd(apply_fn, p, h), None
        y, _ = jax.lax.scan(body, x, params, reverse=reverse_params,
                            unroll=FLAGS.scan_unroll)
        return y

    def fwd(params, x):
        y = sequence(params, x)
        return y, (params, y)  # save only the OUTPUT — O(1) activations

    def bwd(residuals, g):
        params, y = residuals

        def body(carry, p):
            h, gh = carry
            # Reconstruct this block's input by inversion...
            x = step_inv(apply_fn, p, h)
            # ...then differentiate the block at the reconstructed input.
            _, vjp = jax.vjp(partial(step_fwd, apply_fn), p, x)
            gp, gx = vjp(gh)
            return (x, gx), gp

        # Walk blocks in the opposite order of the forward scan.
        (_, gx), gparams = jax.lax.scan(body, (y, g), params,
                                        reverse=not reverse_params,
                                        unroll=FLAGS.scan_unroll)
        return gparams, gx

    sequence.defvjp(fwd, bwd)
    return sequence


class InvResidualBlock(nn.Module):
    """The half-width residual function inside each coupling: norm ->
    replication-padded k3 conv -> norm -> relu (reference parity:
    piresnet3d.py:_base_inv_block)."""
    features: int
    norm_type: str = "instance"
    pad_mode: str = "replicate"
    spatial_dims: int = 3
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        h = apply_norm_s2d(self.norm_type, x, self.features, self.s2d)
        h = Conv(self.features, (3,) * self.spatial_dims, padding=1,
                 pad_mode=self.pad_mode, use_bias=use_bias,
                 bias_inert=inert_bias(self.norm_type),
                 kernel_init=self.kernel_init, s2d_space=self.s2d,
                 name="conv")(h)
        h = apply_norm_s2d(self.norm_type, h, self.features, self.s2d)
        return nn.relu(h)


class InvertibleSequence(nn.Module):
    """A chain of additive couplings over channel-split features.

    `use_memory_saving=True` uses the recompute-by-inverse custom VJP;
    False falls back to plain scan (XLA stores activations) — the
    reference's `keep_input` switch.
    """
    channels: int           # full width; each branch sees channels // 2
    n_blocks: int
    norm_type: str = "instance"
    pad_mode: str = "replicate"
    spatial_dims: int = 3
    use_memory_saving: bool = True
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    # Custom half-width residual module (e.g. V-Net's conv5+norm+PReLU);
    # defaults to the Piresnet block.
    block_template: Optional[nn.Module] = None
    # c-major s2d execution space factor (ops/s2d_space.py): the channel
    # split of the coupling is lane-contiguous there, so the coupling math
    # is unchanged — only the init dummy must carry s2d-shaped features.
    s2d: int = 0

    def setup(self):
        half = self.channels // 2
        self.block = self.block_template if self.block_template is not None \
            else InvResidualBlock(half, self.norm_type, self.pad_mode,
                                  self.spatial_dims, self.kernel_init,
                                  s2d=self.s2d)
        if self.s2d > 1:
            rn = self.s2d ** self.spatial_dims
            dummy = jnp.zeros((1, *(8 // self.s2d,) * self.spatial_dims,
                               half * rn), jnp.float32)
        else:
            dummy = jnp.zeros((1, *(8,) * self.spatial_dims, half), jnp.float32)

        def init_stack(rng):
            def init_one(key):
                kf, kg = jax.random.split(key)
                return {"F": self.block.init(kf, dummy)["params"],
                        "G": self.block.init(kg, dummy)["params"]}
            return jax.vmap(init_one)(jax.random.split(rng, self.n_blocks))

        self.stacked = self.param("blocks", init_stack)

    def __call__(self, x, inverse: bool = False):
        def apply_fn(p, h):
            return self.block.apply({"params": p}, h.astype(x.dtype)).astype(x.dtype)

        if self.use_memory_saving:
            seq = _make_sequence(apply_fn, reverse_params=inverse)
            return seq(self.stacked, x)
        # Plain (activation-storing) path.
        unroll = self.n_blocks if FLAGS.plain_unroll_full else FLAGS.scan_unroll
        kt = self._stacked_s2d_kernels(x) if self.s2d > 1 else None
        if kt is not None:
            # Serving: thread the per-block transformed kernels through the
            # scan so the halves skip their k->kt gather chains.
            def apply_kt(pk, h):
                p, k = pk
                return self.block.apply(
                    {"params": p, "s2d_kernels": k},
                    h.astype(x.dtype)).astype(x.dtype)

            step = _coupling_inverse if inverse else _coupling_forward

            def body(h, pk):
                p, k = pk
                paired = {"F": (p["F"], k["F"]), "G": (p["G"], k["G"])}
                return step(apply_kt, paired, h), None

            y, _ = jax.lax.scan(body, x, (self.stacked, kt), reverse=inverse,
                                unroll=unroll)
            return y
        step = _coupling_inverse if inverse else _coupling_forward
        def body(h, p):
            return step(apply_fn, p, h), None
        y, _ = jax.lax.scan(body, x, self.stacked, reverse=inverse,
                            unroll=unroll)
        return y

    def _stacked_s2d_kernels(self, x):
        """Serving-time s2d kernel cache for the coupling halves.

        The halves run through raw ``block.apply`` inside the scan, so the
        enclosing apply's ``s2d_kernels`` collection never reaches their
        convs — they silently recomputed their kernel transforms every call
        (traced at ~90 ms on the 56-window V-Net sliding-window program,
        docs/benchmarks.md). This mirrors `layers._cached_kernel_transform`
        one level up: the prepare pass (``mutable=["s2d_kernels"]``) records
        a vmapped transform of the STACKED block params; ordinary serving
        applies read it back and thread per-block slices through the scan.
        Training applies (no collection supplied) are unchanged — the
        transforms stay inside the graph so gradients flow to the canonical
        kernels."""
        # During `init` every collection is mutable — treat that as "no
        # cache" so init output keeps the plain network's variable tree.
        mutable = (self.is_mutable_collection("s2d_kernels")
                   and not self.is_initializing())
        if self.has_variable("s2d_kernels", "kt") and not mutable:
            return self.get_variable("s2d_kernels", "kt")
        if not mutable:
            return None
        half = x.shape[-1] // 2
        dummy = jnp.zeros((*x.shape[:-1], half), x.dtype)

        def one(p):
            return self.block.apply({"params": p}, dummy,
                                    mutable=["s2d_kernels"])[1]["s2d_kernels"]

        kt = {"F": jax.vmap(one)(self.stacked["F"]),
              "G": jax.vmap(one)(self.stacked["G"])}
        self.put_variable("s2d_kernels", "kt", kt)
        return kt
