"""Rank-generic conv/norm building blocks, TPU-first.

Everything is channels-last (NHWC / NDHWC) — the layout XLA:TPU tiles best
onto the MXU. Convolutions use explicit torch-equivalent padding so that
(a) output shapes match the reference architectures exactly, and (b) a
torch-checkpoint importer can map weights one-to-one
(reference architectures: /root/reference/ganslate/nn/).

One implementation serves both 2D and 3D: the spatial rank is inferred from
``kernel_size``, which is how the whole generator/discriminator zoo avoids
the reference's duplicated *2d.py / *3d.py module pairs.
"""

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganslate_tpu.flags import FLAGS

Array = jax.Array


# ------------------------------------------------------------- initializers


def make_initializer(weight_init_type: str = "normal", gain: float = 0.02):
    """Kernel initializer matching the reference init menu
    (/root/reference/ganslate/nn/utils.py:13-36)."""
    if weight_init_type == "normal":
        return nn.initializers.normal(stddev=gain)
    if weight_init_type == "xavier":
        # std = gain * sqrt(2 / (fan_in + fan_out)) -> variance gain^2 / fan_avg
        return nn.initializers.variance_scaling(gain ** 2, "fan_avg", "normal")
    if weight_init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in)
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if weight_init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    raise NotImplementedError(f"initialization method `{weight_init_type}` is not implemented")


# ------------------------------------------------------------------ padding


def _to_tuple(v: Union[int, Sequence[int]], n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


_PAD_MODES = {"zeros": "constant", "reflect": "reflect", "replicate": "edge", "edge": "edge"}

# Perf switches read here (pad_custom_vjp, pad_fwd_onepass, bias_inert,
# polyphase_2d, transpose_custom_grad) live on the single flags surface —
# defaults, measured deltas, and scoping rules in ganslate_tpu/flags.py.


def inert_bias(norm_type: Optional[str]) -> bool:
    """True when a conv bias preceding this norm type is mathematically
    cancelled: (x+b) - mean(x+b) == x - mean(x) per (sample, channel), so
    the bias can be stop-gradiented (flags.bias_inert; the forward ADD is
    kept — the program stays byte-identical to the reference's, the bias
    just gets an exact zero gradient instead of ~1e-8 rounding noise).
    Only affine-less instance norm cancels; 'none' passes the bias through
    and 'batch' already drops use_bias."""
    return norm_type == "instance"


def pad_spatial(x: Array, pad: Sequence[int], mode: str = "zeros") -> Array:
    """Pad the spatial dims of a channels-last tensor (N, *spatial, C)."""
    if all(p == 0 for p in pad):
        return x
    if FLAGS.pad_custom_vjp and mode in ("reflect", "replicate", "edge") and all(
            x.shape[1 + i] >= 2 * p + 2 for i, p in enumerate(pad)):
        # Custom VJP: XLA lowers the autodiff transpose of the
        # concat-of-flipped-slices jnp.pad into a chain of full-tensor
        # slice+add fusions (~6 materializations of the padded tensor,
        # traced at 16.5 ms/step on the CycleGAN-256 stem/head reflect
        # pads, docs/benchmarks.md). The hand-written backward touches the
        # tensor once per axis. The size guard keeps the border source
        # regions disjoint (extent >= 2*pad + 2); smaller tensors take the
        # autodiff path.
        return _pad_spatial_ad(x, tuple(pad), mode)
    cfg = [(0, 0)] + [(p, p) for p in pad] + [(0, 0)]
    return jnp.pad(x, cfg, mode=_PAD_MODES[mode])


from functools import partial as _partial


# One-pass pad FORWARD (flags.pad_fwd_onepass): nested concat over 3^n
# source segments, every leaf a slice/flip of the ORIGINAL x, vs sequential
# per-axis concats. The per-axis form materializes the full tensor once PER
# PADDED AXIS because each axis's concat reads the previous axis's result;
# the nested form has no cross-axis data dependence, so XLA fuses the whole
# segment grid into ONE output write (the forward twin of the one-pass pad
# backward below, which measured +5.3% on the fused CycleGAN-256 step).
# Reflect and replicate are separable — padded[i, j] = x[refl(i), refl(j)]
# — so corner segments are just doubly-flipped slices.
@_partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pad_spatial_ad(x: Array, pad: Tuple[int, ...], mode: str) -> Array:
    if mode in ("reflect", "replicate", "edge") and FLAGS.pad_fwd_onepass:
        def border(sub, ax, p, n_ax, side):
            if mode == "reflect":
                lo_i, hi_i = (1, p + 1) if side == 0 else (n_ax - p - 1,
                                                           n_ax - 1)
                return jax.lax.rev(
                    jax.lax.slice_in_dim(sub, lo_i, hi_i, axis=ax), [ax])
            edge_i = 0 if side == 0 else n_ax - 1
            return jnp.repeat(
                jax.lax.slice_in_dim(sub, edge_i, edge_i + 1, axis=ax),
                p, axis=ax)

        def build(a, sub):
            if a == len(pad):
                return sub
            ax, p = a + 1, pad[a]
            if p == 0:
                return build(a + 1, sub)
            n_ax = sub.shape[ax]
            return jnp.concatenate(
                [build(a + 1, border(sub, ax, p, n_ax, 0)),
                 build(a + 1, sub),
                 build(a + 1, border(sub, ax, p, n_ax, 1))], axis=ax)

        return build(0, x)
    # Hand-rolled reflect (fallback): jnp.pad(mode="reflect") lowers through
    # a FULL-tensor lax.rev per padded axis (traced at 0.8 ms each on the
    # CycleGAN-256 stem pads) — reversing the p-row border strip first makes
    # the rev negligible and leaves one concat per axis.
    if mode == "reflect":
        for axis, p in enumerate(pad):
            ax = axis + 1
            if p == 0:
                continue
            n = x.shape[ax]
            lo = jax.lax.rev(jax.lax.slice_in_dim(x, 1, p + 1, axis=ax), [ax])
            hi = jax.lax.rev(jax.lax.slice_in_dim(x, n - p - 1, n - 1,
                                                  axis=ax), [ax])
            x = jnp.concatenate([lo, x, hi], axis=ax)
        return x
    cfg = [(0, 0)] + [(p, p) for p in pad] + [(0, 0)]
    return jnp.pad(x, cfg, mode=_PAD_MODES[mode])


def _pad_spatial_fwd(x, pad, mode):
    return _pad_spatial_ad(x, pad, mode), None


# One-pass N-D pad backward (flags.pad_bwd_onepass; nested concat) vs
# per-axis passes: the per-axis form materializes the full gradient once
# PER PADDED AXIS because each axis's segment sums feed the next axis's
# slices; the nested form has no cross-axis data dependence, so XLA fuses
# the whole segment grid into ONE output write.

def _pad_bwd_axis_segments(n: int, p: int, mode: str):
    """Per-axis transpose plan: list of (core_lo, core_hi, terms) where each
    term (src_lo, src_hi, kind) reads the PADDED gradient; kind in
    {'id', 'flip', 'sum'}. Core index i sits at padded index i + p."""
    m = n - 2 * p
    if p == 0:
        return [(0, m, [(0, m, "id")])]
    if mode == "reflect":
        # forward: padded[j<p] = core[p-j]; padded[p+m+t] = core[m-2-t]
        return [
            (0, 1, [(p, p + 1, "id")]),
            (1, p + 1, [(p + 1, 2 * p + 1, "id"), (0, p, "flip")]),
            (p + 1, m - p - 1, [(2 * p + 1, m - 1, "id")]),
            (m - p - 1, m - 1, [(m - 1, m + p - 1, "id"),
                                (n - p, n, "flip")]),
            (m - 1, m, [(n - p - 1, n - p, "id")]),
        ]
    # replicate / edge: all border copies fold onto the edge rows
    return [
        (0, 1, [(p, p + 1, "id"), (0, p, "sum")]),
        (1, m - 1, [(p + 1, n - p - 1, "id")]),
        (m - 1, m, [(n - p - 1, n - p, "id"), (n - p, n, "sum")]),
    ]


def _pad_spatial_bwd(pad, mode, _, g):
    if not FLAGS.pad_bwd_onepass:
        return _pad_spatial_bwd_per_axis(pad, mode, g)
    from itertools import product

    plans = [_pad_bwd_axis_segments(g.shape[1 + a], p, mode)
             for a, p in enumerate(pad)]

    def cell(term_combo):
        """One output block: sum over the product of per-axis terms, each a
        static slice of the padded gradient with per-axis flip/sum."""
        total = None
        for combo in product(*term_combo):
            sub = g
            for a, (lo, hi, kind) in enumerate(combo):
                ax = a + 1
                sub = jax.lax.slice_in_dim(sub, lo, hi, axis=ax)
                if kind == "flip":
                    sub = jax.lax.rev(sub, [ax])
                elif kind == "sum":
                    sub = jnp.sum(sub, axis=ax, keepdims=True)
            total = sub if total is None else total + sub
        return total

    def build(a, chosen):
        if a == len(plans):
            return cell(chosen)
        parts = [build(a + 1, chosen + [seg_terms])
                 for _, _, seg_terms in plans[a]]
        return (jnp.concatenate(parts, axis=a + 1) if len(parts) > 1
                else parts[0])

    return (build(0, []),)


def _pad_spatial_bwd_per_axis(pad, mode, g):
    # Reflect/replicate pads commute across axes, so the transpose can
    # consume one axis at a time in any order: crop that axis's borders and
    # accumulate them where the forward read them from (one concat per
    # axis; every index is static).
    for axis, p in enumerate(pad):
        ax = axis + 1
        if p == 0:
            continue
        n = g.shape[ax]
        lo = jax.lax.slice_in_dim(g, 0, p, axis=ax)
        hi = jax.lax.slice_in_dim(g, n - p, n, axis=ax)
        core = jax.lax.slice_in_dim(g, p, n - p, axis=ax)
        m = core.shape[ax]
        if mode == "reflect":
            # forward: [flip(x[1:p+1]), x, flip(x[-p-1:-1])]
            segs = [
                jax.lax.slice_in_dim(core, 0, 1, axis=ax),
                jax.lax.slice_in_dim(core, 1, p + 1, axis=ax)
                + jnp.flip(lo, ax),
                jax.lax.slice_in_dim(core, p + 1, m - p - 1, axis=ax),
                jax.lax.slice_in_dim(core, m - p - 1, m - 1, axis=ax)
                + jnp.flip(hi, ax),
                jax.lax.slice_in_dim(core, m - 1, m, axis=ax),
            ]
        else:  # replicate / edge: all border copies fold onto the edge rows
            segs = [
                jax.lax.slice_in_dim(core, 0, 1, axis=ax)
                + jnp.sum(lo, axis=ax, keepdims=True),
                jax.lax.slice_in_dim(core, 1, m - 1, axis=ax),
                jax.lax.slice_in_dim(core, m - 1, m, axis=ax)
                + jnp.sum(hi, axis=ax, keepdims=True),
            ]
        g = jnp.concatenate(segs, axis=ax)
    return (g,)


_pad_spatial_ad.defvjp(_pad_spatial_fwd, _pad_spatial_bwd)


# -------------------------------------------------------------------- convs


def _cached_kernel_transform(mdl: nn.Module, compute: Callable) -> Array:
    """Serving-time weight preprocessing for the s2d execution space.

    The s2d kernel transforms are pure functions of the canonical params, yet
    computed inside the forward they re-run EVERY call — traced at ~100 ms
    per 28-window sliding-window call (gather/mask/relayout chains on 11-D
    kernel intermediates, docs/benchmarks.md). With a `s2d_kernels` flax
    collection supplied, the pre-transformed kernel is read instead; a pass
    with `mutable=["s2d_kernels"]` records it (see
    `precompute_s2d_kernels`). Training and ordinary applies are unchanged.
    """
    if mdl.has_variable("s2d_kernels", "kt") \
            and not mdl.is_mutable_collection("s2d_kernels"):
        return mdl.get_variable("s2d_kernels", "kt")
    kt = compute()
    # Record only during an explicit prepare pass — during `init` every
    # collection is mutable, and the cache must NOT leak into init output
    # (it would change the variable-tree structure vs the plain network).
    if mdl.is_mutable_collection("s2d_kernels") and not mdl.is_initializing():
        mdl.put_variable("s2d_kernels", "kt", kt)
    return kt


def precompute_s2d_kernels(module: nn.Module, params, x_spec) -> dict:
    """One prepare pass returning the `s2d_kernels` cache for fixed params.

    Serving then calls `module.apply({"params": params, "s2d_kernels":
    cache}, x)` and every s2d conv skips its kernel transform. `x_spec` is an
    example input (only shape/dtype matter; jit DCEs the network math, so
    the compiled prepare program is just the transforms)."""
    import jax

    @jax.jit
    def prep(p, x):
        return module.apply({"params": p}, x, mutable=["s2d_kernels"])[1]

    return prep(params, x_spec)["s2d_kernels"]


class Conv(nn.Module):
    """Convolution with torch-style symmetric integer padding.

    ``pad_mode`` in {'zeros','reflect','replicate'} folds the reference's
    ReflectionPad2d / ReplicationPad3d pre-padding layers into the conv.
    Spatial rank = len(kernel_size).

    ``s2d_factor`` > 1 enables the EXACT space-to-depth fast path for
    stride-1 2D convs (ops/s2d_conv.py): large-kernel small-channel convs
    (CycleGAN's c7s1 boundary layers) fold an r x r block into channels,
    cutting the im2col traffic ~ (k/ceil(k/r))^2-fold. The kernel parameter
    stays in canonical (kh, kw, C, O) layout — checkpoints and the torch
    importer are unaffected; falls back to the plain conv whenever the
    geometry does not divide.

    ``s2d_space`` = r > 1 means input AND output live in the c-major
    space-to-depth execution space (ops/s2d_space.py): x has
    true_C * r^n channels on an r-fold coarser grid, and the canonical
    kernel is transformed on the fly (stride-1 symmetric-pad convs and
    k == s == r down convs are supported). Used by the V-Net s2d execution
    mode; parameters stay canonical.

    ``to_cells`` = r > 1: plain input, c-major CELL output — a stride-1
    original conv executed as one VALID stride-r conv straight from the
    (plain-padded, so any pad_mode) input. The network-edge fix for
    lane-starved stems/heads: measured 3x on the CycleGAN c7s1 boundary
    convs (tools/profile.py train). ``from_cells`` = r > 1: the inverse
    boundary — a stride-r original conv (s == r, zero pad) consuming cells
    and producing plain output. Both keep the canonical kernel parameter.
    """
    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    pad_mode: str = "zeros"
    use_bias: bool = True
    # The conv output feeds an affine-less instance norm, so the bias add is
    # mathematically cancelled: create the parameter (checkpoint/importer
    # parity) but stop its gradient (see flags.bias_inert).
    bias_inert: bool = False
    feature_group_count: int = 1
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    s2d_factor: int = 0
    s2d_space: int = 0
    to_cells: int = 0
    from_cells: int = 0
    # With to_cells: the input is ALREADY the c-major cells_in-cell tensor
    # of the unpadded original (e.g. a ConvTranspose(cells_out=r) output);
    # padding is realized as whole border cells (reflect/replicate/zeros in
    # cell space) and the composed stride-(to_cells/cells_in) conv runs
    # directly — no plain round-trip, no encode.
    cells_in: int = 0

    def _add_bias(self, y: Array, bias: Optional[Array], rn: int = 1) -> Array:
        if bias is None:
            return y
        if self.bias_inert and FLAGS.bias_inert:
            # Keep the (function-inert) ADD but stop the gradient: dropping
            # the add entirely measured a 10.5% REGRESSION on the V-Net s2d
            # sliding window (2.59 -> 2.35 vols/s, tools/ab.py sw)
            # because the add was load-bearing for XLA's conv+stat fusion
            # layouts; stop_gradient keeps the forward program byte-identical
            # while still deleting the backward bias-grad reduce fusions
            # that motivated the flag (+2.8% on the CycleGAN-256 step).
            bias = jax.lax.stop_gradient(bias)
        if rn > 1:
            bias = jnp.repeat(bias, rn)
        return y + bias.astype(y.dtype)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = len(self.kernel_size)
        k = tuple(self.kernel_size)
        pad = _to_tuple(self.padding, n)
        strides = _to_tuple(self.strides, n)

        if self.s2d_space > 1:
            return self._call_s2d(x, n, k, pad, strides)
        if self.to_cells > 1:
            return self._call_to_cells(x, n, k, pad, strides)
        if self.from_cells > 1:
            return self._call_from_cells(x, n, k, pad, strides)

        in_features = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", self.kernel_init,
                            (*k, in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32) if self.use_bias else None
        kernel = kernel.astype(x.dtype)

        if self.pad_mode == "zeros":
            lax_padding = [(p, p) for p in pad]
        else:
            x = pad_spatial(x, pad, self.pad_mode)
            lax_padding = [(0, 0)] * n

        if self.s2d_factor > 1 and self.feature_group_count == 1:
            from ganslate_tpu.ops.s2d_conv import s2d_applicable, s2d_conv
            xp = pad_spatial(x, [p for p, _ in lax_padding], "zeros") \
                if any(p for p, _ in lax_padding) else x
            if s2d_applicable(xp.shape[1:-1], k, strides, self.s2d_factor):
                y = s2d_conv(xp, kernel, self.s2d_factor)
                return self._add_bias(y, bias)

        from ganslate_tpu.ops.batch_fold import conv_batch_folded, foldable
        if foldable(x.shape, strides, lax_padding, k[0]):
            y = conv_batch_folded(x, kernel, strides, lax_padding,
                                  self.feature_group_count)
        else:
            spatial = "DHW"[3 - n:]
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape,
                (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
            y = jax.lax.conv_general_dilated(
                x, kernel, strides, lax_padding,
                feature_group_count=self.feature_group_count,
                dimension_numbers=dn)
        return self._add_bias(y, bias)

    def _call_s2d(self, x: Array, n, k, pad, strides) -> Array:
        """s2d execution space: canonical params, transformed math.

        Geometries: stride-1 symmetric-pad (zeros or replicate) convs,
        k == s == r down convs, and general stride-r down convs."""
        from ganslate_tpu.ops import s2d_space as sp
        transform = lambda compute: _cached_kernel_transform(self, compute)

        r = self.s2d_space
        rn = r ** n
        assert self.feature_group_count == 1, \
            "s2d execution space supports ungrouped convs only"
        in_true = x.shape[-1] // rn
        kernel = self.param("kernel", self.kernel_init,
                            (*k, in_true, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32) if self.use_bias else None
        kernel = kernel.astype(x.dtype)
        square = all(ki == k[0] for ki in k) and all(p == pad[0] for p in pad)

        if k == (r,) * n and strides == (r,) * n and all(p == 0 for p in pad):
            kt = transform(lambda: sp.transform_down_kernel(kernel, r))
            conv_strides, pads = (r,) * n, [(0, 0)] * n
        elif all(s == 1 for s in strides) and square:
            assert self.pad_mode in ("zeros", "replicate", "edge"), \
                f"s2d execution space: unsupported pad_mode {self.pad_mode}"
            kt = transform(lambda: sp.transform_stride1_kernel(kernel, r, pad[0]))
            lo, hi = sp.stride1_pads(k[0], r, pad[0])
            if self.pad_mode == "zeros":
                conv_strides, pads = (1,) * n, [(lo, hi)] * n
            else:
                # replicate: build border cells explicitly (edge-phase
                # broadcast, a 0/1 lane matmul), then VALID conv.
                x = sp.replicate_pad_cells(x, in_true, r, [(lo, hi)] * n)
                conv_strides, pads = (1,) * n, [(0, 0)] * n
        elif strides == (r,) * n and square and self.pad_mode == "zeros":
            kt = transform(lambda: sp.transform_strided_kernel(kernel, r, pad[0]))
            pads = [sp.strided_pads(k[0], r, pad[0], x.shape[1 + i])
                    for i in range(n)]
            conv_strides = (r,) * n
        elif all(s in (1, r) for s in strides) and self.pad_mode == "zeros":
            # Mixed per-dim geometry (separable convs: (1,k,k) s(1,s,s) /
            # (k,1,1) s(s,1,1) factors). The kernel transforms compose
            # per-dim, so each dim independently takes the stride-1 or the
            # stride-r gather plan; the transformed conv then runs with
            # per-dim strides.
            plans, pads, conv_strides = [], [], []
            for i in range(n):
                if strides[i] == 1:
                    plans.append(sp._stride1_plan(k[i], r, pad[i])[:2])
                    pads.append(sp.stride1_pads(k[i], r, pad[i]))
                    conv_strides.append(1)
                else:
                    plans.append(sp._strided_plan(k[i], r, pad[i])[:2])
                    pads.append(sp.strided_pads(k[i], r, pad[i],
                                                x.shape[1 + i]))
                    conv_strides.append(r)
            kt = transform(lambda: sp._apply_plan(kernel, tuple(plans), r))
            conv_strides = tuple(conv_strides)
        else:
            raise NotImplementedError(
                f"s2d execution space: unsupported conv geometry k={k} "
                f"s={strides} p={pad} pad_mode={self.pad_mode}")

        from ganslate_tpu.ops.batch_fold import conv_batch_folded, foldable
        if foldable(x.shape, conv_strides, pads, kt.shape[0]):
            y = conv_batch_folded(x, kt, conv_strides, pads)
        else:
            spatial = "DHW"[3 - n:]
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kt.shape,
                (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
            y = jax.lax.conv_general_dilated(x, kt, conv_strides, pads,
                                             dimension_numbers=dn)
        return self._add_bias(y, bias, rn)

    def _call_to_cells(self, x: Array, n, k, pad, strides) -> Array:
        """Plain input -> c-major cell output (ops/s2d_space.py boundary).
        Stride-1 originals only; padding happens on the plain side, so any
        pad_mode works (reflect included)."""
        from ganslate_tpu.ops import s2d_space as sp

        r = self.to_cells
        assert all(s == 1 for s in strides), \
            "to_cells supports stride-1 original convs"
        assert self.feature_group_count == 1
        if self.cells_in > 1:
            return self._call_cells_to_cells(x, n, k, pad)
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*k, in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32) if self.use_bias else None
        for i in range(n):
            out_orig = x.shape[1 + i] + 2 * pad[i] - k[i] + 1
            if out_orig % r:
                raise ValueError(
                    f"to_cells: original output extent {out_orig} (dim {i}) "
                    f"must divide r={r}")
        if any(pad):
            x = pad_spatial(x, pad, self.pad_mode)
        r_in = FLAGS.to_cells_via_encode
        if (r_in > 1 and r > r_in and r % r_in == 0
                and all(d % r_in == 0 for d in x.shape[1:-1])):
            # Composed form for wide folds (the r=4 head): encode the padded
            # plain input to r_in-cells with a one-hot conv the MXU runs at
            # full rate, then one stride-(r/r_in) conv with the composed
            # kernel — res-core-shaped (e.g. 5x5, 256 -> 48 lanes) instead
            # of the 10x10 stride-4 window XLA's emitter iterates at
            # ~20 TF/s (docs/benchmarks.md attack list).
            xc = sp.encode(x, r_in)
            kt = _cached_kernel_transform(
                self, lambda: sp.transform_to_cells_via_kernel(
                    kernel.astype(x.dtype), r, r_in))
            pads = [sp.to_cells_via_pads(k[i], r, r_in, xc.shape[1 + i])
                    for i in range(n)]
            spatial = "DHW"[3 - n:]
            dn = jax.lax.conv_dimension_numbers(
                xc.shape, kt.shape,
                (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
            y = jax.lax.conv_general_dilated(xc, kt, (r // r_in,) * n, pads,
                                             dimension_numbers=dn)
            return self._add_bias(y, bias, r ** n)
        kt = _cached_kernel_transform(
            self, lambda: sp.transform_to_cells_kernel(kernel.astype(x.dtype), r))
        if (FLAGS.to_cells_cell_grad
                and all((ki - 1) % r == 0 for ki in k)
                and all(x.shape[1 + i] % r == 0 for i in range(n))):
            # Cell-space data gradient: the stem convs this path serves have
            # 3 input channels, so the default transposed-conv input grad
            # runs at 3/128 MXU lanes (traced 3.0 ms each on CycleGAN-256);
            # the cell form runs the same MACs at C*r^n lanes + a one-hot
            # decode (see ops/s2d_space.py:to_cells_conv).
            y = sp.to_cells_conv(x, kt, r)
        else:
            spatial = "DHW"[3 - n:]
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kt.shape,
                (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
            y = jax.lax.conv_general_dilated(x, kt, (r,) * n, "VALID",
                                             dimension_numbers=dn)
        return self._add_bias(y, bias, r ** n)

    def _call_cells_to_cells(self, x: Array, n, k, pad) -> Array:
        """c-major cells_in-cell input (UNPADDED original) -> c-major
        to_cells-cell output: the stride-1 original conv's padding is built
        as whole border cells, then one stride-(to_cells/cells_in) VALID
        conv of the delta-composed kernel runs. The head of the full cells
        boundary chain (ConvTranspose(cells_out) -> cell norm -> this)."""
        from ganslate_tpu.ops import s2d_space as sp

        r, r_in = self.to_cells, self.cells_in
        assert r > r_in and r % r_in == 0, (r, r_in)
        rn_in = r_in ** n
        in_true = x.shape[-1] // rn_in
        kernel = self.param("kernel", self.kernel_init,
                            (*k, in_true, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32) if self.use_bias else None

        geoms = [sp.to_cells_via_cell_geometry(k[i], r, r_in, pad[i],
                                               x.shape[1 + i])
                 for i in range(n)]
        deltas = {g[2] for g in geoms}
        assert len(deltas) == 1, \
            f"cells_in: per-dim deltas must agree, got {sorted(deltas)}"
        delta = deltas.pop()

        if any(g[0] or g[1] for g in geoms):
            cell_pads = [(g[0], g[1]) for g in geoms]
            if self.pad_mode == "reflect":
                x = sp.reflect_pad_cells(x, in_true, r_in, cell_pads)
            elif self.pad_mode in ("replicate", "edge"):
                x = sp.replicate_pad_cells(x, in_true, r_in, cell_pads)
            else:
                x = jnp.pad(x, [(0, 0)] + list(cell_pads) + [(0, 0)])
        kt = _cached_kernel_transform(
            self, lambda: sp.transform_to_cells_via_kernel(
                kernel.astype(x.dtype), r, r_in, delta))
        conv_pads = [(-g[3], 0) for g in geoms]
        spatial = "DHW"[3 - n:]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kt.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
        y = jax.lax.conv_general_dilated(x, kt, (r // r_in,) * n, conv_pads,
                                         dimension_numbers=dn)
        return self._add_bias(y, bias, r ** n)

    def _call_from_cells(self, x: Array, n, k, pad, strides) -> Array:
        """c-major cell input -> plain output: a stride-r original conv
        (s == r, zero padding) as a stride-1 conv over the cell grid."""
        from ganslate_tpu.ops import s2d_space as sp

        r = self.from_cells
        assert strides == (r,) * n, \
            f"from_cells needs original stride == r={r}, got {strides}"
        assert self.pad_mode == "zeros", \
            "from_cells pads with zero cells (zero-pad originals) only"
        assert self.feature_group_count == 1
        rn = r ** n
        in_true = x.shape[-1] // rn
        kernel = self.param("kernel", self.kernel_init,
                            (*k, in_true, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32) if self.use_bias else None
        kt = _cached_kernel_transform(
            self,
            lambda: sp.transform_from_cells_kernel(kernel.astype(x.dtype), r, pad[0]))
        assert all(p == pad[0] for p in pad), "from_cells: symmetric pad only"
        pads = [sp.from_cells_pads(k[i], r, pad[i], x.shape[1 + i])
                for i in range(n)]
        spatial = "DHW"[3 - n:]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kt.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
        y = jax.lax.conv_general_dilated(x, kt, (1,) * n, pads,
                                         dimension_numbers=dn)
        return self._add_bias(y, bias)


class ConvTranspose(nn.Module):
    """Fractionally-strided conv with torch ConvTranspose output geometry:

        out = (in - 1) * stride - 2 * padding + kernel + output_padding

    Two exact implementations share the same canonical (k..., C, O) kernel
    parameter (checkpoints/torch-importer agnostic):

    - ``polyphase=True``: sub-pixel decomposition — one dense conv producing
      all s^n output phases in the channel dim + depth-to-space
      (ops/polyphase_transpose.py). MAC-optimal: avoids the (s^n-1)/s^n
      structural-zero MACs of the dilated form.
    - ``polyphase=False``: `lax.conv_general_dilated` with input dilation.
    - ``polyphase=None`` (default): measured per rank on v5e — 3D uses
      polyphase (V-Net k2s2 grads 27% faster in isolation), 2D uses the
      dilated form (4.6% faster inside the fused CycleGAN-256 train step,
      where XLA's fusion favors it; A/B in docs/benchmarks.md).
    """
    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    # See Conv.bias_inert / flags.bias_inert.
    bias_inert: bool = False
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)
    polyphase: Optional[bool] = None
    s2d_space: int = 0
    # Produce the c-major r-CELL representation of the output (r == every
    # stride) via the polyphase conv WITHOUT its depth-to-space interleave —
    # the zero-relayout producer for a consumer running in cell space
    # (boundary head chain). Canonical kernel parameter unchanged.
    cells_out: int = 0

    _add_bias = Conv._add_bias

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = len(self.kernel_size)
        k = tuple(self.kernel_size)
        s = _to_tuple(self.strides, n)
        p = _to_tuple(self.padding, n)
        op = _to_tuple(self.output_padding, n)

        if self.s2d_space > 1:
            return self._call_s2d(x, n, k, s, p, op)

        use_polyphase = (self.polyphase if self.polyphase is not None
                         else n == 3 or (n == 2 and FLAGS.polyphase_2d))
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*k, in_features, self.features), jnp.float32)
        if self.cells_out > 1:
            assert all(si == self.cells_out for si in s), \
                f"cells_out={self.cells_out} needs stride == cell factor, " \
                f"got {s}"
            from ganslate_tpu.ops.polyphase_transpose import (
                polyphase_conv_transpose)
            y = polyphase_conv_transpose(x, kernel.astype(x.dtype), s, p, op,
                                         cells_out=True)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = self._add_bias(y, bias, self.cells_out ** n)
            return y
        if use_polyphase and any(si > 1 for si in s):
            from ganslate_tpu.ops.polyphase_transpose import (
                polyphase_conv_transpose)
            y = polyphase_conv_transpose(x, kernel.astype(x.dtype), s, p, op)
        else:
            from ganslate_tpu.ops import transpose_grad as tg
            if FLAGS.transpose_custom_grad:
                # Reverse-free gradients: XLA's autodiff of the lhs-dilated
                # form reverses the FULL output gradient to orient the
                # kernel-grad correlation (0.82 ms x4 traced on
                # CycleGAN-256); the custom vjp shifts padding instead and
                # reverses only the (k.., C, O) kernel for the data grad.
                y = tg.conv_transpose_dilated(x, kernel.astype(x.dtype),
                                              s, p, op)
            else:
                pads = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i])
                        for i in range(n)]
                spatial = "DHW"[3 - n:]
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, kernel.shape,
                    (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
                y = jax.lax.conv_general_dilated(
                    x, kernel.astype(x.dtype),
                    window_strides=(1,) * n,
                    padding=pads,
                    lhs_dilation=s,
                    rhs_dilation=(1,) * n,
                    dimension_numbers=dn,
                )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = self._add_bias(y, bias)
        return y

    def _call_s2d(self, x: Array, n, k, s, p, op) -> Array:
        """s2d execution space (k == s == r, p = 0 up convs only).

        Uses the lhs-dilated lowering rather than the polyphase path: the
        polyphase depth-to-space interleave materializes a relayout that
        costs more than the dilated form's structural-zero MACs here
        (measured 21.8 vs 8.9 ms on the BRaTS level-0 up conv)."""
        from ganslate_tpu.ops import s2d_space as sp

        r = self.s2d_space
        rn = r ** n
        square = (all(ki == k[0] for ki in k) and all(v == p[0] for v in p)
                  and all(v == op[0] for v in op))
        in_true = x.shape[-1] // rn
        kernel = self.param("kernel", self.kernel_init,
                            (*k, in_true, self.features), jnp.float32)
        spatial = "DHW"[3 - n:]
        lhs_dil = (r,) * n
        if s == (r,) * n and square and k == (r,) * n and p[0] == 0 \
                and op[0] == 0:
            # k == s == r: tightest transformed window (extent r per dim).
            kt = _cached_kernel_transform(
                self, lambda: sp.transform_up_kernel(kernel.astype(x.dtype), r))
            pads = [(r - 1, r - 1)] * n
        elif s == (r,) * n and square:
            # General geometry (e.g. Piresnet/Resnet3D k3 s2 p1 op1).
            for i in range(n):
                out_orig = (x.shape[1 + i] * r - 1) * r - 2 * p[0] + k[0] + op[0]
                if out_orig % r:
                    raise ValueError(
                        f"s2d ConvTranspose: original output extent {out_orig} "
                        f"(dim {i}) must divide r={r}, else the last s2d cell "
                        f"carries garbage trailing phases")
            kt = _cached_kernel_transform(
                self,
                lambda: sp.transform_up_general_kernel(kernel.astype(x.dtype),
                                                       r, p[0]))
            pads = [sp.up_general_pads(k[0], r, p[0], op[0], x.shape[1 + i])
                    for i in range(n)]
        elif all(si == r or (si, k[i], p[i], op[i]) == (1, 1, 0, 0)
                 for i, si in enumerate(s)):
            # Mixed per-dim geometry (separable transposed factors:
            # (1,k,k) s(1,s,s) / (k,1,1) s(s,1,1)). Stride-1 dims must be
            # identity (k=1, p=0): the transformed kernel is the phase-delta
            # the stride-1 plan produces for k=1, applied with no input
            # dilation in that dim; stride-r dims take the general up plan.
            plans, pads, lhs_dil = [], [], []
            for i, si in enumerate(s):
                if si == 1:
                    plans.append(sp._stride1_plan(1, r, 0)[:2])
                    pads.append((0, 0))
                    lhs_dil.append(1)
                else:
                    out_orig = (x.shape[1 + i] * r - 1) * r - 2 * p[i] \
                        + k[i] + op[i]
                    if out_orig % r:
                        raise ValueError(
                            f"s2d ConvTranspose: original output extent "
                            f"{out_orig} (dim {i}) must divide r={r}")
                    plans.append(sp._up_general_plan(k[i], r, p[i])[:2])
                    pads.append(sp.up_general_pads(k[i], r, p[i], op[i],
                                                   x.shape[1 + i]))
                    lhs_dil.append(r)
            kt = _cached_kernel_transform(
                self, lambda: sp._apply_plan(kernel.astype(x.dtype),
                                             tuple(plans), r))
            lhs_dil = tuple(lhs_dil)
        else:
            raise NotImplementedError(
                f"s2d execution space: unsupported transpose geometry k={k} "
                f"s={s} p={p} op={op}")
        from ganslate_tpu.ops import transpose_grad as tg
        if FLAGS.transpose_custom_grad:
            # Reverse-free gradients (see ops/transpose_grad.py) — the s2d
            # up convs are lhs-dilated too, so their kernel grads otherwise
            # reverse the full cell-grid gradient.
            y = tg.dilated_conv_transpose(x, kt, tuple(lhs_dil),
                                          tuple(tuple(pq) for pq in pads))
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kt.shape,
                (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
            y = jax.lax.conv_general_dilated(
                x, kt, (1,) * n, pads, lhs_dilation=lhs_dil,
                dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = self._add_bias(y, bias, rn)
        return y


# -------------------------------------------------------------------- norms


class InstanceNorm(nn.Module):
    """Instance normalization over spatial dims, per sample & channel.

    Matches torch InstanceNorm2d/3d defaults: affine=False,
    track_running_stats=False, eps=1e-5. Stats are computed in fp32 even under
    a bf16 compute policy (variance underflows in bf16). On TPU this routes
    through the fused Pallas kernel (ganslate_tpu.ops.instance_norm): one HBM
    read + one write instead of XLA's two-pass form.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ganslate_tpu.ops.instance_norm import instance_norm
        return instance_norm(x, self.epsilon, "none")


class NormAct(nn.Module):
    """Normalization fused with the following activation.

    With instance norm the whole pipeline (stats, normalize, activation) is a
    single Pallas kernel pass; other norm types fall back to norm-then-act.
    `activation` in {'none', 'relu', 'leaky_relu'}.
    """
    norm_type: str = "instance"
    activation: str = "none"
    negative_slope: float = 0.2
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.norm_type == "instance":
            from ganslate_tpu.ops.instance_norm import instance_norm
            return instance_norm(x, self.epsilon, self.activation,
                                 self.negative_slope)
        norm = get_norm_layer(self.norm_type)
        h = norm()(x) if norm is not None else x
        if self.activation == "relu":
            h = nn.relu(h)
        elif self.activation == "leaky_relu":
            h = nn.leaky_relu(h, negative_slope=self.negative_slope)
        return h


class BatchNorm(nn.Module):
    """Affine batch normalization over (batch, *spatial) per channel.

    Equivalent to torch BatchNorm with track_running_stats=False: batch
    statistics are used at train AND eval time, which keeps every train step
    a pure function of (params, batch) — no mutable state collection to
    thread through the GAN algorithms. (The reference GANs default to
    instance norm; 'batch' is an optional setting, configs/base.py:54.)
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class IdentityNorm(nn.Module):
    """`norm_type='none'`: a pass-through that slots anywhere a norm module
    is constructed (networks call `norm()(h)` unconditionally)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x


def apply_norm_s2d(norm_type: str, h: Array, channels: int, s2d: int) -> Array:
    """Norm dispatch shared by the s2d-capable generators: the standard norm
    module, or the grouped s2d-space equivalent (exact — stats pool over
    (spatial, phase) per true channel)."""
    if s2d > 1:
        if norm_type in ("none", None):
            return h
        assert norm_type == "instance", \
            f"s2d execution space supports instance/none norms, got {norm_type}"
        from ganslate_tpu.ops.s2d_space import group_instance_norm
        return group_instance_norm(h, channels, s2d ** (h.ndim - 2))
    return get_norm_layer(norm_type)()(h)


def get_norm_layer(norm_type: str = "instance"):
    """Factory mapping config `norm_type` to a module constructor
    (reference parity: nn/utils.py:53-68)."""
    if norm_type == "instance":
        return InstanceNorm
    if norm_type == "batch":
        return BatchNorm
    if norm_type in ("none", None):
        return IdentityNorm
    raise NotImplementedError(f"Normalization layer `{norm_type}` not supported")


def is_bias_before_norm(norm_type: str = "instance") -> bool:
    """Conv keeps its bias before InstanceNorm (no affine), drops it before
    BatchNorm (affine absorbs it). Reference parity: nn/utils.py:71-80."""
    if norm_type in ("instance", "none", None):
        return True
    if norm_type == "batch":
        return False
    raise NotImplementedError(f"Normalization layer `{norm_type}` not supported")


# --------------------------------------------------------------- activations


def leaky_relu(x: Array, negative_slope: float = 0.2) -> Array:
    return nn.leaky_relu(x, negative_slope=negative_slope)


class PReLU(nn.Module):
    """PReLU with per-channel learned slopes (torch nn.PReLU(num_channels))
    or a single shared slope when `features` is None.

    `s2d_rn` > 1: the input is a c-major s2d tensor with features * s2d_rn
    lanes; the canonical per-channel slope is repeated per phase.

    `fused_norm` (s2d only): the input is the PRE-NORM conv output — the
    group instance norm runs inside this module with the PReLU select fused
    into its f32 normalize expression (one elementwise pass; the standalone
    select orphans into its own full-tensor fusion otherwise — see the
    sliding-window trace attribution in docs/benchmarks.md). The slope
    parameter keeps its PReLU module scope, so checkpoints are unchanged."""
    features: Optional[int] = None
    init_slope: float = 0.25
    s2d_rn: int = 0
    fused_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, residual: Optional[Array] = None,
                 residual_tile: int = 1) -> Array:
        shape = (self.features,) if self.features else (1,)
        slope = self.param("slope", nn.initializers.constant(self.init_slope),
                           shape, jnp.float32)
        if self.fused_norm:
            assert self.s2d_rn > 1 and self.features, \
                "PReLU.fused_norm is an s2d-space path"
            from ganslate_tpu.ops.s2d_space import group_instance_norm
            return group_instance_norm(x, self.features, self.s2d_rn,
                                       activation="prelu", prelu_slope=slope,
                                       residual=residual,
                                       residual_tile=residual_tile)
        assert residual is None, "residual requires fused_norm"
        if self.s2d_rn > 1 and self.features:
            slope = jnp.repeat(slope, self.s2d_rn)
        return jnp.where(x >= 0, x, x * slope.astype(x.dtype))
