"""Rank-generic ResNet encoder-decoder generator (CycleGAN's c7s1-64 design).

Architecture parity with the reference Resnet2D/Resnet3D
(/root/reference/ganslate/nn/generators/resnet/resnet2d.py:14-93, resnet3d.py):
c7s1-64 (reflection/replication padded) -> two stride-2 downsampling convs
(64->128->256) -> N residual blocks -> two stride-2 transposed convs -> c7s1-out
-> tanh. InstanceNorm + ReLU throughout.

TPU-first choices: one implementation for any spatial rank (kernel rank drives
2D vs 3D), channels-last layout, reflection padding folded into convs, and the
encoder feature taps needed by CUT exposed via ``extract_features`` (the
reference exposes `self.encoder` as a ModuleList for the same purpose,
resnet2d.py:46).
"""

from typing import Optional, Sequence

import jax
from flax import linen as nn

from ganslate_tpu.nn.layers import (Conv, ConvTranspose, NormAct,
                                    apply_norm_s2d, get_norm_layer,
                                    inert_bias, is_bias_before_norm,
                                    make_initializer, pad_spatial)


class ResidualBlock(nn.Module):
    features: int
    norm_type: str
    pad_mode: str
    spatial_dims: int
    kernel_init: object
    s2d: int = 0

    @nn.compact
    def __call__(self, x):
        use_bias = is_bias_before_norm(self.norm_type)
        inert = inert_bias(self.norm_type)
        k = (3,) * self.spatial_dims
        h = Conv(self.features, k, padding=1, pad_mode=self.pad_mode, use_bias=use_bias,
                 bias_inert=inert, kernel_init=self.kernel_init,
                 s2d_space=self.s2d, name="conv1")(x)
        if self.s2d:
            h = jax.nn.relu(apply_norm_s2d(self.norm_type, h, self.features,
                                           self.s2d))
        else:
            h = NormAct(self.norm_type, "relu")(h)
        h = Conv(self.features, k, padding=1, pad_mode=self.pad_mode, use_bias=use_bias,
                 bias_inert=inert, kernel_init=self.kernel_init,
                 s2d_space=self.s2d, name="conv2")(h)
        h = apply_norm_s2d(self.norm_type, h, self.features, self.s2d) \
            if self.s2d else NormAct(self.norm_type)(h)
        return x + h


class ResnetGenerator(nn.Module):
    in_channels: int
    out_channels: int
    norm_type: str = "instance"
    n_residual_blocks: int = 9
    ngf: int = 64
    spatial_dims: int = 2
    # 2D reference uses ReflectionPad, 3D uses ReplicationPad.
    pad_mode: str = "reflect"
    weight_init_type: str = "normal"
    weight_init_gain: float = 0.02
    # TPU s2d execution space (exact, same parameters; ops/s2d_space.py):
    # run the whole network with 2x2x2 blocks folded into channels. 3D only
    # (2D convs already run at MXU peak) — the 3D ResNet's ReplicationPad is
    # expressed with edge-phase border cells (replicate_pad_cells). Spatial
    # extents must divide 8 (two stride-2 levels on r=2 cells). CUT feature
    # taps are not supported in this mode (tap 0 is the odd-padded tensor,
    # which has no cell representation) — run plain for CUT.
    use_s2d_exec: bool = False
    # Boundary-cells execution (2D; exact, same parameters): the stem and
    # output-head convs are the G's lane-starved layers (3-channel sides;
    # measured 1.2-5.6 ms each at batch 16 @256 while the res core runs at
    # 85%+ of MXU peak — tools/profile.py train). This folds ONLY their
    # outputs: stem runs as a to-cells conv (3x measured), the first down
    # conv consumes cells directly, and the head runs as a to-cells conv +
    # one-hot decode. CUT tap calls fall back to plain execution with the
    # same parameters.
    use_cells_boundary: bool = False

    # Encoder tap count (torch flattened layer list): 4 initial + 2*3 downs
    # + n res blocks.
    @property
    def num_feature_levels(self):
        return 10 + self.n_residual_blocks

    @nn.compact
    def __call__(self, x, extract_features: Optional[Sequence[int]] = None):
        """If ``extract_features`` is given, returns the list of encoder
        activations at those tap indices instead of the translated image
        (CUT feature extraction path).

        Tap indices match the reference's flattened encoder ModuleList
        (resnet2d.py:46) so experiment YAMLs keep their `nce_layers` values:
        0 pad | 1 conv | 2 norm | 3 relu | 4 conv_s2 | 5 norm | 6 relu |
        7 conv_s2 | 8 norm | 9 relu | 10+k res-block k.
        """
        init = make_initializer(self.weight_init_type, self.weight_init_gain)
        norm = get_norm_layer(self.norm_type)
        use_bias = is_bias_before_norm(self.norm_type)
        # Conv biases preceding instance norms are mathematically cancelled
        # (layers.BIAS_INERT) — EXCEPT on the CUT tap path, where the raw
        # conv output (bias included, reference encoder taps 1/4/7) is what
        # the NCE head consumes.
        inert = inert_bias(self.norm_type) and extract_features is None
        k3 = (3,) * self.spatial_dims
        k7 = (7,) * self.spatial_dims

        features = []

        def tap(h):
            features.append(h)
            return h

        s2d = 0
        if self.use_s2d_exec:
            if self.spatial_dims != 3:
                raise ValueError("use_s2d_exec is for the 3D ResNet (2D "
                                 "convs already run at MXU peak)")
            if self.pad_mode == "reflect":
                raise ValueError("use_s2d_exec supports zeros/replicate "
                                 "padding (the 3D reference uses replicate)")
            if extract_features is not None:
                raise ValueError("use_s2d_exec does not support CUT feature "
                                 "taps; run plain execution for CUT")
            for d in x.shape[1:-1]:
                if d % 8:
                    raise ValueError(
                        f"use_s2d_exec needs spatial extents divisible by 8 "
                        f"(two stride-2 levels on r=2 cells), got "
                        f"{x.shape[1:-1]}")
            from ganslate_tpu.ops.s2d_space import decode, encode
            s2d = 2
            x = encode(x, 2)

        def apply_norm(h, channels):
            if s2d:
                return apply_norm_s2d(self.norm_type, h, channels, s2d)
            return norm()(h)

        # Initial c7s1-ngf block (pad / conv / norm / relu are separate taps).
        # s2d_factor (the materialized-relayout fast path, ops/s2d_conv.py)
        # stays OFF: in ISOLATION the 7x7 boundary convs run 2.5-5x faster
        # folded, but in the fused train program XLA already overlaps them —
        # measured on v5e, full G fwd 19.5 ms plain vs 20.1 ms with it.
        # use_s2d_exec (3D) instead folds via conv-expressed relayouts.
        # Boundary-cells mode folds only the network-edge convs; tap calls
        # (CUT) run the identical-parameter plain path instead.
        cells = (2 if self.use_cells_boundary and not s2d
                 and extract_features is None else 0)

        if s2d:
            # Padding lives inside the s2d conv (replicate via border cells).
            h = tap(x)
            h = tap(Conv(self.ngf, k7, padding=3, pad_mode=self.pad_mode,
                         use_bias=use_bias, bias_inert=inert,
                         kernel_init=init, s2d_space=s2d,
                         name="initial")(h))
        elif cells:
            h = Conv(self.ngf, k7, padding=3, pad_mode=self.pad_mode,
                     use_bias=use_bias, bias_inert=inert, kernel_init=init,
                     to_cells=cells, name="initial")(x)
        else:
            h = tap(pad_spatial(x, (3,) * self.spatial_dims, self.pad_mode))
            h = tap(Conv(self.ngf, k7, padding=0, use_bias=use_bias,
                         bias_inert=inert, kernel_init=init,
                         name="initial")(h))
        if cells:
            h = nn.relu(apply_norm_s2d(self.norm_type, h, self.ngf, cells))
        else:
            h = tap(apply_norm(h, self.ngf))
            h = tap(nn.relu(h))

        # Two stride-2 downsampling convs.
        feats = self.ngf
        for i in range(2):
            feats *= 2
            h = tap(Conv(feats, k3, strides=2, padding=1, use_bias=use_bias,
                         bias_inert=inert, kernel_init=init, s2d_space=s2d,
                         from_cells=cells if i == 0 else 0,
                         name=f"down{i}")(h))
            h = tap(apply_norm(h, feats))
            h = tap(nn.relu(h))

        # Residual core.
        for i in range(self.n_residual_blocks):
            h = tap(ResidualBlock(feats, self.norm_type, self.pad_mode,
                                  self.spatial_dims, init, s2d=s2d,
                                  name=f"res{i}")(h))

        if extract_features is not None:
            return [features[i] for i in extract_features]

        # Two stride-2 upsampling transposed convs (norm+relu fused).
        # In boundary-cells mode the LAST up conv can produce its r=2 cell
        # representation directly (flags.head_cells_chain): the polyphase
        # phases ARE the cells, so the depth-to-space interleave (or the
        # dilated form's structural zeros), the head's plain-side reflect
        # pad materialization, and the head encode conv all disappear —
        # norm+relu run in cell space and the head consumes cells.
        from ganslate_tpu.flags import FLAGS
        # (final plain extents are 4*d, so the r=4 head always divides;
        # the guard only keeps reflect border-cell sources in range)
        chain = (cells and FLAGS.head_cells_chain
                 and all(d >= 2 for d in h.shape[1:-1]))
        for i in range(2):
            feats //= 2
            up_cells = 2 if (chain and i == 1) else 0
            h = ConvTranspose(feats, k3, strides=2, padding=1, output_padding=1,
                              bias_inert=inert, kernel_init=init,
                              s2d_space=s2d, cells_out=up_cells,
                              name=f"up{i}")(h)
            if s2d or up_cells:
                h = jax.nn.relu(apply_norm_s2d(self.norm_type, h, feats,
                                               s2d or up_cells))
            else:
                h = NormAct(self.norm_type, "relu")(h)

        # Output c7s1-out + tanh. The head is the G's worst MXU shape: 3
        # output channels = 3/128 lanes. r=2 cells give 12 lanes; r=4 give
        # 48 — measured on the fused CycleGAN-256 step the r=4 head cuts the
        # head fwd+bwd cluster ~3x (kernel 7->10, 2x the MACs, 4x the
        # lanes), so use the largest factor the extent allows (exact either
        # way: the canonical kernel is transformed, not re-trained).
        if chain:
            head_cells = 4
            plain_sp = tuple(2 * d for d in h.shape[1:-1])
        else:
            plain_sp = h.shape[1:-1]
            head_cells = cells
            if cells and all(d % 4 == 0 for d in plain_sp):
                head_cells = 4
        h = Conv(self.out_channels, k7, padding=3, pad_mode=self.pad_mode,
                 use_bias=use_bias, kernel_init=init, s2d_space=s2d,
                 to_cells=head_cells, cells_in=2 if chain else 0,
                 name="out")(h)
        if s2d or cells:
            from ganslate_tpu.ops.s2d_space import decode as _decode
            h = _decode(h, self.out_channels, head_cells if cells else 2)
        return jax.numpy.tanh(h)
