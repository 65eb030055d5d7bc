"""The single surface for performance flags.

Every measured perf experiment that stays in the tree keeps exactly one
switch here, with its measured delta, so (a) A/B harnesses and future-XLA
re-measurement flip one documented knob, (b) library users get a scoped
`override()` context manager instead of mutating module globals, and
(c) configs reach them via the `train.perf` section (see
`configs/training.py:PerfConfig`, applied in `utils/builders.build_gan`).

Flags are read at TRACE time (inside `jit`-traced functions), so a scope
that wraps tracing — `model.setup()`, the first call of a jitted function,
an explicit `.lower()` — pins the traced program; already-compiled
executables are unaffected by later flips. Two models traced under
different `override()` scopes coexist in one process.

Measured deltas (v5e, CycleGAN-256 fused step / 28-window s2d V-Net
sliding window; tools/ab.py train / tools/ab.py sw):

| flag | default | measured effect of the non-default |
|---|---|---|
| bias_inert | True | -2.8% train step (bias-grad reduce fusions return) |
| pad_custom_vjp | True | -16.5 ms/step (autodiff pad transpose: ~6 full-tensor slice+add fusions on the stem/head reflect pads) |
| pad_fwd_onepass | True | -5.3% train step (per-axis pad concats materialize per axis) |
| polyphase_2d | False | dilated form won the r2 A/B by 4.6% but its kernel grad reverses the full output-grad tensor; re-measure per XLA release |
| transpose_custom_grad | False | neutral (74.0 vs 74.3 img/s; 541.5 vs 540.4 ms 3D grad) — kept bit-exact-tested for re-measurement |
| fused_d_forward | True | off: real/fake D forwards dispatch as two convs instead of one batched apply |
| paired_apply | False | on: -10% train step (71.5 -> 64.5 img/s) — XLA lowers vmapped stacked-weight convs to slower grouped convs; kept for re-measurement |
| scan_unroll | 1 | >1 lets XLA fuse across memory-saving coupling blocks and makes cost_analysis count every block; costs compile time |
| plain_unroll_full | True | off: -27% sliding-window forward (concat carries spill to HBM between couplings) and slower compile (82 vs 58 s) |
| to_cells_via_encode | 2 | 0 (direct wide conv): -2.1% train step — the r=4 head's 10x10 stride-4 window iterates the conv emitter at ~20 TF/s; the composed encode+k5s2 form is res-core-shaped |
"""

import contextlib
import dataclasses


@dataclasses.dataclass
class PerfFlags:
    # Stop-gradient the bias of convs feeding affine-less instance norms
    # (the per-channel constant cancels exactly in the norm, so the
    # reference's ~1e-8 rounding-noise bias gradient is replaced by an
    # exact zero and its backward reduce fusion disappears). The forward
    # ADD is kept — dropping it regressed the sliding window 10.5% because
    # it was load-bearing for XLA's conv+stat fusion layouts.
    bias_inert: bool = True
    # Hand-written backward for reflect/replicate spatial pads (one touch
    # per axis vs XLA's chain of full-tensor slice+add fusions).
    pad_custom_vjp: bool = True
    # One-pass pad forward: nested concat over the 3^n source-segment grid
    # (no cross-axis data dependence -> one fused output write) vs
    # sequential per-axis concats.
    pad_fwd_onepass: bool = True
    # Rank default for ConvTranspose(polyphase=None) in 2D. 3D always
    # defaults to polyphase (measured 27% faster grads) regardless.
    polyphase_2d: bool = False
    # Hand-written ConvTranspose input/kernel gradients (reverse-free).
    transpose_custom_grad: bool = False
    # Batch real/fake discriminator forwards into one apply.
    fused_d_forward: bool = True
    # Paired-symmetric network execution (stack the two directions' weights
    # and vmap one apply).
    paired_apply: bool = False
    # lax.scan unroll factor for memory-saving coupling sequences.
    scan_unroll: int = 1
    # Fully unroll the plain (activation-storing) coupling sequences.
    plain_unroll_full: bool = True
    # One-pass pad backward (the backward twin of pad_fwd_onepass).
    pad_bwd_onepass: bool = True
    # to-cells boundary convs: compute the data gradient in cell space.
    to_cells_cell_grad: bool = True
    # Full cells head chain (2D boundary-cells mode): the last up conv
    # produces its r=2 cell representation directly (polyphase phases ARE
    # the cells — no interleave), norm+relu run in cell space, the head's
    # reflect pad is built as border cells, and the head conv consumes
    # cells without the encode round-trip. Measured +6.2% full fused
    # CycleGAN-256 step (79.4 -> 84.3 img/s, tools/ab.py train, k=8).
    head_cells_chain: bool = True
    # to-cells folds wider than this r_in execute as encode(r_in) + one
    # composed stride-(r/r_in) conv instead of one wide stride-r conv:
    # the r=4 head's 10x10 stride-4 window iterates XLA's conv emitter at
    # ~20 TF/s; the composed form is a res-core-shaped k5 s2 256->48 conv.
    # Measured +2.1% full fused CycleGAN-256 step (74.2 -> 75.7 img/s,
    # tools/ab.py train). 0 disables (direct wide conv).
    to_cells_via_encode: int = 2
    # s2d decode via one lhs-dilated conv (vs gather-based decode).
    s2d_decode_dilated: bool = True
    # s2d instance-norm: split stats across the cell axis reduction.
    s2d_stat_split: bool = False
    # Sliding window: run ALL volumes' windows through the network as one
    # flat batch axis instead of vmapping the per-volume window loop over
    # the volume axis. The vmap wraps every network op in a rank+1
    # (V, batch, ...) view whose standard layout conflicts with the
    # conv+stat fusions' window-batch-in-sublanes layout (one full-tensor
    # copy round-trip per level-0 layer — see the layout-conflict repro,
    # tools/repro_layout_conflict.py); a flat batch keeps one view.
    # Measured +23% on the BRaTS V-Net sliding window (2.68 -> 3.29
    # vols/s, tools/ab.py sw, interleaved).
    sw_flat_batch: bool = True
    # Fold sliding-window cells into the batch axis when cells <= this
    # (0 disables; measured a regression at 28-window batches, kept for
    # re-measurement on future XLA versions).
    fold_max_cells: int = 0
    # V-Net s2d input block: run norm + channel-repeat residual + PReLU as
    # ONE f32 pass inside group_instance_norm. OFF: measured -2.2% on the
    # 28-window BRaTS sliding window (3.24 vs 3.31 vols/s interleaved) —
    # the separate-op chain (tile materialization + layout copy + orphaned
    # select, 18.6 ms in the trace) is load-bearing for XLA's surrounding
    # fusion/layout choices; the fused pass costs more than it saves.
    # Exactness-tested either way; kept for re-measurement.
    vnet_stem_fused: bool = False
    # Pallas instance-norm kernel (off: XLA's fused stats won on the
    # measured shapes; kept where measured to win).
    inorm_pallas: bool = False
    # Tiled variant of the Pallas instance-norm kernel.
    inorm_tiled: bool = False


FLAGS = PerfFlags()

_FIELDS = {f.name for f in dataclasses.fields(PerfFlags)}


@contextlib.contextmanager
def override(**kwargs):
    """Scoped flag override: `with flags.override(bias_inert=False): ...`.

    Restores previous values on exit. Wrap the TRACING of the code under
    test (setup / first jitted call / `.lower()`), not its execution."""
    unknown = set(kwargs) - _FIELDS
    if unknown:
        raise TypeError(f"unknown perf flag(s): {sorted(unknown)}; "
                        f"valid: {sorted(_FIELDS)}")
    previous = {k: getattr(FLAGS, k) for k in kwargs}
    for k, v in kwargs.items():
        setattr(FLAGS, k, v)
    try:
        yield FLAGS
    finally:
        for k, v in previous.items():
            setattr(FLAGS, k, v)


def apply_config(perf_conf) -> None:
    """Apply a `train.perf` config section: fields left at None keep the
    framework default (so configs only pin what they care about)."""
    if perf_conf is None:
        return
    for name in _FIELDS:
        value = getattr(perf_conf, name, None)
        if value is not None:
            setattr(FLAGS, name, value)
