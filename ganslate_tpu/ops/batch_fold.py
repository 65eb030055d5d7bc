"""Batch-fold lowering for small-spatial-grid convs.

XLA:TPU tiles 3D convs poorly when the per-sample spatial grid is tiny (the
deep V-Net levels under the s2d execution space: (4,22,22) runs at 27.7% of
MXU peak, (2,11,11) at 4.8% — measured, docs/benchmarks.md). Folding the
batch into the leading spatial dim with a (pad_lo+pad_hi)-zero gap between
samples gives XLA one long depth extent to tile, and is EXACT: the gap zeros
are precisely each sample's own zero padding, so every dot product is
unchanged — output row `s*dd + j` of the folded conv equals sample s's
output row j.

Measured at the sliding-window bench shapes (batch 28, slope-timed):
(4,22,22)x512 lanes 14.08 -> 7.65 ms, (2,11,11)x512 10.25 -> 6.12 ms;
HURTS at (8,44,44) (10.6 -> 18.3 ms) — hence the cell-count threshold.

Replaces nothing in the reference (it has no TPU lowering concerns); used by
nn.layers.Conv for any rank-3 stride-1 zero-pad conv under the threshold.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ganslate_tpu.flags import FLAGS

# Fold when the per-sample spatial grid has at most this many cells.
# ISOLATED convs win big ((4,22,44)x512: 1.8x, (2,11,11)x512: 1.7x,
# slope-timed) but inside the V-Net coupling scan the fold REGRESSED the
# full sliding-window bench (1.679 -> 1.513 vols/s: the folded conv also
# computes the gap rows — +50% depth rows at d=4 — and the per-iteration
# pad/reshape breaks XLA's scan-body fusion). Default OFF until a
# gap-persistent level layout amortizes the pad once per level; set > 0 to
# opt in for scan-free networks.



def foldable(x_shape: Sequence[int], strides: Sequence[int],
             pads: Sequence[Tuple[int, int]], tap_extent_d: int) -> bool:
    """Rank-3, batch > 1, small grid, and a depth geometry whose folded
    output rows realign to samples:
    - stride-1 with depth padding == tap extent - 1 (every SAME-style conv);
    - stride == tap extent with zero depth padding and divisible depth
      (the k == s down convs: windows never straddle a sample boundary)."""
    if len(x_shape) != 5 or x_shape[0] <= 1:
        return False
    d, h, w = x_shape[1:4]
    if d * h * w > FLAGS.fold_max_cells:
        return False
    lo, hi = pads[0]
    if strides[0] == 1:
        return lo + hi == tap_extent_d - 1
    return (strides[0] == tap_extent_d and lo == hi == 0
            and d % strides[0] == 0)


def conv_batch_folded(x: jax.Array, kernel: jax.Array,
                      strides: Sequence[int],
                      pads: Sequence[Tuple[int, int]],
                      feature_group_count: int = 1) -> jax.Array:
    """`lax.conv_general_dilated` (NDHWC/DHWIO) with the batch folded into
    depth. Caller must have checked `foldable`."""
    n_samples, d, h, w, c = x.shape
    taps_d = kernel.shape[0]
    lo, hi = pads[0]
    dd = d + lo + hi

    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
    xf = xp.reshape(1, n_samples * dd, h, w, c)
    dn = jax.lax.conv_dimension_numbers(
        xf.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        xf, kernel, tuple(strides), [(0, 0), tuple(pads[1]), tuple(pads[2])],
        feature_group_count=feature_group_count, dimension_numbers=dn)
    if strides[0] > 1:
        # k == s, pad 0: windows tile samples exactly; direct reshape.
        oh, ow, oc = y.shape[2:]
        return y.reshape(n_samples, d // strides[0], oh, ow, oc)
    # Folded output row s*dd + j is sample s's row j (valid for j < d).
    y = jnp.pad(y[0], ((0, taps_d - 1), (0, 0), (0, 0), (0, 0)))
    oh, ow, oc = y.shape[1:]
    return y.reshape(n_samples, dd, oh, ow, oc)[:, :d]
