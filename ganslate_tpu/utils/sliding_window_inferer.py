"""Sliding-window (patch-wise) inference with overlap blending, TPU-native.

Replaces the reference's MONAI `SlidingWindowInferer` wrapper
(/root/reference/ganslate/utils/sliding_window_inferer.py): scan an ROI grid
with fractional overlap, run the network over batches of windows, blend
overlapping predictions with a gaussian (or constant) importance map, and
support running 2D networks over 3D volumes via a depth-1 ROI squeeze
(sliding_window_inferer.py:36-52).

TPU redesign (MONAI's version is dynamic-shaped host-loop code):
- the window-start grid is computed on host per input shape and baked into
  the compiled program (static shapes, one compile per volume geometry);
- windows are gathered with `vmap(dynamic_slice)`, run through the network
  `sw_batch_size` at a time under `lax.scan` (static trip count), and
  blended with a STATIC per-axis overlap-add (the grid is a Cartesian
  product, so the weighted blend factorizes into static slice/add/concat
  chains; on a multi-device mesh each device computes its grid share and
  the predictions are all-gathered first);
- the whole thing — gather, network forwards, weighted overlap-add,
  normalization — is ONE jitted program per (input shape, network) pair.
"""

import math
from collections import OrderedDict
from functools import partial
from typing import Callable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _scan_interval(image_size, roi_size, overlap: float) -> Tuple[int, ...]:
    """Step between window starts per dim (MONAI-compatible)."""
    interval = []
    for image_d, roi_d in zip(image_size, roi_size):
        if roi_d == image_d:
            interval.append(roi_d)
        else:
            interval.append(max(int(roi_d * (1 - overlap)), 1))
    return tuple(interval)


def grid_starts_per_dim(image_size, roi_size, scan_interval):
    """Per-dim sorted window start lists whose Cartesian product (row-major,
    `np.meshgrid(indexing="ij")`) IS the window grid. Single source of truth:
    dense_patch_slices flattens this, and the blend's overlap-add indexes it,
    so the two can never disagree on grid order."""
    starts_per_dim = []
    for image_d, roi_d, step in zip(image_size, roi_size, scan_interval):
        scan_num = int(math.ceil(max(image_d - roi_d, 0) / step)) + 1
        starts = [min(i * step, image_d - roi_d) for i in range(scan_num)]
        starts_per_dim.append(sorted(set(starts)))
    return starts_per_dim


def dense_patch_slices(image_size, roi_size, scan_interval) -> np.ndarray:
    """All window start coordinates covering the padded image (host-side),
    in the row-major grid order of grid_starts_per_dim."""
    starts_per_dim = grid_starts_per_dim(image_size, roi_size, scan_interval)
    grids = np.meshgrid(*starts_per_dim, indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=-1).astype(np.int32)


def gaussian_importance_map(roi_size, sigma_scale: float = 0.125,
                            dtype=np.float32) -> np.ndarray:
    """Centered gaussian over the ROI; floored to its min positive value so
    every voxel keeps nonzero weight (MONAI behavior)."""
    grids = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in roi_size],
                        indexing="ij")
    value = np.zeros_like(grids[0])
    for g, s in zip(grids, roi_size):
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-8)
        value += ((g - center) / sigma) ** 2
    # Floor-clip in the OUTPUT dtype: clipping in float64 and casting after
    # can turn the float64 floor into float32 zeros (tiny sigmas), which
    # would put exact zeros in the weight canvas and NaN the blend.
    imp = np.exp(-0.5 * value).astype(dtype)
    pos = imp[imp > 0]
    if pos.size == 0:
        return np.ones_like(imp)
    return np.clip(imp, pos.min(), None)


class SlidingWindowInferer:
    """Callable: `inferer(inputs, network, params)`.

    inputs: (N, *spatial, C) channels-last. A 2D ROI applied to 3D inputs is
    broadcast to depth-1 (run-2D-over-3D path, reference parity).

    `distributed=True` (default) shards the WINDOW GRID over the mesh's
    `data` axis when more than one device is present: every device runs its
    share of windows over the (replicated) volume, the weighted predictions
    are all-gathered over ICI and blended with the static overlap-add —
    near-linear scaling of vols/sec with chip count, the TPU-native way to
    serve large 3D volumes.
    """

    def __init__(self, roi_size: Sequence[int], sw_batch_size: int = 1,
                 overlap: float = 0.25, mode: str = "gaussian",
                 cval: float = 0.0, sigma_scale: float = 0.125,
                 distributed: bool = True, _force_full_map: bool = False):
        self.roi_size = tuple(int(r) for r in roi_size)
        self.sw_batch_size = int(sw_batch_size)
        self.overlap = float(overlap)
        assert mode in ("gaussian", "constant"), f"unsupported blend mode {mode}"
        self.mode = mode
        self.cval = float(cval)
        self.sigma_scale = sigma_scale
        self.distributed = distributed
        # Test seam: force the non-factorized (full-map multiply) blend even
        # when the gaussian map is separable, so the fallback path can be
        # exercised at well-conditioned weights.
        self._force_full_map = _force_full_map
        # Compiled-program cache, keyed on (shape/dtype/roi/..., id(network)).
        # Each entry stores THE NETWORK ITSELF next to the compiled fn: the
        # strong reference pins `id(network)` for the entry's lifetime, so a
        # recycled id can never alias a different network onto a stale
        # compiled program. LRU-bounded so long-lived servers that rotate
        # networks or volume geometries don't grow it without limit.
        self._cache: "OrderedDict" = OrderedDict()
        self._cache_max = 16

    def __call__(self, inputs: jax.Array, network: Callable, params=None):
        """`network` must be PURE: `network(params, x) -> y` with `params` a
        pytree passed as a traced argument (so weights are not baked into the
        compiled program as constants and eval-during-training sees fresh
        parameters). If `params` is None, `network(x)` is assumed pure with
        nothing closed over that changes across calls."""
        spatial_rank = inputs.ndim - 2
        roi = self.roi_size

        # 2D network over 3D volume: broadcast ROI to depth 1.
        squeeze_depth = False
        if spatial_rank == 3 and len(roi) == 2:
            roi = (1, *roi)
            squeeze_depth = True
        assert len(roi) == spatial_rank, \
            f"roi {roi} does not match input spatial rank {spatial_rank}"

        mesh = None
        if self.distributed:
            from ganslate_tpu.parallel import get_mesh
            candidate = get_mesh()
            # The window grid is sharded over the DATA axis only; meshes with
            # extra axes (e.g. train.spatial_mesh's "spatial") replicate the
            # grid across those axes, so the split size must be the data-axis
            # size, not the total device count.
            if "data" in candidate.shape and candidate.shape["data"] > 1:
                mesh = candidate

        key = (inputs.shape, str(inputs.dtype), roi, squeeze_depth, id(network),
               params is None, mesh is not None)
        entry = self._cache.get(key)
        if entry is None:
            compiled = self._build(inputs.shape, roi, squeeze_depth,
                                   network, mesh)
            entry = (network, compiled)
            self._cache[key] = entry
            while len(self._cache) > self._cache_max:
                self._cache.popitem(last=False)
        else:
            # Can't fail while the entry holds the strong ref (the id is
            # pinned); kept as a cheap invariant guard.
            assert entry[0] is network, "sliding-window cache id collision"
            self._cache.move_to_end(key)
        return entry[1](inputs, params)

    def _build(self, in_shape, roi, squeeze_depth, network, mesh=None):
        spatial = in_shape[1:-1]
        channels = in_shape[-1]

        # Pad spatial dims up to at least the ROI (symmetric, cval).
        padded = tuple(max(s, r) for s, r in zip(spatial, roi))
        pad_cfg = [(0, 0)]
        for s, p in zip(spatial, padded):
            lo = (p - s) // 2
            pad_cfg.append((lo, p - s - lo))
        pad_cfg.append((0, 0))

        interval = _scan_interval(padded, roi, self.overlap)
        starts = dense_patch_slices(padded, roi, interval)  # (n_windows, rank)
        n_windows = starts.shape[0]
        sw_batch = min(self.sw_batch_size, n_windows)
        n_batches = -(-n_windows // sw_batch)
        n_dev = mesh.shape["data"] if mesh is not None else 1
        # Round window batches up to a multiple of the device count so the
        # grid splits evenly across the mesh.
        n_batches = -(-n_batches // n_dev) * n_dev
        # Pad the window list by repeating the last window; the duplicates
        # sit at the end of grid order and are dropped before blending (a
        # duplicate that overlaps another window would otherwise bias the
        # weighted average toward the duplicated prediction).
        pad_windows = n_batches * sw_batch - n_windows
        if pad_windows:
            starts = np.concatenate([starts, np.repeat(starts[-1:], pad_windows, 0)])
        starts_dev = jnp.asarray(starts.reshape(n_batches, sw_batch, -1))

        if self.mode == "gaussian":
            importance = gaussian_importance_map(roi, self.sigma_scale)
        else:
            importance = np.ones(roi, dtype=np.float32)

        # The gaussian map is a product of per-dim gaussians (its floor-clip
        # only bites when exp underflows, which these ROI sizes never reach),
        # so the blend weighting factorizes per axis and can ride the
        # overlap-add passes below instead of costing a full-grid multiply.
        imp_1d = None
        if self.mode == "gaussian":
            factors = []
            for s in roi:
                center = (s - 1) / 2.0
                sigma = max(s * self.sigma_scale, 1e-8)
                factors.append(np.exp(-0.5 * ((
                    (np.arange(s, dtype=np.float64) - center) / sigma) ** 2)))
            outer = factors[0]
            for g in factors[1:]:
                outer = np.multiply.outer(outer, g)
            if (np.array_equal(outer.astype(np.float32), importance)
                    and not self._force_full_map):
                imp_1d = [jnp.asarray(g.astype(np.float32)) for g in factors]
        else:
            imp_1d = [None] * len(roi)  # constant mode: unit weights
        importance_dev = jnp.asarray(importance)[..., None]  # (*roi, 1)

        roi_t = tuple(roi)
        rank = len(roi_t)

        # Per-dim window start lists whose Cartesian product IS the grid —
        # the same derivation dense_patch_slices flattened into `starts`, so
        # the overlap-add below consumes predictions in exactly grid order.
        starts_per_dim = grid_starts_per_dim(padded, roi, interval)

        def gather_window(vol, start):
            return jax.lax.dynamic_slice(
                vol, (*start,) + (0,), (*roi_t, channels))

        def crop(out):
            crops = tuple(slice(lo, lo + s)
                          for (lo, _), s in zip(pad_cfg[1:-1], spatial))
            return out[(slice(None), *crops, slice(None))]

        # ---- blend: static overlap-add, no scatter, no transpose.
        # The window grid is a Cartesian product of per-dim start lists, so
        # the weighted overlap-add factorizes per axis into STATIC
        # slice/add/concat chains XLA fuses at full bandwidth (the
        # dynamic_update_slice scatter this replaced ran at ~10 GB/s on the
        # canvas — traced, docs/benchmarks.md). Each pass consumes its grid
        # axis in place with index_in_dim/slice_in_dim — the moveaxis form
        # this replaces materialized full-grid transposes — and multiplies
        # in that axis' 1-D gaussian factor, so the blend weighting never
        # costs a full-grid elementwise pass. The weight canvas is
        # input-independent and baked in as a numpy constant.
        n_pos = [len(s) for s in starts_per_dim]
        assert int(np.prod(n_pos)) == n_windows  # grid == product structure

        def _axis_overlap_add(t, pos_axis, spatial_axis, axis_starts, extent,
                              out_len, w1d):
            """Consume grid axis `pos_axis`: sum every window slab (shifted
            by its start, weighted by its 1-D importance slice) into spatial
            axis `spatial_axis`. Every breakpoint is static and every read is
            a layout-preserving slice."""
            bounds = sorted({0, out_len, *axis_starts,
                             *[s + extent for s in axis_starts]})
            bounds = [b for b in bounds if 0 <= b <= out_len]
            segs = []
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                parts = []
                for i, s in enumerate(axis_starts):
                    if s <= lo and hi <= s + extent:
                        sub = jax.lax.index_in_dim(t, i, axis=pos_axis,
                                                   keepdims=False)
                        sub = jax.lax.slice_in_dim(sub, lo - s, hi - s,
                                                   axis=spatial_axis - 1)
                        sub = sub.astype(jnp.float32)
                        if w1d is not None:
                            shape = [1] * sub.ndim
                            shape[spatial_axis - 1] = hi - lo
                            sub = sub * jax.lax.slice_in_dim(
                                w1d, lo - s, hi - s).reshape(shape)
                        parts.append(sub)
                segs.append(sum(parts[1:], parts[0]))
            return (jnp.concatenate(segs, axis=spatial_axis - 1)
                    if len(segs) > 1 else segs[0])

        def collect_preds(vol, net_params, start_batches):
            """Window predictions for the given batches, in grid order."""
            def apply_net(x):
                return network(x) if net_params is None else network(net_params, x)

            def body(_, start_batch):
                windows = jax.vmap(gather_window, in_axes=(None, 0))(vol, start_batch)
                if squeeze_depth:
                    preds = apply_net(windows[:, 0])[:, None]
                else:
                    preds = apply_net(windows)
                # Keep the network's own dtype (bf16 nets move half the
                # bytes through the gather/all-gather); the blend casts to
                # fp32 at its first weighted read.
                return None, preds

            if start_batches.shape[0] == 1:
                preds = body(None, start_batches[0])[1]
            else:
                _, preds = jax.lax.scan(body, None, start_batches)
                preds = preds.reshape(-1, *preds.shape[2:])
            return preds

        def collect_preds_static(vol, net_params):
            """Grid-order predictions for ALL real windows via fully STATIC
            slices — the starts are host constants, whereas vmapping
            dynamic_slice over a traced start array becomes a gather XLA
            cannot simplify back to slices. Used single-device when the
            group count is small enough to unroll (the distributed path
            must keep traced starts: shard_map traces one SPMD program).
            The tail group stays ragged instead of duplicate-padded — the
            duplicates' forwards were wasted compute."""
            def apply_net(x):
                return network(x) if net_params is None else network(net_params, x)

            preds = []
            for b0 in range(0, n_windows, sw_batch):
                # Slice REAL windows only — `starts` carries duplicate-padded
                # tail rows for the scan/mesh paths.
                group = [tuple(int(v) for v in s)
                         for s in starts[b0:min(b0 + sw_batch, n_windows)]]
                windows = jnp.stack([
                    jax.lax.slice(
                        vol, (*s, 0),
                        tuple(si + r for si, r in zip(s, roi_t)) + (channels,))
                    for s in group])
                if squeeze_depth:
                    preds.append(apply_net(windows[:, 0])[:, None])
                else:
                    preds.append(apply_net(windows))
            return (jnp.concatenate(preds, axis=0) if len(preds) > 1
                    else preds[0])

        def collect_preds_static_flat(x, net_params):
            """ALL volumes' windows through the network as ONE flat batch
            axis (volume-major grid order), static slices. The per-volume
            vmap form wraps every network op in a rank+1 (V, batch, ...)
            view; XLA batches the convs over the flattened axis but keeps
            the vmapped elementwise/normalize ops on the rank-6 view in
            standard layout, while the conv+stat fusions want the window
            batch in sublanes — one full-tensor layout round-trip per
            level-0 layer (~71 ms/call traced; the isolated chain runs
            copy-free, tools/repro_layout_conflict.py). One flat view keeps
            network ops in one layout family. Group size is sw_batch * V —
            the same effective per-call batch the vmapped form ran."""
            def apply_net(w):
                return network(w) if net_params is None else network(net_params, w)

            v = x.shape[0]

            def windows_of(vol):
                """One group's windows of one volume — static slices, same
                producer structure as the vmapped path (a flat jnp.stack of
                56 per-window slices made XLA materialize the fp32 stack in
                a layout padding the size-1 channel dim into lanes: 212 MB
                -> 27 GB, OOM)."""
                return [jnp.stack([
                    jax.lax.slice(
                        vol, (*s, 0),
                        tuple(si + r for si, r in zip(s, roi_t)) + (channels,))
                    for s in (tuple(int(c) for c in st)
                              for st in starts[b0:min(b0 + sw_batch,
                                                      n_windows)])])
                    for b0 in range(0, n_windows, sw_batch)]

            groups = jax.vmap(windows_of)(x)   # per group: (V, g, *roi, C)
            preds = []
            for w in groups:
                w = w.reshape(v * w.shape[1], *w.shape[2:])
                if squeeze_depth:
                    preds.append(apply_net(w[:, 0])[:, None])
                else:
                    preds.append(apply_net(w))
            # Each group's preds are (V * g) volume-major; restore the
            # (V, windows) split per group, then concat window axes.
            split = [p.reshape(v, -1, *p.shape[1:]) for p in preds]
            return (jnp.concatenate(split, axis=1) if len(split) > 1
                    else split[0])

        def blend(preds):
            """(n_windows, *roi, C) -> (*padded, C) by per-axis weighted
            overlap-add over the grid's product structure. When the gaussian
            map doesn't factorize (imp_1d is None) the caller pre-multiplies
            the full map and the passes run unweighted."""
            # The network may change the channel count (MONAI semantics,
            # reference utils/sliding_window_inferer.py) — use the
            # prediction's own channel dim, not the input's.
            t = preds.reshape(*n_pos, *roi_t, preds.shape[-1])
            for d in reversed(range(rank)):
                w1d = None if imp_1d is None else imp_1d[d]
                t = _axis_overlap_add(t, d, 2 * d + 1, starts_per_dim[d],
                                      roi_t[d], padded[d], w1d)
            return t

        if mesh is None:
            w_np = np.zeros((*padded, 1), np.float32)
            for idx in np.ndindex(*n_pos):
                region = tuple(slice(starts_per_dim[d][idx[d]],
                                     starts_per_dim[d][idx[d]] + roi_t[d])
                               for d in range(rank))
                w_np[region] += importance[..., None]
            w_const = jnp.asarray(w_np)

            # Static gather when unrolling stays cheap (<= 4 network call
            # groups); many-group grids (e.g. slice-wise 2D-over-3D with a
            # small sw batch) keep the lax.scan form so the network is
            # traced once.
            use_static_gather = -(-n_windows // sw_batch) <= 4

            from ganslate_tpu.flags import FLAGS
            flat_batch = FLAGS.sw_flat_batch

            @jax.jit
            def run(inputs, net_params):
                x = jnp.pad(inputs, pad_cfg, constant_values=self.cval)
                if use_static_gather and flat_batch:
                    preds = collect_preds_static_flat(x, net_params)
                elif use_static_gather:
                    preds = jax.vmap(collect_preds_static, in_axes=(0, None))(
                        x, net_params)
                else:
                    preds = jax.vmap(collect_preds, in_axes=(0, None, None))(
                        x, net_params, starts_dev)
                    preds = preds[:, :n_windows]  # drop pad duplicates
                if imp_1d is None:  # non-factorizable map: weight up front
                    preds = preds.astype(jnp.float32) * importance_dev
                out = jax.vmap(blend)(preds)
                return crop(out / w_const)

            return run

        # Distributed: shard the window grid across the mesh's data axis —
        # each device runs its share of the network forwards, the weighted
        # predictions are all-gathered over ICI (windows are contiguous
        # grid-order chunks per device, so the gather axis IS grid order)
        # and blended with the SAME static per-axis overlap-add as the
        # single-device path (the dynamic_update_slice scatter this replaces
        # ran at ~10 GB/s on the canvas, docs/benchmarks.md).
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        n_dev = mesh.shape["data"]
        starts_sharded = starts_dev.reshape(n_dev, n_batches // n_dev,
                                            sw_batch, rank)

        def worker(start_batches, x, net_params):
            start_batches = start_batches[0]  # this device's share
            preds = jax.vmap(collect_preds, in_axes=(0, None, None))(
                x, net_params, start_batches)
            # Devices hold contiguous grid-order chunks, so the gather axis
            # IS grid order (and bf16 nets gather half the bytes); the pad
            # duplicates sit at the end and are dropped by the same
            # [:n_windows] slice as single-device.
            preds = jax.lax.all_gather(preds, "data", axis=1, tiled=True)
            preds = preds[:, :n_windows]
            if imp_1d is None:
                preds = preds.astype(jnp.float32) * importance_dev
            return jax.vmap(blend)(preds)

        sharded = shard_map(
            worker, mesh=mesh,
            in_specs=(P("data"), P(), P()),
            out_specs=P(),
            check_vma=False,
        )

        # Same real-windows-only weight canvas as the single-device path.
        w_np = np.zeros((*padded, 1), np.float32)
        for s in starts[:n_windows]:
            region = tuple(slice(int(s[d]), int(s[d]) + roi_t[d])
                           for d in range(rank))
            w_np[region] += importance[..., None]
        w_const = jnp.asarray(w_np)

        @jax.jit
        def run(inputs, net_params):
            x = jnp.pad(inputs, pad_cfg, constant_values=self.cval)
            out = sharded(starts_sharded, x, net_params)
            return crop(out / w_const)

        return run
