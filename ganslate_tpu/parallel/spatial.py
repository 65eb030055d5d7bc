"""Spatial sharding with halo exchange — scaling volumes, not just batches.

The reference framework handles large 3D volumes purely in the data plane
(patch training + sliding-window inference). On a TPU mesh there is a second
axis of scale: shard the VOLUME spatially across chips and exchange halo
slices between neighbors so convolutions see their full receptive field —
the spatial analog of sequence parallelism (SURVEY.md 5.7). Collectives are
`ppermute`s over ICI between mesh neighbors.

Provided primitives (used inside `shard_map` bodies):

- `halo_exchange(x, halo, axis_name, dim)` — gather `halo` slices from both
  mesh neighbors along a spatial dim (zeros at the global boundary, matching
  zero-padded convolution semantics).
- `sharded_conv(x, kernel, axis_name, dim)` — a 'SAME'-padded convolution of
  a spatially-sharded tensor, exact vs. the unsharded computation.
- `spatially_sharded_infer(network_fn, params, x, mesh, halo, dim)` — run a
  translation-equivariant network over a depth-sharded volume with input
  halos, crop, and reassemble. INTERIOR shard boundaries are exact for
  fully-convolutional nets whose receptive-field half-width <= halo; at the
  two GLOBAL edges the result equals running the network on the volume
  zero-padded by `halo` along `dim` and cropping (per-layer zero padding
  cannot be replayed from outside the net). Normalization caveat: instance
  norm uses global spatial stats, so per-shard stats differ slightly —
  acceptable for inference, documented.
"""

from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _take(x, dim, start, size):
    idx = [slice(None)] * x.ndim
    idx[dim] = slice(start, start + size) if start >= 0 else slice(start, None)
    return x[tuple(idx)]


def halo_exchange(x: jax.Array, halo: int, axis_name: str, dim: int) -> jax.Array:
    """Concatenate `halo` neighbor slices on both sides of `dim`.

    Must run inside a shard_map/pmap context over `axis_name`. The first and
    last shards receive zeros (global-boundary zero padding)."""
    if halo == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    right_perm = [(i, i + 1) for i in range(n - 1)]   # send block rightwards
    left_perm = [(i + 1, i) for i in range(n - 1)]    # send block leftwards

    # What my left neighbor sends me: its LAST halo slices.
    from_left = jax.lax.ppermute(_take(x, dim, -halo, halo), axis_name,
                                 right_perm)
    # What my right neighbor sends me: its FIRST halo slices.
    from_right = jax.lax.ppermute(_take(x, dim, 0, halo), axis_name, left_perm)
    return jnp.concatenate([from_left, x, from_right], axis=dim)


def sharded_conv(x: jax.Array, kernel: jax.Array, axis_name: str,
                 dim: int = 1) -> jax.Array:
    """'SAME' zero-padded conv of a tensor sharded along spatial `dim`.

    x: local shard (N, *spatial, C_in); kernel: (*k, C_in, C_out) with odd
    spatial sizes. Exact equality with the unsharded conv."""
    rank = kernel.ndim - 2
    k = kernel.shape[:rank]
    spatial_dim = dim - 1  # dim is in x coords (incl. batch); kernel coords
    halo = k[spatial_dim] // 2
    xh = halo_exchange(x, halo, axis_name, dim)

    # 'SAME' padding on the non-sharded dims; VALID on the sharded one.
    pads = []
    for i in range(rank):
        if i == spatial_dim:
            pads.append((0, 0))
        else:
            pads.append((k[i] // 2, (k[i] - 1) // 2))

    spatial = "DHW"[3 - rank:]
    dn = jax.lax.conv_dimension_numbers(
        xh.shape, kernel.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    return jax.lax.conv_general_dilated(xh, kernel, (1,) * rank, pads,
                                        dimension_numbers=dn)


def spatially_sharded_infer(network_fn: Callable, params, x: jax.Array,
                            mesh: Mesh, halo: int, dim: int = 1,
                            axis: str = "data") -> jax.Array:
    """Run `network_fn(params, shard)` over a volume sharded along `dim`,
    with `halo` input slices of overlap, cropping the halo regions from each
    shard's output before reassembly.

    The network must preserve spatial shape (stride-symmetric encoder/decoder
    like the generators here) and `x.shape[dim]` must divide evenly by the
    mesh size."""
    n_dev = mesh.devices.size
    assert x.shape[dim] % n_dev == 0, \
        f"dim {dim} of size {x.shape[dim]} must divide across {n_dev} devices"
    shard_size = x.shape[dim] // n_dev
    assert halo <= shard_size, \
        (f"halo {halo} exceeds the per-device shard size {shard_size} "
         f"(dim {dim} of {x.shape[dim]} over {n_dev} devices) — the halo "
         f"exchange only reaches immediate neighbors")

    def worker(params, x_local):
        xh = halo_exchange(x_local, halo, axis, dim)
        y = network_fn(params, xh)
        # Crop the halo back off (first/last shards received zero halos).
        return _take(y, dim, halo, x_local.shape[dim])

    spec = [None] * x.ndim
    spec[dim] = axis
    # Params ride as an explicit replicated input — closing over arrays that
    # already carry a mesh sharding trips shard_map's sharding checks.
    sharded = shard_map(worker, mesh=mesh,
                        in_specs=(P(), P(*spec)), out_specs=P(*spec),
                        check_vma=False)
    x = jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return sharded(params, x)


def spatially_sharded_infer_gspmd(network_fn: Callable, params, x: jax.Array,
                                  mesh: Mesh, dim: int = 1,
                                  axis: str = "data") -> jax.Array:
    """EXACT full-volume inference sharded along spatial `dim` via GSPMD.

    Instead of manual halo exchange, jit the whole network with a sharded
    input and let XLA partition it: convolutions get automatic neighbor
    halo collectives, and instance-norm statistics are computed with GLOBAL
    reductions — so the result equals the unsharded forward (no per-shard
    stats approximation and no receptive-field halo to configure). This is
    the same mechanism the spatially-sharded TRAINING path uses
    (`train.spatial_mesh`, gradient-parity-tested in
    tests/test_spatial_sharding.py); the manual-halo `spatially_sharded_infer`
    stays available for nets where bounded neighbor communication is
    preferred over XLA's partitioning choices."""
    spec = [None] * x.ndim
    spec[dim] = axis
    sharding = NamedSharding(mesh, P(*spec))
    replicated = NamedSharding(mesh, P())
    fn = jax.jit(network_fn,
                 in_shardings=(jax.tree_util.tree_map(lambda _: replicated,
                                                      params), sharding),
                 out_shardings=sharding)
    params = jax.device_put(params, replicated)
    x = jax.device_put(x, sharding)
    return fn(params, x)
