"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's torch DDP + NCCL stack (/root/reference/ganslate/utils/
communication.py, nn/gans/base.py:172-189).

Design: one global `jax.sharding.Mesh` with a leading ``data`` axis. Batches
are sharded on their first dimension across ``data``; parameters, optimizer
state, and image pools are replicated. XLA inserts the gradient `psum`s over
ICI automatically because the loss reduces over a sharded batch — there is no
explicit all-reduce anywhere in the framework.

The mesh is constructed over ALL devices of the job (multi-host pods include
non-addressable devices; `jax.devices()` covers them), so DCN-spanning data
parallelism works with the same code path.

Future axes (spatial sharding of 3D volumes with halo exchange, model
parallelism for very wide nets) extend the same mesh with extra axes; see
`make_mesh(axis_sizes=...)`.
"""

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_GLOBAL_MESH: Optional[Mesh] = None


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a mesh. Default: all devices on a single ``data`` axis.

    ``axis_sizes`` maps axis name -> size; sizes must multiply to the device
    count, with -1 allowed once as a wildcard (like a reshape)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if not axis_sizes:
        axis_sizes = {"data": n}
    names = tuple(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    assert int(np.prod(sizes)) == n, f"mesh {dict(zip(names, sizes))} != {n} devices"
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, names)


def set_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_mesh() -> Mesh:
    """The process-wide mesh, creating the default data-parallel one lazily."""
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = make_mesh()
    return _GLOBAL_MESH


def batch_sharding(mesh: Optional[Mesh] = None, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the data axis; everything else replicated."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P(axis))


def _spatial_axis_is_process_local(mesh: Mesh) -> bool:
    """True when every group of devices along the `spatial` axis lives on one
    process. shard_batch feeds make_array_from_process_local_data the FULL
    local volume (loaders shard only the batch dim across processes), which
    is correct only if the spatial axis never crosses a process boundary —
    otherwise the API would misread the local spatial extent as a
    per-process shard and assemble a wrong (doubled) global volume."""
    names = list(mesh.axis_names)
    dev = np.moveaxis(mesh.devices, names.index("spatial"), -1)
    return all(len({d.process_index for d in row}) == 1
               for row in dev.reshape(-1, dev.shape[-1]))


def _leaf_batch_spec(mesh: Mesh, shape) -> P:
    """PartitionSpec for one batch leaf: dim 0 over `data`; when the mesh
    has a `spatial` axis and the first spatial dim divides it, that dim is
    sharded too — XLA/GSPMD then partitions every conv with automatic halo
    exchange and globalizes normalization reductions (spatially-sharded
    training, configs/training.py `spatial_mesh`). In multi-controller jobs
    the spatial dim is only sharded when the spatial axis is process-local
    (see _spatial_axis_is_process_local); otherwise the leaf falls back to
    data-only sharding rather than assembling a corrupt global volume."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_spatial = sizes.get("spatial", 1)
    if (n_spatial > 1 and len(shape) >= 3
            and shape[1] % n_spatial == 0 and shape[1] >= 2 * n_spatial
            and (jax.process_count() == 1
                 or _spatial_axis_is_process_local(mesh))):
        return P("data", "spatial")
    return P("data")


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


def replicate_to_mesh(tree, mesh: Optional[Mesh] = None):
    """Replicate a pytree onto every device of the mesh.

    Single-controller: a plain device_put. Multi-controller (pods): the mesh
    spans non-addressable devices, where device_put is rejected — each
    process contributes its identical host-local copy via
    `host_local_array_to_global_array` (values ARE identical across
    processes: init seeds are shared, checkpoint restores are global).
    PRNG key arrays round-trip through key_data (extended dtypes are not
    accepted by the multihost utils)."""
    mesh = mesh or get_mesh()
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    def place(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                         jax.dtypes.prng_key):
            data = multihost_utils.host_local_array_to_global_array(
                np.asarray(jax.random.key_data(x)), mesh, PartitionSpec())
            return jax.random.wrap_key_data(data)
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, PartitionSpec())

    return jax.tree_util.tree_map(place, tree)


def shard_batch(batch, mesh: Optional[Mesh] = None,
                stacked_steps: bool = False):
    """Place a host batch (pytree of numpy arrays) onto the mesh, sharded on
    dim 0 across ``data``. In a multi-controller job every process passes its
    LOCAL share of the global batch (the loader already yields local shares);
    the global array is assembled from per-process shards over ICI/DCN.

    ``stacked_steps``: leaves carry a leading step axis (k, B, ...) from the
    trainer's multi-step dispatch — the step axis replicates and the BATCH
    axis (dim 1) shards over ``data``."""
    mesh = mesh or get_mesh()
    # Divisibility is against the DATA axis (not the whole mesh — extra
    # model/spatial axes replicate the batch), and each process holds
    # 1/process_count of the global batch, so the check is on the local
    # share vs the local slice of the data axis.
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
    n_local = max(1, n_data // jax.process_count())
    replicated = replicated_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def place(x):
        if hasattr(x, "sharding"):
            # Already placed (e.g. a global array fed back through infer):
            # keep it in the multi-process case — np.asarray would fail on
            # non-addressable shards or mistake global data for local.
            if multiprocess:
                return x
        else:
            x = np.asarray(x)
        if stacked_steps:
            spec = _leaf_batch_spec(mesh, np.shape(x)[1:])
            sharded = NamedSharding(mesh, P(None, *spec))
            divisible = np.ndim(x) > 1 and x.shape[1] % n_local == 0
        else:
            sharded = NamedSharding(mesh, _leaf_batch_spec(mesh, np.shape(x)))
            # Batches that don't divide the data axis (e.g. single-sample
            # deployment inference) are replicated instead of sharded.
            divisible = np.ndim(x) > 0 and x.shape[0] % n_local == 0
        if multiprocess:
            if divisible:
                return jax.make_array_from_process_local_data(sharded, x)
            # Replicating would broadcast each process's DIFFERENT local
            # share as if identical — silent cross-host divergence.
            raise ValueError(
                f"multi-process batch dim {x.shape[0]} does not divide the "
                f"per-process device count {n_local}; make local batches a "
                f"multiple of it, or replicate identical data explicitly "
                f"with replicate_to_mesh")
        return jax.device_put(x, sharded if divisible else replicated)

    return jax.tree_util.tree_map(place, batch)
