"""Distributed communication verbs, TPU-native.

Replaces the reference's NCCL/gloo stack (`/root/reference/ganslate/utils/
communication.py`: torch.distributed init, reduce/gather/broadcast, shared
seed) with the JAX multi-controller model:

- process identity: `jax.process_index()` / `jax.process_count()`;
- device-side collectives live INSIDE jitted train steps as `lax.psum` etc.,
  inserted by XLA from sharding annotations — nothing to do here;
- host-side object gather/broadcast: `jax.experimental.multihost_utils`;
- a single-process run (the common case on one chip / CPU tests) needs no
  initialization and every verb degrades to the identity.

ICI within a slice and DCN across slices are handled transparently by the
device mesh (see `ganslate_tpu.parallel.mesh`).
"""

import os
import pickle
from typing import Any, List, Optional

import numpy as np

import jax

_initialized = False


def init_distributed() -> None:
    """Initialize the JAX distributed runtime when launched multi-process.

    Reference parity: communication.py:17-27 (env-var rendezvous). JAX uses
    `COORDINATOR_ADDRESS` / `JAX_PROCESS_COUNT` / `JAX_PROCESS_INDEX`, or
    auto-detection on Cloud TPU pods. Single-process runs skip initialization.
    """
    global _initialized
    if _initialized:
        return
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_PROCESS_COUNT")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_INDEX", "0")),
        )
        _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def get_rank() -> int:
    """Global process rank (reference: communication.get_rank)."""
    return jax.process_index()


def get_local_rank() -> int:
    """With one JAX process per host there is one 'local' process; rank 0."""
    return 0


def get_world_size() -> int:
    """Number of controller processes (NOT devices; see device_count())."""
    return jax.process_count()


def device_count() -> int:
    """Total number of addressable-by-anyone devices across the job."""
    return jax.device_count()


def local_device_count() -> int:
    return jax.local_device_count()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across processes (reference: communication.synchronize)."""
    if not is_distributed():
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ganslate_tpu_barrier")


def all_gather(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process.

    Reference parity: gather_object on a gloo sidegroup (communication.py:119-147).
    Here: pickle -> uint8 array -> pad -> process_allgather -> unpickle.
    """
    if not is_distributed():
        return [data]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    size = np.array([payload.size], dtype=np.int64)
    sizes = multihost_utils.process_allgather(size).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(gathered.shape[0])]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather picklable objects; non-dst ranks receive an empty list."""
    out = all_gather(data)
    return out if get_rank() == dst else []


def broadcast(value: Any, src: int = 0) -> Any:
    """Broadcast a host value from `src` to all processes."""
    if not is_distributed():
        return value
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(value, is_source=get_rank() == src)


def reduce(data, average: bool = True, all_reduce: bool = False):
    """Host-side cross-process reduce of numbers / dicts / lists of numbers.

    Device-side gradient reduction is NOT done here — XLA inserts `psum` from
    sharding annotations inside the jitted train step. This verb exists for
    logging/metrics aggregation (reference parity: communication.py:222-253).
    """
    if isinstance(data, dict):
        keys = sorted(data.keys())
        values = np.array([float(np.asarray(data[k]).mean()) for k in keys],
                          dtype=np.float64)
        reduced = _reduce_array(values, average, all_reduce)
        return {k: float(v) for k, v in zip(keys, reduced)}
    if isinstance(data, (list, tuple)):
        values = np.array([float(np.asarray(v).mean()) for v in data], dtype=np.float64)
        return list(_reduce_array(values, average, all_reduce))
    values = np.array([float(np.asarray(data).mean())], dtype=np.float64)
    return float(_reduce_array(values, average, all_reduce)[0])


def _reduce_array(values: np.ndarray, average: bool, all_reduce: bool) -> np.ndarray:
    if not is_distributed():
        return values
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(values)  # (nproc, n)
    if not all_reduce and not is_main_process():
        return values
    out = gathered.sum(axis=0)
    if average:
        out = out / get_world_size()
    return np.asarray(out)


def shared_random_seed() -> int:
    """A random seed identical on every process (reference: communication.py:101-116)."""
    seed = np.random.randint(2 ** 31)
    return int(broadcast(np.int64(seed)))
