"""Index samplers for the host data plane.

Reference parity: /root/reference/ganslate/data/samplers.py (InfiniteSampler:
an infinite shuffled index stream, rank-strided so every process draws
disjoint indices from the same shared-seed permutation stream) and the
DistributedSampler used for eval (utils/builders.py:67-71).
"""

import itertools
from typing import Iterator

import numpy as np

from ganslate_tpu.utils import communication


class InfiniteSampler:
    """Infinite stream of dataset indices: shuffle(range(size)) repeated, with
    each process taking `indices[rank::world_size]`. The permutation seed is
    shared across processes so shards are disjoint.

    The stream is RESUMABLE: `position` counts indices this process has
    yielded since the stream origin, and `set_state(seed, position)`
    fast-forwards a fresh sampler to continue the exact same stream — the
    Trainer checkpoints `{seed, position}` so a preempted run's data order
    picks up where it stopped instead of restarting the permutation stream
    (the reference restarts it: /root/reference/ganslate/data/samplers.py
    keeps no cursor)."""

    def __init__(self, size: int, shuffle: bool = True, seed=None):
        assert size > 0
        self._size = size
        self._shuffle = shuffle
        self._seed = communication.shared_random_seed() if seed is None else seed
        self._rank = communication.get_rank()
        self._world_size = communication.get_world_size()
        self._position = 0

    @property
    def seed(self) -> int:
        return int(self._seed)

    @property
    def position(self) -> int:
        """Indices yielded by THIS process since the stream origin (live —
        runs ahead of the training loop when the loader prefetches; for
        checkpointing use the consumed count, e.g. iters x local batch)."""
        return self._position

    def set_state(self, seed: int, position: int) -> None:
        """Restore the stream to `position` indices already yielded (per
        process). The next `__iter__` continues from there."""
        self._seed = int(seed)
        self._position = int(position)

    def __iter__(self) -> Iterator[int]:
        # This process owns raw-stream slots rank, rank+world, ... — having
        # yielded `position` of them, the next is raw index rank + pos*world.
        raw_start = self._rank + self._position * self._world_size
        stream = self._raw_indices(raw_start)
        for idx in itertools.islice(stream, 0, None, self._world_size):
            self._position += 1
            yield idx

    def _raw_indices(self, start: int):
        """The shared (pre-striding) index stream, fast-forwarded to raw
        offset `start`. Skipping whole permutation blocks costs one
        O(size) permutation draw per block — the RNG must consume exactly
        what an uninterrupted run consumed."""
        blocks, within = divmod(start, self._size)
        rng = np.random.default_rng(self._seed)
        if self._shuffle:
            for _ in range(blocks):
                rng.permutation(self._size)
        first = True
        while True:
            if self._shuffle:
                perm = rng.permutation(self._size).tolist()
            else:
                perm = range(self._size)
            yield from (itertools.islice(perm, within, None) if first else perm)
            first = False


class SequentialShardSampler:
    """Finite, in-order pass over the dataset, strided across processes
    (eval/inference). Shuffle-free so results are deterministic."""

    def __init__(self, size: int, shard: int = 0, num_shards: int = 1):
        assert size > 0
        self._size = size
        self._shard = shard
        self._num_shards = num_shards

    def __iter__(self) -> Iterator[int]:
        yield from range(self._shard, self._size, self._num_shards)

    def __len__(self) -> int:
        return len(range(self._shard, self._size, self._num_shards))
