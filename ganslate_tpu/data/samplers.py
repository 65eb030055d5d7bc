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
    shared across processes so shards are disjoint."""

    def __init__(self, size: int, shuffle: bool = True, seed=None):
        assert size > 0
        self._size = size
        self._shuffle = shuffle
        self._seed = communication.shared_random_seed() if seed is None else seed
        self._rank = communication.get_rank()
        self._world_size = communication.get_world_size()

    def __iter__(self) -> Iterator[int]:
        yield from itertools.islice(self._infinite_indices(), self._rank, None,
                                    self._world_size)

    def _infinite_indices(self):
        rng = np.random.default_rng(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size).tolist()
            else:
                yield from range(self._size)


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
