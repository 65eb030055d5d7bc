"""Host-side prefetching data loader (replaces torch DataLoader).

The device wants an uninterrupted stream of batches; the host's job is to hide
decode/transform latency behind TPU compute. Design:

- `num_workers` threads map dataset.__getitem__ over the sampler's index
  stream (PIL/numpy release the GIL for the heavy parts);
- an assembler collates sample dicts into batched numpy arrays (stack on a new
  leading dim; non-array metadata collected into lists);
- a bounded queue holds `prefetch` ready batches so the training loop never
  waits on IO in steady state.

Each process loads only its per-process share of the global batch
(`global_batch / process_count`; the sampler already strides indices across
processes — reference parity with InfiniteSampler + DataLoader,
/root/reference/ganslate/utils/builders.py:63-76).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from ganslate_tpu.utils import communication


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of sample dicts into one batch dict (recursively)."""
    out: Dict[str, Any] = {}
    first = samples[0]
    for key in first:
        values = [s[key] for s in samples]
        if isinstance(first[key], dict):
            out[key] = collate(values)
        elif isinstance(first[key], (str, bytes)):
            out[key] = values  # strings stay lists (metadata)
        elif isinstance(first[key], np.ndarray) or np.isscalar(first[key]):
            out[key] = np.stack([np.asarray(v) for v in values])
        else:
            out[key] = values  # metadata passthrough (paths, tuples, ...)
    return out


class DataLoader:
    """Iterable over collated batches.

    `batch_size` is the GLOBAL batch size; this loader yields this process's
    local share (global / process_count). A finite sampler yields a final
    short batch unless `drop_last`.
    """

    def __init__(self, dataset, sampler, batch_size: int, num_workers: int = 4,
                 prefetch: int = 2, drop_last: bool = False):
        self.dataset = dataset
        self.sampler = sampler
        world = communication.get_world_size()
        assert batch_size % world == 0, \
            f"global batch {batch_size} not divisible by {world} processes"
        self.local_batch_size = batch_size // world
        self.num_workers = max(0, int(num_workers))
        self.prefetch = max(1, int(prefetch))
        self.drop_last = drop_last
        # Per-sample RNG plumbing: datasets whose __getitem__ accepts an
        # `rng` keyword get a np.random.Generator seeded by (sampler seed,
        # raw stream position) — every random draw in the data plane (domain-B
        # picks, crop/flip/zoom params) becomes a pure function of the stream
        # position, so worker-thread scheduling cannot reorder draws and a
        # checkpoint-resumed stream reproduces the uninterrupted one exactly.
        # Datasets without the keyword (e.g. user project datasets) keep the
        # global-RNG behavior.
        import inspect
        try:
            params = inspect.signature(dataset.__getitem__).parameters
            self._dataset_takes_rng = "rng" in params
        except (TypeError, ValueError):
            self._dataset_takes_rng = False

    def __len__(self):
        if hasattr(self.sampler, "__len__"):
            n = len(self.sampler)
            if self.drop_last:
                return n // self.local_batch_size
            return -(-n // self.local_batch_size)
        raise TypeError("Infinite loader has no length")

    def _index_batches(self) -> Iterator[List[tuple]]:
        """Yields batches of (index, raw_position) pairs; raw_position is the
        sample's slot in the shared pre-striding stream (rank + pos*world) —
        globally unique and stable across checkpoint-resume, so it can seed
        the per-sample RNG."""
        rank = communication.get_rank()
        world = communication.get_world_size()
        pos = int(getattr(self.sampler, "position", 0))
        batch: List[tuple] = []
        for idx in self.sampler:
            batch.append((idx, rank + pos * world))
            pos += 1
            if len(batch) == self.local_batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def _load(self, index: int, raw_position: int):
        if self._dataset_takes_rng:
            seed = int(getattr(self.sampler, "seed", 0))
            rng = np.random.default_rng([seed, raw_position])
            return self.dataset.__getitem__(index, rng=rng)
        return self.dataset[index]

    def _iter_sync(self) -> Iterator[Dict[str, Any]]:
        for indices in self._index_batches():
            yield collate([self._load(i, p) for i, p in indices])

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.num_workers == 0:
            yield from self._iter_sync()
            return
        yield from self._iter_threaded()

    def _iter_threaded(self) -> Iterator[Dict[str, Any]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _SENTINEL = object()

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    # Pipeline: keep `prefetch + 1` batch futures in flight.
                    pending: "queue.Queue" = queue.Queue()
                    idx_iter = self._index_batches()

                    def submit_next():
                        try:
                            indices = next(idx_iter)
                        except StopIteration:
                            return False
                        futures = [pool.submit(self._load, i, p)
                                   for i, p in indices]
                        pending.put(futures)
                        return True

                    for _ in range(self.prefetch + 1):
                        if not submit_next():
                            break
                    while not pending.empty():
                        if stop.is_set():
                            return
                        futures = pending.get()
                        batch = collate([f.result() for f in futures])
                        submit_next()
                        # Block politely so we can notice `stop`.
                        while not stop.is_set():
                            try:
                                out_q.put(batch, timeout=0.5)
                                break
                            except queue.Full:
                                continue
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)
                return
            out_q.put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
