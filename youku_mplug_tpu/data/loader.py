"""Host-side input pipeline: per-host sharding + threaded decode + prefetch.

The TPU-native replacement for torch DataLoader + DistributedSampler
(reference: dataset/__init__.py:158-189).  Differences by design:

- **per-host sharding** (jax.process_index/count) instead of per-GPU rank
  sharding: each host feeds its local devices; inside jit the global batch
  is assembled by GSPMD from the per-host shards.
- **thread pool** decode workers by default: the decode path (native
  libav / cv2) releases the GIL, and threads share the annotation
  memory; no pickling, no fork.  ``workers_impl="process"`` switches to
  forked worker PROCESSES (the torch-DataLoader model) for pipelines
  whose per-sample python/numpy time would otherwise serialize through
  the GIL on many-core hosts — the honest lever if thread scaling ever
  plateaus below the per-core rate on a real TPU host.
- **deterministic order**: epoch shuffles come from a seeded Generator,
  identical on every host (the reference broadcasts a shuffled order from
  rank 0 — seeding makes the broadcast unnecessary, same trick as its
  MetaLoader replacement below).
- **prefetch queue** with a bounded depth to overlap decode with device
  compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

# fork-inherited dataset registry for workers_impl="process": children
# created with the fork start method see the parent's registry without
# pickling the dataset (annotations, decoder handles re-open lazily)
_FORK_DATASETS: Dict[int, Any] = {}


def _fetch_forked(ds_key: int, index: int):
    return _FORK_DATASETS[ds_key][index]


def _default_collate(samples: List[dict]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, np.integer)):
            out[key] = np.asarray(vals, np.int32)
        elif isinstance(vals[0], float):
            out[key] = np.asarray(vals, np.float32)
        else:
            out[key] = vals  # strings/lists stay python
    return out


class ShardedLoader:
    """Iterable over collated numpy batches of this host's shard."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 4, collate: Callable = _default_collate,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 workers_impl: str = "thread"):
        import jax

        if workers_impl not in ("thread", "process"):
            raise ValueError(f"workers_impl must be 'thread' or "
                             f"'process', got {workers_impl!r}")
        self.workers_impl = workers_impl
        self.dataset = dataset
        self.batch_size = batch_size  # per host
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate = collate
        self.rank = (jax.process_index() if process_index is None
                     else process_index)
        self.world = (jax.process_count() if process_count is None
                      else process_count)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _shard_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                self.seed * 100_003 + self.epoch).permutation(n)
        # pad to a multiple of world (wrap) so every host yields the same
        # number of batches — the DistributedSampler contract
        total = ((n + self.world - 1) // self.world) * self.world
        if total > n:
            order = np.concatenate([order, order[:total - n]])
        return order[self.rank::self.world]

    def __len__(self):
        per_host = (len(self.dataset) + self.world - 1) // self.world
        if self.drop_last:
            return per_host // self.batch_size
        return (per_host + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._shard_indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            if self.workers_impl == "process":
                # fork AFTER set_epoch so children see this epoch's
                # sampling state; children run pure host code (decode /
                # numpy), never jax
                import multiprocessing as mp

                key = id(self.dataset)
                _FORK_DATASETS[key] = self.dataset
                pool = ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=mp.get_context("fork"))
                submit = lambda i: pool.submit(_fetch_forked, key, i)
            else:
                pool = ThreadPoolExecutor(self.num_workers)
                submit = lambda i: pool.submit(
                    self.dataset.__getitem__, i)
            try:
                # pipeline: submit the next batch's samples while the
                # previous is being consumed
                pending = []
                for bidx in batches:
                    if stop.is_set():  # consumer broke out early
                        return
                    pending.append([submit(int(i)) for i in bidx])
                    while len(pending) > 2:
                        if stop.is_set():
                            return
                        batch = [f.result() for f in pending.pop(0)]
                        q.put(self.collate(batch))
                for futs in pending:
                    if stop.is_set():
                        return
                    q.put(self.collate([f.result() for f in futs]))
            finally:
                pool.shutdown(wait=False, cancel_futures=True)
                _FORK_DATASETS.pop(id(self.dataset), None)
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


class MetaLoader:
    """Interleave multiple loaders with a seed-derived order identical on
    every host (replaces the reference's rank-0-broadcast shuffle,
    dataset/dataloader.py:10-56)."""

    def __init__(self, loaders: Sequence[ShardedLoader], seed: int = 0):
        self.loaders = list(loaders)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        for ld in self.loaders:
            ld.set_epoch(epoch)

    def __len__(self):
        return sum(len(ld) for ld in self.loaders)

    def __iter__(self):
        order = []
        for i, ld in enumerate(self.loaders):
            order += [i] * len(ld)
        order = np.random.default_rng(
            self.seed * 7_919 + self.epoch).permutation(order)
        its = [iter(ld) for ld in self.loaders]
        for src in order:
            yield int(src), next(its[src])


def length_balanced_shard_indices(lengths, epoch: int, rank: int,
                                  world: int, num_bucket: int = 20,
                                  seed: int = 0) -> np.ndarray:
    """Length-bucketed balanced sharding (reference
    LengthBalancedDistributedSampler, dataset/utils.py:241-296): sort by
    length into buckets, shuffle within buckets per epoch, deal rows round-
    robin so every rank sees a matched length distribution per step."""
    lengths = np.asarray(lengths)
    order = np.argsort(lengths, kind="stable")
    per_bucket = len(order) // num_bucket
    samples = per_bucket // world
    total = samples * world * num_bucket
    g = np.random.default_rng(seed + 810975)
    keep = np.sort(g.choice(len(order), total, replace=False))
    order = order[keep]

    g2 = np.random.default_rng(seed + epoch)
    grid = order.reshape(num_bucket, samples * world).T  # [L, B]
    grid = grid[g2.permutation(grid.shape[0])]
    grid = grid.reshape(world, samples, num_bucket)
    mine = grid[rank].reshape(-1)
    return mine[g2.permutation(len(mine))]


class LengthBalancedLoader(ShardedLoader):
    """ShardedLoader with length-balanced bucketed sharding; the dataset
    must expose ``get_item_length(i)``."""

    def __init__(self, dataset, batch_size, *, num_bucket: int = 20, **kw):
        super().__init__(dataset, batch_size, **kw)
        self.num_bucket = num_bucket
        self._lengths = [dataset.get_item_length(i)
                         for i in range(len(dataset))]

    def _shard_indices(self) -> np.ndarray:
        return length_balanced_shard_indices(
            self._lengths, self.epoch, self.rank, self.world,
            num_bucket=self.num_bucket, seed=self.seed)

    def __len__(self):
        per_bucket = (len(self.dataset) // self.num_bucket)
        samples = per_bucket // self.world
        n = samples * self.num_bucket
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size
