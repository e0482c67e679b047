"""Batching / prefetching loader.

Replaces torch DataLoader + DistributedSampler (ref trainer:203-231):
deterministic epoch shuffling, fixed-shape numpy batches, per-host sharding
for multi-host data parallelism, and (optional) background-thread prefetch
overlapping host data generation with the device step.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0].keys()}


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        # contiguous per-host shard (DistributedSampler semantics)
        per = n // self.num_shards
        return idx[self.shard_id * per : (self.shard_id + 1) * per]

    def _gen(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices()
        nb = len(idx) // self.batch_size
        for b in range(nb):
            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield collate([self.dataset[int(i)] for i in chunk])
        tail = idx[nb * self.batch_size :]
        if len(tail) and not self.drop_last:
            # pad the ragged tail by repeating its first samples so batch
            # shapes stay static (no recompilation); callers that must not
            # double-count can mask by the true count
            pad = np.resize(tail, self.batch_size)
            yield collate([self.dataset[int(i)] for i in pad])
        self._epoch += 1

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._gen()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for item in self._gen():
                    q.put(item)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item

    def epochs(self) -> Iterator[Dict[str, np.ndarray]]:
        """Endless iterator over epochs."""
        while True:
            yield from self
