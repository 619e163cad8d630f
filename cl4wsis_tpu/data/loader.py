"""Host batch loader: shuffled epochs, fixed-shape collation, prefetch.

Replaces torch DataLoader + DistributedSampler (``run.py:72-77``): in SPMD
each process loads its contiguous shard of the global batch; a background
thread prefetches while the device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        if k == "fname":
            continue
        out[k] = np.stack([s[k] for s in samples])
    return out


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 42, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(idxs)
        # per-process contiguous shard (DistributedSampler equivalent)
        shard = idxs[self.process_index::self.process_count]
        n_batches = len(self)

        def produce(q):
            for b in range(n_batches):
                batch_idx = shard[b * self.batch_size:(b + 1) * self.batch_size]
                q.put(_collate([self.dataset[int(i)] for i in batch_idx]))
            q.put(None)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item


def eval_samples(dataset) -> Iterator[Dict[str, np.ndarray]]:
    """Sequential bs=1 eval iterator (the reference protocol)."""
    for i in range(len(dataset)):
        yield dataset[i]
