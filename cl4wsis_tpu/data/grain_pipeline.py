"""Grain-based host input pipeline (production loader).

The reference loads with torch DataLoader + 4 worker processes
(``scripts/run.sh:6``, ``run.py:72-77``). The SPMD equivalent here uses
Google Grain: a random-access source over the incremental dataset, sharded
by JAX process, deterministic per-epoch shuffling, multiprocess prefetch.
Falls back gracefully — `data/loader.py`'s thread loader remains the
zero-dependency default.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator

import numpy as np


class _Source:
    """grain RandomAccessDataSource over an IncrementalInstanceDataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = self._dataset[int(idx)]
        return {k: v for k, v in s.items() if k != "fname"}


def make_grain_loader(dataset, batch_size: int, *, seed: int = 42,
                      num_workers: int = 0, num_epochs: int | None = None,
                      drop_remainder: bool = True):
    """Returns a grain DataLoader yielding collated numpy batch dicts,
    sharded across JAX processes."""
    import grain.python as gp

    sampler = gp.IndexSampler(
        num_records=len(dataset),
        shuffle=True,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=gp.ShardByJaxProcess(drop_remainder=True),
    )
    return gp.DataLoader(
        data_source=_Source(dataset),
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size,
                             drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )


class GrainLoader:
    """Adapter exposing the repo's Loader.epoch(epoch) interface."""

    def __init__(self, dataset, batch_size: int, seed: int = 42,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = num_workers

    def __len__(self) -> int:
        import jax
        return (len(self.dataset) // jax.process_count()) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, Any]]:
        set_epoch = getattr(self.dataset, "set_epoch", None)
        if set_epoch is not None:
            # before DataLoader construction so worker processes pickle the
            # dataset with the epoch already set
            set_epoch(epoch)
        loader = make_grain_loader(self.dataset, self.batch_size,
                                   seed=self.seed + epoch, num_epochs=1,
                                   num_workers=self.num_workers)
        yield from loader
