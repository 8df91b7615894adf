"""Host-side streaming: threaded prefetch + double-buffered device transfer.

Replaces the reference's multi-process torch DataLoader
(reference train_fusion.py:60-64, num_workers=3..8, pin_memory) with a
thread-pool decode pipeline that keeps N batches in flight and issues
``jax.device_put`` ahead of consumption, so frame decode and host->HBM
transfer overlap with the device step (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

__all__ = ["PrefetchLoader", "collate"]


def collate(sample: dict) -> dict:
    """Add a leading batch dim of 1 to array fields, keep strings as
    lists (the reference uses torch's default collate with batch 1)."""
    out = {}
    for k, v in sample.items():
        if isinstance(v, np.ndarray):
            out[k] = v[None]
        elif isinstance(v, (int, float, np.integer, np.floating)):
            out[k] = np.asarray([v])
        else:
            out[k] = [v]
    return out


class PrefetchLoader:
    """Iterate a dataset with background workers.

    Args:
      dataset: indexable with __len__/__getitem__ returning frame dicts.
      batch_size: only 1 is supported for the fusion stream (frame order is
        semantically meaningful); larger batches stack along axis 0.
      shuffle: shuffle indices each epoch.
      num_workers: decode threads (0 = synchronous).
      device_put: optional fn applied to each ready batch (e.g.
        jax.device_put) while the previous batch is being consumed.
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 2, prefetch: int = 4,
                 device_put: Optional[Callable] = None, seed: int = 0,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = int(num_workers)
        self.prefetch = max(int(prefetch), 1)
        self.device_put = device_put
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        self._epoch += 1
        if self.drop_last:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        return idx

    def _make_batch(self, batch_idx: Sequence[int]) -> dict:
        samples = [self.dataset[int(i)] for i in batch_idx]
        if len(samples) == 1:
            batch = collate(samples[0])
        else:
            batch = {}
            for k in samples[0]:
                vals = [s[k] for s in samples]
                if isinstance(vals[0], np.ndarray):
                    batch[k] = np.stack(vals)
                else:
                    batch[k] = vals
        if self.device_put is not None:
            batch = {k: (self.device_put(v)
                         if isinstance(v, np.ndarray) else v)
                     for k, v in batch.items()}
        return batch

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.num_workers <= 0:
            for b in batches:
                yield self._make_batch(b)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(self._make_batch(b))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
