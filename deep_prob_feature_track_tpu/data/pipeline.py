"""Host-side batching pipeline feeding jax (replaces torch DataLoader).

Collates dict items into stacked numpy batches with background-thread
prefetch; in multi-host runs each process iterates its own shard and feeds
``jax.make_array_from_process_local_data`` (see ``parallel/``).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(items: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of item dicts into one batch dict (numpy)."""
    batch: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.floating, np.integer)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals  # e.g. the 'name' metadata dicts
    return batch


class BatchLoader:
    """Iterates a dataset in batches with optional shuffling and prefetch.

    :param dataset: any object with __len__/__getitem__ returning dicts
    :param drop_last: drop the trailing incomplete batch (static shapes for
        jit; the default keeps it and pads by wrapping, see ``pad_mode``)
    :param pad_mode: 'wrap' pads the final batch by re-sampling from the
        start (keeps static shapes; extra items are flagged in 'pad_mask')
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        pad_mode: str = "wrap",
        prefetch: int = 2,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.pad_mode = pad_mode
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_index :: self.num_shards]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        n = len(idx)
        for start in range(0, n, self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    return
                pad = self.batch_size - len(chunk)
                n_real = len(chunk)
                # wrap-pad; np.resize repeats indices when the dataset is
                # smaller than the pad itself
                chunk = np.concatenate([chunk, np.resize(idx, pad)])
                mask = np.concatenate(
                    [np.ones(n_real), np.zeros(pad)]
                ).astype(bool)
            else:
                mask = np.ones(self.batch_size, dtype=bool)
            items = [self.dataset[int(i)] for i in chunk]
            batch = collate(items)
            batch["pad_mask"] = mask
            yield batch

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: List[BaseException] = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # propagate loader errors
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is sentinel:
                break
            yield b
        if err:
            raise err[0]
