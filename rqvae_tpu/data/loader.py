"""Data loader: threaded decode + device prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(/root/reference/rqvae/trainers/trainer.py:45-88): deterministic per-epoch
shuffling (set_epoch semantics), worker threads for JPEG decode/augment, and
an async prefetch queue that lands batches in device memory (sharded over the
data mesh axis when a sharding is given) so TPU steps are never input-bound.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

import jax


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        sharding=None,  # jax.sharding.Sharding for the device-put
        collate: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.sharding = sharding
        self.collate = collate or default_collate
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, self._epoch]))
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.drop_last:
            idx = idx[: (n // self.batch_size) * self.batch_size]
        return idx

    def __iter__(self) -> Iterator:
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that re-checks `stop` so an abandoned iterator
            never leaves the producer blocked on a full queue."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, b))
                        batch = self.collate(items)
                        if self.sharding is not None:
                            batch = jax.tree.map(
                                lambda x: jax.device_put(x, self.sharding), batch
                            )
                        if not put_or_stop(batch):
                            return
            except Exception as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def default_collate(items):
    """(img, label) tuples -> {"images": [B,H,W,C], "labels"/"cond": [B]}."""
    first = items[0]
    if isinstance(first, tuple) and len(first) == 2:
        imgs = np.stack([np.asarray(it[0], np.float32) for it in items])
        second = items[0][1]
        if isinstance(second, (int, np.integer)):
            labels = np.asarray([it[1] for it in items], np.int32)
        else:  # text tokens
            labels = np.stack([np.asarray(it[1], np.int32) for it in items])
        return {"images": imgs, "cond": labels}
    if isinstance(first, dict):
        return {
            k: np.stack([np.asarray(it[k]) for it in items]) for k in first
        }
    return np.stack([np.asarray(it) for it in items])
