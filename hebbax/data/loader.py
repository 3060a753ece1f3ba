"""Host-side batch loader with threaded prefetch.

Replaces torch's DataLoader(num_workers=8, pin_memory)
(/root/reference/train_sup_2d.py:139-140): a worker pool decodes/augments
items, batches are assembled in listdir order or a per-epoch permutation,
and a bounded queue keeps a couple of ready batches ahead of the
accelerator.  Sharded device placement happens in the train loop
(jax.device_put against a NamedSharding), not here.
"""

import concurrent.futures
import queue
import threading
from typing import Iterator

import numpy as np


def collate(items):
    """Stack item dicts into a batch dict (numpy)."""
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals
    return batch


class Loader:
    """Iterable over batches of a SegDataset2D-like dataset (anything with
    __len__ and .get(index, rng))."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False,
                 num_workers: int = 8, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self, epoch: int):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        epoch = self._epoch
        self._epoch += 1
        idx = self._indices(epoch)
        nb = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        pool = concurrent.futures.ThreadPoolExecutor(self.num_workers)

        def load_item(i):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, int(i)]))
            return self.dataset.get(int(i), rng)

        def producer():
            try:
                for b in range(nb):
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    items = list(pool.map(load_item, sel))
                    out_q.put(collate(items))
            except Exception as exc:  # surfaced by the consumer
                out_q.put(exc)
            finally:
                out_q.put(None)
                pool.shutdown(wait=False)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = out_q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
