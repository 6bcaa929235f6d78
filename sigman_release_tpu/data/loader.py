"""Batching, multi-threaded prefetch, and per-host sharding.

Replaces torch DataLoader + accelerate's DistributedSampler: each host reads
only its shard of the item list (``shard_for_host``), worker threads decode
ahead of the training step, and batches are plain numpy dicts ready for
``jax.device_put`` (the train step's donated input).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np


def shard_for_host(items: Sequence, host_id: Optional[int] = None,
                   num_hosts: Optional[int] = None) -> list:
    """Strided split of the item list across hosts (DDP-sampler equivalent)."""
    import jax

    host_id = jax.process_index() if host_id is None else host_id
    num_hosts = jax.process_count() if num_hosts is None else num_hosts
    return list(items)[host_id::num_hosts]


def _collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        if k == "item":
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out


class DataLoader:
    """Thread-pool prefetching loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        nb = len(self)
        batches = [
            order[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        # honor num_workers (the reference leans on torch DataLoader worker
        # processes): items of a batch are fetched concurrently by a thread
        # pool — item decode is native/cv2/numpy and releases the GIL
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def fetch(i):
            return self.dataset[int(i)]

        def producer():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(fetch, idxs))
                    q.put(_collate(items))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            pool.shutdown(wait=False)
