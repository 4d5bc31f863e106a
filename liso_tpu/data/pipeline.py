"""Host input pipeline: threaded prefetch of collated batches to device.

Replaces the reference's torch DataLoader worker processes
(SURVEY.md §2.9): a thread pool assembles HostSamples, a background thread
keeps a small queue of device-resident batches (double buffering), and
shuffling / epoch handling lives here. Works with any LidarDataset.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

from liso_tpu.data.dataset import LidarDataset, collate


class Prefetcher:
    def __init__(
        self,
        dataset: LidarDataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        device_put: Optional[Callable] = None,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
        self.prefetch = prefetch
        self.device_put = device_put or (lambda x: x)
        self.drop_last = drop_last

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            idx = self._epoch_indices()
            bs = self.batch_size
            n_full = len(idx) // bs if self.drop_last else -(-len(idx) // bs)
            for b in range(n_full):
                if stop.is_set():
                    return
                chunk = idx[b * bs : (b + 1) * bs]
                samples = list(self.pool.map(self.dataset.__getitem__, chunk))
                batch = collate(samples)
                q.put(self.device_put(batch))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
