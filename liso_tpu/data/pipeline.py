"""Host input pipeline: prefetch of collated batches to device.

Replaces the reference's torch DataLoader worker processes
(SURVEY.md §2.9): worker FORK-processes (default, GIL-free like the
reference's DataLoader workers — thread pools lose to GIL contention at
AV2 scale, see benchmarks/input_pipeline_bench.py) assemble HostSamples,
a background thread keeps a small queue of device-resident batches
(double buffering), and shuffling / epoch handling lives here. Works with
any LidarDataset. Set use_processes=False for the thread pool (cheap for
tiny test datasets, avoids fork overhead).
"""
from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from functools import partial
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

from liso_tpu.data.dataset import LidarDataset, collate

_WORKER_DS: Optional[LidarDataset] = None


def _init_worker(ds):
    global _WORKER_DS
    _WORKER_DS = ds
    # NOTE: no PID reseeding (the reference's worker_init_fn pattern,
    # torch_dataset_commons.py:74): per-sample randomness is a pure
    # function of (seed, epoch, idx) via LidarDataset.index_rng, so every
    # worker builds identical samples regardless of assignment — required
    # for lock-step multi-host DP and reproducibility.


def _worker_get(idx: int, epoch: int = 0):
    _WORKER_DS.epoch = epoch
    return _WORKER_DS[int(idx)]


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
        use_processes: Optional[bool] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        if use_processes is None:
            # fork workers pay off once sample assembly dominates; tiny
            # test datasets stay on threads
            use_processes = num_workers > 1 and getattr(
                dataset.cfg, "n_max", 0
            ) >= 16384
        self.use_processes = use_processes
        if use_processes:
            try:
                ctx = mp.get_context("fork")
                self.pool = ProcessPoolExecutor(
                    max_workers=max(num_workers, 1),
                    mp_context=ctx,
                    initializer=_init_worker,
                    initargs=(dataset,),
                )
            except (ValueError, OSError):  # fork unavailable
                self.use_processes = False
                self.pool = ThreadPoolExecutor(
                    max_workers=max(num_workers, 1)
                )
        else:
            self.pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
        self.prefetch = prefetch
        self.device_put = device_put or (lambda x: x)
        self.drop_last = drop_last
        self._epoch = 0  # bumped per __iter__: varies augmentations

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        epoch = self._epoch
        self._epoch += 1

        def produce():
            idx = self._epoch_indices()
            bs = self.batch_size
            n_full = len(idx) // bs if self.drop_last else -(-len(idx) // bs)
            self.dataset.epoch = epoch  # thread pools share the dataset
            for b in range(n_full):
                if stop.is_set():
                    return
                chunk = idx[b * bs : (b + 1) * bs]
                if self.use_processes:
                    samples = list(
                        self.pool.map(
                            partial(_worker_get, epoch=epoch), chunk
                        )
                    )
                else:
                    samples = list(
                        self.pool.map(self.dataset.__getitem__, chunk)
                    )
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
