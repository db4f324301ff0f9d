"""Threaded prefetching data loader (replaces torch DataLoader,
ref: data/base.py:311-318). Host-side numpy only; batches are dicts of
stacked arrays ready for device_put.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples):
    """Stack a list of dict samples (ref collate_fn, data/base.py:320-332)."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Iterates dict batches with background worker threads + prefetch.

    Multi-host: pass process_index/process_count (e.g.
    jax.process_index()/jax.process_count()) and each host loads only its
    interleaved slice of every epoch's order — the per-host batch_size
    should then be global_batch / process_count. All hosts derive the
    same shuffle from the shared seed, so the union of slices is exactly
    one epoch (the reference's DataParallel analogue never needed this;
    it is the standard JAX multi-host data path).
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=4,
                 drop_last=True, seed=0, prefetch=2,
                 process_index=0, process_count=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        if self.process_count > 1:
            # interleaved split of the SHARED shuffle: host i takes
            # positions i, i+P, i+2P, ... (same length on every host)
            per = n // self.process_count
            order = order[self.process_index::self.process_count][:per]
        self._epoch += 1

        batches = [
            order[i:i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item):
            """put() that aborts when the consumer abandoned the epoch —
            a plain blocking put on the full prefetch queue would leak
            this thread (and its pool) forever after an early exit like
            Trainer's num_iter return."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # a terminal item MUST reach the consumer even if a worker
            # raises — otherwise the training loop deadlocks on q.get();
            # exceptions are forwarded and re-raised in the consumer (a
            # silently truncated epoch would be worse than the crash)
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(self.dataset.__getitem__, idxs)
                        )
                        if not put_or_stop(collate(samples)):
                            return
            except BaseException as e:  # noqa: BLE001 — forwarded
                put_or_stop(e)
            else:
                put_or_stop(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    break
                if isinstance(b, BaseException):
                    raise b
                yield b
        finally:
            stop.set()
