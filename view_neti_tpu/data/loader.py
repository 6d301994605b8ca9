"""Prefetching data loader: overlap host-side image work with device steps.

The reference leans on torch DataLoader worker processes (reference
training/coach.py:704-725). On a TPU VM the natural design is a background
thread that keeps a small queue of ready batches while the accelerator runs
the step: PIL/numpy release the GIL for the heavy work, and device transfer
happens on the consumer side (jnp.asarray inside the jit dispatch).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

from view_neti_tpu.data.dataset import DataLoader, TextualInversionDataset


class PrefetchLoader:
    """Wraps DataLoader with an N-deep background prefetch queue.

    Mode-3 scene resampling happens inside DataLoader.__iter__, keyed by
    the global batch counter (r3 deterministic schedule) — the producer
    thread just runs the iterator, so prefetch and resume-fast-forward
    compose. reset_each_batch is retained for signature compatibility
    (the counter-keyed reset supersedes it)."""

    def __init__(self, dataset: TextualInversionDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, depth: int = 2,
                 reset_each_batch: bool = False, group_size=None,
                 start_batch: int = 0):
        self.inner = DataLoader(dataset, batch_size, shuffle=shuffle,
                                seed=seed, group_size=group_size,
                                start_batch=start_batch)
        self.dataset = dataset
        self.depth = depth
        self.reset_each_batch = reset_each_batch
        self._q: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _produce(self):
        try:
            for batch in self.inner:
                if self._stop.is_set():
                    return
                self._q.put(batch)
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator:
        self._stop.clear()
        self._q = queue.Queue(maxsize=self.depth)
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()
        while True:
            batch = self._q.get()
            if batch is None:
                break
            yield batch

    def close(self):
        self._stop.set()
        if self._q is not None:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
