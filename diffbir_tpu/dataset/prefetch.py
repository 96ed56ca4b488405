"""Background-thread prefetching for host data pipelines.

The reference relies on torch DataLoader workers (SURVEY.md §2.8). Here host
batch synthesis (decode + degradation + batch transform) runs in worker
threads ahead of the training loop, and the leading batches are staged onto
the device mesh so `next()` returns device-resident arrays — overlapping
input processing with TPU steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class PrefetchIterator:
    def __init__(
        self,
        batch_iter: Iterator,
        transform: Optional[Callable] = None,
        device_put: Optional[Callable] = None,
        depth: int = 2,
    ):
        """batch_iter yields host batches; ``transform`` (e.g. the
        Real-ESRGAN batch transform) runs in the worker thread; ``device_put``
        stages the result (e.g. NamedSharding placement)."""
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()

        def worker():
            try:
                for batch in batch_iter:
                    if self._stop.is_set():
                        return
                    if transform is not None:
                        batch = transform(batch)
                    if device_put is not None:
                        batch = device_put(batch)
                    self._q.put(batch)
            except Exception as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
