"""Background-thread prefetching for host data pipelines.

The reference relies on torch DataLoader workers (SURVEY.md §2.8). Here host
batch synthesis (decode + degradation + batch transform) runs in a worker
thread ahead of the training loop, and the leading batches are staged onto
the device mesh so `next()` returns device-resident arrays — overlapping
input processing with TPU steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax

_SENTINEL = object()  # worker-done marker (distinct from any batch)


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
        self._done = False  # consumer-side terminal state

        def worker():
            try:
                for batch in batch_iter:
                    if self._stop.is_set():
                        return
                    if transform is not None:
                        batch = transform(batch)
                    if device_put is not None:
                        batch = device_put(batch)
                    # bounded put that stays responsive to close(): a plain
                    # blocking put deadlocks when close() drains and the
                    # worker then fills the queue again (incl. the sentinel)
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except Exception as e:  # surfaced on the consumer side
                self._err = e
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        # Timed get that re-checks the terminal flag: close() from another
        # thread drains the queue (sentinel included) and joins the worker,
        # so an untimed get() here could block forever with no producer left.
        while True:
            if self._done:
                if self._err is not None:
                    raise self._err
                raise StopIteration
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if item is _SENTINEL:
                self._done = True
                if self._err is not None:
                    raise self._err
                raise StopIteration
            return item

    def close(self):
        """Stop the worker and discard any staged batches (frees device
        memory pinned in the queue). Safe to call more than once; __next__
        afterwards raises StopIteration instead of blocking."""
        self._stop.set()
        self._done = True
        # drain so a worker blocked in put() can observe _stop and exit;
        # join BEFORE the final drain so no stale batch is re-enqueued after
        # we last looked
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
