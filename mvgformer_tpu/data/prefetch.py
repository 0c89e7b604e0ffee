"""Background batch prefetching.

Replaces the reference's DataLoader worker pool
(/root/reference/run/train_3d.py:216-238): host-side image load + affine
warp and the host->device sharded transfer run on a producer thread with
a bounded queue (double-buffered by default), overlapping the device
step. The consumer tracks how long it blocked waiting (`last_wait_s`) so
the train loop can log whether the loader is serializing the step.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterable, Iterator, Tuple


class Prefetcher:
    """Wrap a (idx, host_batch) iterator; yields (idx, placed_batch).

    place_fn runs ON THE PRODUCER THREAD (e.g. shard_batch: device_put
    with a NamedSharding starts the async host->device copy there).

    The consumer may stop early (e.g. --max_steps breaking mid-epoch);
    `close()` — called automatically when the consuming generator is
    closed/garbage-collected or via the context manager — unblocks and
    joins the producer so queued device batches don't stay pinned in HBM.
    """

    _SENTINEL = object()

    def __init__(self, iterator: Iterable, place_fn: Callable,
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err = []
        self._stop = threading.Event()
        self.last_wait_s = 0.0
        self.total_wait_s = 0.0

        def worker():
            try:
                for idx, batch in iterator:
                    if self._stop.is_set():
                        break
                    placed = (idx, place_fn(batch))
                    # bounded put that re-checks the stop flag so close()
                    # can't deadlock against a full queue
                    while not self._stop.is_set():
                        try:
                            self._q.put(placed, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # noqa: BLE001
                self._err.append(e)
            finally:
                # blocking-but-interruptible: put_nowait could DROP the
                # sentinel on a full queue and deadlock the consumer
                while not self._stop.is_set():
                    try:
                        self._q.put(self._SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        """Stop the producer and drop queued batches (frees device refs).

        Join BEFORE draining: a put() blocked in its retry window could
        otherwise land one more placed batch after the drain and leave it
        pinned in the dead queue."""
        self._stop.set()
        self._thread.join(timeout=5.0)
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self) -> Iterator[Tuple]:
        try:
            while True:
                t0 = time.perf_counter()
                item = self._q.get()
                self.last_wait_s = time.perf_counter() - t0
                self.total_wait_s += self.last_wait_s
                if item is self._SENTINEL:
                    if self._err:
                        raise self._err[0]
                    return
                yield item
        finally:
            self.close()
