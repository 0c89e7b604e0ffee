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
    """

    _SENTINEL = object()

    def __init__(self, iterator: Iterable, place_fn: Callable,
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err = []
        self.last_wait_s = 0.0
        self.total_wait_s = 0.0

        def worker():
            try:
                for idx, batch in iterator:
                    self._q.put((idx, place_fn(batch)))
            except BaseException as e:  # noqa: BLE001
                self._err.append(e)
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator[Tuple]:
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
