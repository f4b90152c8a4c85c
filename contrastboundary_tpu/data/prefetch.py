"""Background-thread batch prefetching.

The reference overlaps host preprocessing with device compute via tf.data's
internal thread pool (tensorflow/datasets/base.py from_generator + map
num_parallel_calls) / torch DataLoader workers; here a bounded-queue thread
pool does the same for the numpy pipeline: N workers prepare crops ahead of
the training loop while the TPU runs the previous step.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


def prefetch(iterator_factory: Callable[[], Iterator], depth: int = 2) -> Iterator:
    """Run `iterator_factory()` in a daemon thread, buffering `depth` items."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator_factory():
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
