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
    """Run `iterator_factory()` in a daemon thread, buffering `depth` items.
    Producer exceptions propagate to the consumer."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator_factory():
                q.put(item)
            q.put(_END)
        except BaseException as e:  # re-raised on the consumer side
            q.put(("__prefetch_error__", e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
            raise item[1]
        yield item
