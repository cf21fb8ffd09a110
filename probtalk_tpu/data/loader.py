"""Device-feed pipeline: background host->device prefetch.

The last hop of the input pipeline (after the C++ batch producer or the
numpy dataset): overlap `jax.device_put` of batch k+1 with the computation
of batch k — the TPU-native analogue of the reference DataLoader's
pin_memory + async H2D copies.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


def prefetch_to_device(batches: Iterable, put: Optional[Callable] = None,
                       depth: int = 2) -> Iterator:
    """Yield device-resident batches with `depth` transfers in flight.

    put: device placement fn (default jax.device_put; pass
    parallel.shard_batch for mesh sharding).
    """
    import jax

    put = put or jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    err: list = []

    def producer():
        try:
            for b in batches:
                q.put(put(b))
        except BaseException as e:  # surfaced to the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    t.join()
    if err:
        raise err[0]
