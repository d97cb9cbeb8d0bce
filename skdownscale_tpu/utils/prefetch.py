"""Double-buffered host feed: overlap host work with device compute.

The registry chunk loop and the zarr pipeline both alternate host stages
(store read, decode, ``pack_compact``, ``device_put``) with device passes.
Run serially, the device idles during every host stage — measured 6-8% of
sustained wall at the continental configs (BASELINE 5b/7b) and far more
when the input actually comes off a store.  :func:`prefetched` prepares
item ``i+1`` on one worker thread while the caller consumes item ``i`` —
the classic double buffer (lookahead 1, so peak host memory holds at most
two prepared chunks).

One worker is deliberate: host packing is already multithreaded inside the
C++ packer (``utils.native.pack_compact``), so a deeper pool would only
contend; the thread exists to overlap with DEVICE time, not to parallelize
host work.  ``jax.device_put`` is thread-safe and dispatches async, so
preparing device arrays on the worker is fine.

The reference gets its version of this from dask's worker pipeline
(``/root/reference/skdownscale/pointwise_models/core.py:262`` chunked
apply); here the schedule is explicit and deterministic.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, TypeVar

__all__ = ["prefetched"]

T = TypeVar("T")
U = TypeVar("U")


def prefetched(items: Iterable[T], prep: Callable[[T], U]) -> Iterator[U]:
    """Yield ``prep(item)`` for each item, preparing the NEXT item on a
    worker thread while the caller consumes the current one.

    Exceptions raised by ``prep`` surface in the consumer at the failed
    item's position (``Future.result`` re-raises).  With zero or one item
    this degenerates to a plain map.
    """
    items = list(items)
    if not items:
        return
    if len(items) == 1:
        yield prep(items[0])
        return
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(prep, items[0])
        for nxt in items[1:]:
            cur = fut.result()
            fut = ex.submit(prep, nxt)
            yield cur
        yield fut.result()
