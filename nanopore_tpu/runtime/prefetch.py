"""Host/device overlap: background preparation of device batches.

SURVEY.md section 7 hard-parts list: "Host I/O overlap: FASTQ streaming
+ SAM writing must overlap device compute (double-buffered feeds), or
the 10x target dies on input starvation."  Round-1 measurement
(CLAUDE.md): ~18s of a 20s prepare_banded_batch call is the device
upload — serialising it behind each kernel call wastes the chip.

``prefetched(thunks, depth)`` runs the thunk iterator on a background
thread, keeping up to ``depth`` prepared results queued while the caller
consumes them: batch i+1's host pack + upload overlaps batch i's kernel.
JAX transfers are thread-safe; the consumer only ever touches completed
results.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetched(
    thunks: Iterable[Callable[[], T]] | Iterator[T], depth: int = 2
) -> Iterator[T]:
    """Yield items of ``thunks`` with background preparation.

    ``thunks`` may be an iterator of zero-arg callables (each is called
    on the worker thread) or a generator whose ``next()`` itself does
    the expensive preparation — both run off the consumer thread.
    Exceptions on the worker re-raise at the consumption point.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    errs: list[BaseException] = []

    def worker():
        try:
            for item in thunks:
                if callable(item):
                    item = item()
                q.put(item)
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            errs.append(exc)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(
        target=worker, name="nanopore-prefetch", daemon=True
    )
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    t.join()
    if errs:
        raise errs[0]
