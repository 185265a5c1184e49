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

    If the consumer abandons the generator (raises, breaks, or is
    garbage-collected), the worker is cancelled: it stops preparing new
    items and exits instead of blocking forever on a full queue holding
    device batches alive (long-lived pipeline processes otherwise leak
    a thread + queued device arrays per abandoned iteration).
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    errs: list[BaseException] = []
    cancel = threading.Event()

    def put(item) -> bool:
        """Bounded put that gives up when the consumer cancelled."""
        while not cancel.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in thunks:
                if cancel.is_set():
                    return
                if callable(item):
                    item = item()
                if not put(item):
                    return
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            errs.append(exc)
        finally:
            put(_SENTINEL)

    t = threading.Thread(
        target=worker, name="nanopore-prefetch", daemon=True
    )
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if errs:
            raise errs[0]
    finally:
        cancel.set()
