"""Background input prefetching for the training loop.

The reference keeps the host busy between steps (pickle reads +
featurization on the training thread; its DataLoader workers only cover
the torch path, framedipt/data/utils.py:469-510). On TPU the jitted step is
milliseconds, so synchronous featurization stalls the chip. This wraps any
batch iterator in a daemon thread + bounded queue so host-side work for
batch N+1..N+size overlaps device compute for batch N.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

_SENTINEL = object()


class Prefetcher:
    """Iterate ``src`` on a background thread, ``size`` batches ahead.

    Exceptions raised by the source iterator are re-raised on the consuming
    thread at the point of ``__next__``. Call ``close()`` (or exhaust the
    iterator / use as a context manager) to stop early.
    """

    def __init__(self, src: Iterable[Any], size: int = 4) -> None:
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, size))
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(src),), daemon=True
        )
        self._thread.start()

    def _worker(self, it: Iterator[Any]) -> None:
        try:
            for item in it:
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as exc:  # noqa: BLE001 - re-raised on consumer
            self._error = exc
        finally:
            while not self._stop.is_set():
                try:
                    self._queue.put(_SENTINEL, timeout=0.1)
                    return
                except queue.Full:
                    continue

    def __iter__(self) -> "Prefetcher":
        return self

    def __next__(self) -> Any:
        item = self._queue.get()
        if item is _SENTINEL:
            self._thread.join()
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item

    def close(self) -> None:
        self._stop.set()
        # Drain so the worker can observe the stop flag if blocked on put.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __enter__(self) -> "Prefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def prefetch(src: Iterable[Any], size: int = 4) -> Prefetcher:
    return Prefetcher(src, size=size)
