"""Prefetcher semantics: ordering, exceptions, early close, overlap."""
import time

import pytest

from framedipt_tpu.train.prefetch import Prefetcher, prefetch


def test_order_preserved():
    assert list(prefetch(range(100), size=3)) == list(range(100))


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_close_unblocks_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = Prefetcher(gen(), size=2)
    assert next(it) == 0
    it.close()  # must not hang even though the producer is blocked on put
    assert len(produced) < 1000


def test_producer_overlaps_consumer():
    """Producer sleep hides behind consumer sleep: total ~ max, not sum."""
    def slow_gen():
        for i in range(8):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(), size=4):
        time.sleep(0.05)  # consumer work
    elapsed = time.perf_counter() - t0
    # Serial would be ~0.8s; overlapped ~0.45s.
    assert elapsed < 0.65, f"no overlap: {elapsed:.2f}s"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
