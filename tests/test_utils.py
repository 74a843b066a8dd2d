"""Unit tests for the concurrency primitives and observability helpers."""

import threading
import time

from vectorlite_tpu.observability import LatencyRecorder
from vectorlite_tpu.utils import AtomicCounter, RWLock


class TestRWLock:
    def test_parallel_readers(self):
        lock = RWLock()
        inside = []
        barrier = threading.Barrier(3, timeout=5)

        def reader():
            with lock.read():
                inside.append(1)
                barrier.wait()  # all three readers inside simultaneously

        threads = [threading.Thread(target=reader) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(inside) == 3

    def test_writer_excludes_readers(self):
        lock = RWLock()
        log = []

        def writer():
            with lock.write():
                log.append("w-start")
                time.sleep(0.05)
                log.append("w-end")

        def reader():
            time.sleep(0.01)  # let the writer grab the lock first
            with lock.read():
                log.append("r")

        tw = threading.Thread(target=writer)
        tr = threading.Thread(target=reader)
        tw.start()
        tr.start()
        tw.join()
        tr.join()
        assert log == ["w-start", "w-end", "r"]

    def test_writer_preference(self):
        # a waiting writer blocks new readers
        lock = RWLock()
        order = []
        r1_in = threading.Event()
        release_r1 = threading.Event()

        def r1():
            with lock.read():
                r1_in.set()
                release_r1.wait(timeout=5)
            order.append("r1-out")

        def w():
            r1_in.wait(timeout=5)
            with lock.write():
                order.append("w")

        def r2():
            r1_in.wait(timeout=5)
            time.sleep(0.05)  # writer is now queued
            with lock.read():
                order.append("r2")

        threads = [threading.Thread(target=f) for f in (r1, w, r2)]
        for t in threads:
            t.start()
        time.sleep(0.15)
        release_r1.set()
        for t in threads:
            t.join()
        assert order == ["r1-out", "w", "r2"]

    def test_atomic_counter(self):
        counter = AtomicCounter(5)
        seen = []
        lock = threading.Lock()

        def worker():
            for _ in range(100):
                v = counter.fetch_add(1)
                with lock:
                    seen.append(v)

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(seen) == list(range(5, 405))
        assert counter.load() == 405


class TestLatencyRecorder:
    def test_percentiles(self):
        rec = LatencyRecorder()
        for ms in range(1, 101):
            rec.record("GET /x", ms / 1000.0)
        rec.record("GET /x", 5.0, ok=False)
        snap = rec.snapshot()["GET /x"]
        assert snap["count"] == 101
        assert snap["errors"] == 1
        assert 40 <= snap["p50_ms"] <= 60
        assert snap["p99_ms"] >= snap["p50_ms"]
        assert snap["max_ms"] == 5000.0

    def test_reservoir_bounded(self):
        rec = LatencyRecorder()
        for i in range(5000):
            rec.record("r", 0.001)
        assert rec.snapshot()["r"]["count"] == 5000
        assert len(rec._samples["r"]) <= rec._MAX_SAMPLES
