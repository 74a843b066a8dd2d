"""Concurrency hammering — the TSan-style analogue for the lock layer.

The reference's safety is by construction (RwLock + atomic ids,
reference: src/client.rs:243-247); here threads hammer a collection with
concurrent adds/searches/deletes and we assert the invariants: unique ids,
consistent counts, no exceptions leaking from the lock layer, readers
never observing partial state.
"""

import threading

import numpy as np
import pytest

from vectorlite_tpu import (
    IndexType,
    MockEmbeddingFunction,
    SimilarityMetric,
    VectorLiteClient,
)


@pytest.mark.parametrize("index_type", [IndexType.FLAT, IndexType.HNSW])
def test_concurrent_adds_unique_ids(index_type):
    client = VectorLiteClient(MockEmbeddingFunction(dimension=16))
    metric = SimilarityMetric.COSINE if index_type is IndexType.HNSW else None
    client.create_collection("c", index_type, metric)

    ids: list[int] = []
    ids_lock = threading.Lock()
    errors: list[Exception] = []

    def worker(wid):
        try:
            for i in range(25):
                vid = client.add_text_to_collection("c", f"w{wid} doc {i}")
                with ids_lock:
                    ids.append(vid)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    assert len(ids) == 200
    assert len(set(ids)) == 200  # atomic id allocation
    assert client.get_collection_info("c").count == 200


def test_concurrent_read_write_mix():
    client = VectorLiteClient(MockEmbeddingFunction(dimension=16))
    client.create_collection("c", IndexType.FLAT)
    for i in range(50):
        client.add_text_to_collection("c", f"seed {i}")

    stop = threading.Event()
    errors: list[Exception] = []

    def searcher():
        try:
            while not stop.is_set():
                res = client.search_text_in_collection("c", "seed 7", 5)
                # readers must always see a consistent (sorted) view
                scores = [r.score for r in res]
                assert scores == sorted(scores, reverse=True)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def writer():
        try:
            for i in range(30):
                vid = client.add_text_to_collection("c", f"new {i}")
                if i % 3 == 0:
                    client.delete_from_collection("c", vid)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    readers = [threading.Thread(target=searcher) for _ in range(4)]
    writers = [threading.Thread(target=writer) for _ in range(2)]
    for t in readers + writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    for t in readers:
        t.join()

    assert not errors, errors
    info = client.get_collection_info("c")
    assert info.count == 50 + 2 * 30 - 2 * 10


def test_concurrent_save_during_writes(tmp_path):
    client = VectorLiteClient(MockEmbeddingFunction(dimension=8))
    client.create_collection("c", IndexType.FLAT)
    for i in range(20):
        client.add_text_to_collection("c", f"doc {i}")

    errors: list[Exception] = []

    def saver():
        try:
            for i in range(5):
                client.get_collection("c").save_to_file(
                    tmp_path / f"snap{i}.vlc"
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def writer():
        try:
            for i in range(40):
                client.add_text_to_collection("c", f"more {i}")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=saver), threading.Thread(target=writer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # every snapshot must be a loadable, internally-consistent .vlc
    from vectorlite_tpu import load_collection_from_file

    for i in range(5):
        loaded = load_collection_from_file(tmp_path / f"snap{i}.vlc")
        info = loaded.get_info()
        assert 20 <= info.count <= 60


def test_concurrent_hnsw_native_searches():
    """Regression: the native builder's visited/epoch scratch is shared;
    concurrent searches under the read lock must not race (C++ mutex)."""
    client = VectorLiteClient(MockEmbeddingFunction(dimension=24))
    client.create_collection("h", IndexType.HNSW, SimilarityMetric.COSINE)
    for i in range(300):
        client.add_text_to_collection("h", f"doc {i}")

    errors: list[Exception] = []
    results: list[set] = []
    res_lock = threading.Lock()

    def searcher():
        try:
            for _ in range(40):
                res = client.search_text_in_collection("h", "doc 7", 5)
                with res_lock:
                    results.append({r.id for r in res})
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # deterministic graph + query => every search returns the same set
    assert len({frozenset(r) for r in results}) == 1


def test_concurrent_host_scan_cold_norms():
    """Many sibling readers hitting a COLD row-norm cache concurrently:
    the lazy f64 norm table (index/flat.py:_host_norms) must never expose
    a half-filled or freshly-reallocated array to another reader."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from vectorlite_tpu import FlatIndex, SimilarityMetric, Vector

    rng = np.random.default_rng(11)
    n, d = 2000, 32
    data = rng.normal(size=(n, d))
    idx = FlatIndex(d, [Vector(id=i, values=data[i], text="") for i in range(n)])
    q = data[123]
    expected = 123

    def hit(_):
        r = idx.search(q, 1, SimilarityMetric.COSINE)
        return r[0].id, r[0].score

    for _ in range(5):
        # reset the cache each round so every round races the realloc path
        idx._host_norms64 = None
        idx._host_norms_n = 0
        with ThreadPoolExecutor(8) as ex:
            results = list(ex.map(hit, range(32)))
        for rid, score in results:
            assert rid == expected
            assert score > 0.999


class TestStreamAndCompactUnderChurn:
    def test_stream_with_concurrent_writers(self, rng):
        """search_batch_stream iterating while another thread mutates:
        each yielded batch must be internally consistent (valid ids,
        finite scores for live hits) and the stream must not crash."""
        import threading

        from vectorlite_tpu.core.metrics import SimilarityMetric
        from vectorlite_tpu.index.flat import FlatIndex

        d, n0 = 12, 400
        data = rng.normal(size=(n0 + 600, d))
        idx = FlatIndex(d)
        idx.add_batch_arrays(
            ids=np.arange(n0, dtype=np.uint64),
            values=data[:n0],
            texts=None,
            metadatas=None,
        )
        stop = threading.Event()

        def churn():
            i = n0
            while not stop.is_set() and i < len(data):
                idx.add_batch_arrays(
                    ids=np.arange(i, i + 20, dtype=np.uint64),
                    values=data[i : i + 20],
                    texts=None,
                    metadatas=None,
                )
                idx.delete(int(i - 100))
                i += 20

        t = threading.Thread(target=churn)
        t.start()
        try:
            def batches():
                for j in range(30):
                    yield data[j * 3 : j * 3 + 4]

            count = 0
            for ids, scores in idx.search_batch_stream(
                batches(), 5, SimilarityMetric.COSINE, depth=3
            ):
                assert ids.shape == (4, 5)
                live = ids >= 0
                assert np.all(np.isfinite(scores[live]))
                count += 1
            assert count == 30
        finally:
            stop.set()
            t.join()

    def test_compact_under_concurrent_readers(self, rng):
        """Collection.compact holds the write lock; readers before/after
        must always see a consistent index."""
        import threading

        from vectorlite_tpu import (
            IndexType,
            SimilarityMetric,
            VectorLiteClient,
        )
        from vectorlite_tpu.embed.mock import MockEmbeddingFunction

        client = VectorLiteClient(MockEmbeddingFunction(dimension=8))
        client.create_collection(
            "c", IndexType.HNSW, SimilarityMetric.COSINE
        )
        for i in range(200):
            client.add_text_to_collection("c", f"doc {i}")
        for i in range(0, 120, 2):
            client.delete_from_collection("c", i)
        col = client.get_collection("c")
        errs = []
        stop = threading.Event()

        def reader():
            while not stop.is_set():
                try:
                    res = client.search_text_in_collection("c", "doc 7", 3)
                    assert len(res) > 0
                except Exception as e:  # pragma: no cover
                    errs.append(e)
                    return

        ts = [threading.Thread(target=reader) for _ in range(3)]
        for t in ts:
            t.start()
        try:
            reclaimed = col.compact()
            assert reclaimed == 60
        finally:
            stop.set()
            for t in ts:
                t.join()
        assert not errs
        assert col.get_info().count == 140


def test_autosave_flush_races_mutations(tmp_path):
    """Autosave ticks hammering alongside adds/deletes: no exceptions,
    and the post-quiesce flush captures the final state exactly."""
    from vectorlite_tpu.store.autosave import AutosaveDaemon, restore_into

    client = VectorLiteClient(MockEmbeddingFunction(dimension=16))
    client.create_collection("c", IndexType.FLAT)
    daemon = AutosaveDaemon(client, tmp_path, interval_s=0.01).start()
    errors: list[Exception] = []

    def writer(wid):
        try:
            for i in range(40):
                vid = client.add_text_to_collection("c", f"w{wid} {i}")
                if i % 5 == 0:
                    client.delete_from_collection("c", vid)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    daemon.stop(flush=True)  # final flush after quiesce
    assert not errors
    assert daemon.stats()["failures"] == 0

    fresh = VectorLiteClient(MockEmbeddingFunction(dimension=16))
    assert restore_into(fresh, tmp_path) == ["c"]
    want = client.get_collection_info("c").count
    assert want == 4 * 40 - 4 * 8
    assert fresh.get_collection_info("c").count == want
