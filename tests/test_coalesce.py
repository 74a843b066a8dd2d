"""Search coalescing: concurrent single-text searches must return exactly
what the un-coalesced path returns (store/coalesce.py).

The reference serves each search independently (reference:
src/server.rs:258-275); coalescing is a TPU-native extension, so the
tests here pin *semantic equivalence*, per-request error isolation, and
lifecycle (close on delete_collection)."""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from vectorlite_tpu import (
    IndexType,
    SimilarityMetric,
    VectorLiteClient,
)
from vectorlite_tpu.errors import EmbeddingError
from vectorlite_tpu.embed.mock import MockEmbeddingFunction
from vectorlite_tpu.store.coalesce import SearchCoalescer


@pytest.fixture
def client():
    return VectorLiteClient(MockEmbeddingFunction(dimension=32))


def _fill(client, name, n=64, index_type=IndexType.FLAT, metric=None):
    client.create_collection(name, index_type, metric)
    client.add_texts_to_collection(name, [f"document {i}" for i in range(n)])


def _rows_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.id == rb.id
        # batched BLAS accumulation order differs from B=1 in the last
        # ulp, exactly like search_texts vs search_text — same contract
        assert ra.score == pytest.approx(rb.score, rel=1e-9, abs=1e-12)
        assert ra.text == rb.text


class TestCoalescedEquivalence:
    def test_solo_request_matches_direct_path(self, client, monkeypatch):
        _fill(client, "c", n=32)
        coalesced = client.search_text_in_collection("c", "document 7", 5)
        monkeypatch.setenv("VECTORLITE_COALESCE", "0")
        direct = client.search_text_in_collection("c", "document 7", 5)
        _rows_equal(coalesced, direct)

    def test_concurrent_mixed_k_and_queries(self, client, monkeypatch):
        _fill(client, "c", n=128)
        queries = [(f"document {i % 40}", 1 + i % 9) for i in range(80)]

        with ThreadPoolExecutor(max_workers=16) as pool:
            got = list(
                pool.map(
                    lambda qk: client.search_text_in_collection(
                        "c", qk[0], qk[1]
                    ),
                    queries,
                )
            )
        monkeypatch.setenv("VECTORLITE_COALESCE", "0")
        for (q, k), rows in zip(queries, got):
            _rows_equal(rows, client.search_text_in_collection("c", q, k))

    def test_concurrent_mixed_metrics_flat(self, client, monkeypatch):
        _fill(client, "c", n=64)
        metrics = [
            SimilarityMetric.COSINE,
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.DOT_PRODUCT,
            SimilarityMetric.MANHATTAN,
        ]
        jobs = [(f"document {i}", metrics[i % 4]) for i in range(32)]
        with ThreadPoolExecutor(max_workers=8) as pool:
            got = list(
                pool.map(
                    lambda jm: client.search_text_in_collection(
                        "c", jm[0], 4, jm[1]
                    ),
                    jobs,
                )
            )
        monkeypatch.setenv("VECTORLITE_COALESCE", "0")
        for (q, m), rows in zip(jobs, got):
            _rows_equal(
                rows, client.search_text_in_collection("c", q, 4, m)
            )

    def test_hnsw_collection(self, client, monkeypatch):
        _fill(
            client,
            "h",
            n=64,
            index_type=IndexType.HNSW,
            metric=SimilarityMetric.COSINE,
        )
        with ThreadPoolExecutor(max_workers=8) as pool:
            got = list(
                pool.map(
                    lambda i: client.search_text_in_collection(
                        "h", f"document {i}", 3
                    ),
                    range(24),
                )
            )
        monkeypatch.setenv("VECTORLITE_COALESCE", "0")
        for i, rows in enumerate(got):
            _rows_equal(
                rows,
                client.search_text_in_collection("h", f"document {i}", 3),
            )


class TestFilteredCoalescing:
    """Filtered singles coalesce too, grouped by the clause's canonical
    JSON — mixed-filter concurrency must return exactly the direct
    path's rows, and an invalid clause must fail only its own group."""

    def _fill_tagged(self, client, name, n=64):
        client.create_collection(name, IndexType.FLAT)
        client.add_texts_to_collection(
            name,
            [f"document {i}" for i in range(n)],
            [{"p": i % 4} for i in range(n)],
        )

    def test_concurrent_mixed_wheres(self, client, monkeypatch):
        self._fill_tagged(client, "c", n=64)
        jobs = [
            (f"document {i}", {"p": i % 4} if i % 3 else None)
            for i in range(36)
        ]
        with ThreadPoolExecutor(max_workers=12) as pool:
            got = list(
                pool.map(
                    lambda jw: client.search_text_in_collection(
                        "c", jw[0], 5, where=jw[1]
                    ),
                    jobs,
                )
            )
        monkeypatch.setenv("VECTORLITE_COALESCE", "0")
        for (q, w), rows in zip(jobs, got):
            if w is not None:
                assert all(r.metadata["p"] == w["p"] for r in rows)
            _rows_equal(
                rows,
                client.search_text_in_collection("c", q, 5, where=w),
            )

    def test_invalid_clause_fails_only_its_group(self, client):
        from vectorlite_tpu.errors import InvalidFilter

        self._fill_tagged(client, "c", n=16)
        with ThreadPoolExecutor(max_workers=4) as pool:
            ok = pool.submit(
                client.search_text_in_collection, "c", "document 1", 3
            )
            bad = pool.submit(
                lambda: client.search_text_in_collection(
                    "c", "document 2", 3, where={"p": {"$nope": 1}}
                )
            )
            assert len(ok.result()) == 3
            with pytest.raises(InvalidFilter):
                bad.result()


class _FlakyEmbedder(MockEmbeddingFunction):
    """Raises on texts containing 'poison'; batch fails whole if any."""

    def generate_embedding(self, text):
        if "poison" in text:
            raise RuntimeError(f"bad text: {text}")
        return super().generate_embedding(text)


class TestErrorIsolation:
    def test_poison_text_fails_only_itself(self):
        client = VectorLiteClient(_FlakyEmbedder(dimension=16))
        _fill(client, "c", n=16)
        barrier = threading.Barrier(6)
        results, errors = {}, {}

        def worker(i, text):
            barrier.wait()
            try:
                results[i] = client.search_text_in_collection("c", text, 3)
            except Exception as e:  # noqa: BLE001
                errors[i] = e

        texts = ["document 1", "poison pill", "document 2", "document 3",
                 "poison two", "document 4"]
        threads = [
            threading.Thread(target=worker, args=(i, t))
            for i, t in enumerate(texts)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(errors) == {1, 4}
        for e in errors.values():
            assert isinstance(e, EmbeddingError)
        assert set(results) == {0, 2, 3, 5}
        for rows in results.values():
            assert len(rows) == 3

    def test_search_error_propagates(self, client):
        # k out of the index's accepted range surfaces per request
        _fill(client, "c", n=8)
        rows = client.search_text_in_collection("c", "document 0", 100)
        assert len(rows) == 8  # k > len truncates, like the reference


class TestLifecycle:
    def test_delete_collection_closes_coalescer(self, client):
        _fill(client, "c", n=8)
        client.search_text_in_collection("c", "document 0", 2)
        collection = client.get_collection("c")
        co = collection._coalescer
        assert co is not None
        client.delete_collection("c")
        with pytest.raises(RuntimeError):
            co.submit("x", 1, SimilarityMetric.COSINE, None)

    def test_close_idempotent_and_reopens(self, client):
        _fill(client, "c", n=8)
        collection = client.get_collection("c")
        client.search_text_in_collection("c", "document 0", 2)
        collection.close()
        collection.close()
        # a fresh coalescer is created on the next search
        rows = client.search_text_in_collection("c", "document 1", 2)
        assert len(rows) == 2

    def test_env_disable(self, client, monkeypatch):
        monkeypatch.setenv("VECTORLITE_COALESCE", "0")
        _fill(client, "c", n=8)
        client.search_text_in_collection("c", "document 0", 2)
        assert client.get_collection("c")._coalescer is None


class TestStats:
    def test_coalesce_counters_advance(self, client):
        from vectorlite_tpu.observability import coalesce_stats

        before = coalesce_stats.snapshot().get("batches", 0)
        _fill(client, "c", n=8)
        client.search_text_in_collection("c", "document 0", 2)
        after = coalesce_stats.snapshot()
        assert after["batches"] > before
        assert after["requests"] >= after["batches"]
        assert after["max_batch"] >= 1


class TestBatching:
    def test_backlog_forms_batches(self, client):
        """Entries queued while a batch is in flight coalesce: with the
        dispatcher pinned, all queued entries drain in one _process."""
        _fill(client, "c", n=32)
        collection = client.get_collection("c")
        co = collection._get_coalescer()
        sizes = []
        orig = SearchCoalescer._process

        def spy(self, batch):
            sizes.append(len(batch))
            return orig(self, batch)

        SearchCoalescer._process = spy
        try:
            # pin the dispatcher inside a batch via a slow embed
            gate = threading.Event()
            release = threading.Event()

            class Gated(MockEmbeddingFunction):
                def generate_embedding(self, text):
                    if text == "gate":
                        gate.set()
                        release.wait(5.0)
                    return super().generate_embedding(text)

            gated = Gated(dimension=32)
            t0 = threading.Thread(
                target=co.submit,
                args=("gate", 1, SimilarityMetric.COSINE, gated),
            )
            t0.start()
            assert gate.wait(5.0)
            # these accumulate while the dispatcher is busy
            followers = [
                threading.Thread(
                    target=co.submit,
                    args=(f"document {i}", 2, SimilarityMetric.COSINE, gated),
                )
                for i in range(6)
            ]
            for t in followers:
                t.start()
            # wait until all six are queued, then release the gate
            for _ in range(500):
                with co._cv:
                    if len(co._queue) == 6:
                        break
                threading.Event().wait(0.01)
            release.set()
            t0.join(10.0)
            for t in followers:
                t.join(10.0)
        finally:
            SearchCoalescer._process = orig
        assert sizes[0] == 1
        assert max(sizes[1:]) > 1  # the backlog drained as one batch
