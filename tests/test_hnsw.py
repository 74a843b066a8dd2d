"""HNSWIndex tests (mirrors reference: src/index/hnsw.rs:529-1032 —
add/delete/search semantics, conversion contract, serde round-trip —
plus recall-vs-flat ground truth)."""

import numpy as np
import pytest

from vectorlite_tpu import FlatIndex, HNSWIndex, SimilarityMetric, Vector
from vectorlite_tpu.errors import (
    DimensionMismatch,
    DuplicateVectorId,
    MetricMismatch,
    VectorNotFound,
)
from vectorlite_tpu.index.hnsw import convert_distance_to_similarity


def vec(id, values, text="test", metadata=None):
    return Vector(id=id, values=list(values), text=text, metadata=metadata)


class TestBasics:
    def test_create(self):
        idx = HNSWIndex(384, SimilarityMetric.EUCLIDEAN)
        assert len(idx) == 0
        assert idx.is_empty()
        assert idx.dimension == 384
        assert idx.index_type == "HNSW"
        assert idx.metric() is SimilarityMetric.EUCLIDEAN

    def test_zero_dim_rejected(self):
        with pytest.raises(ValueError):
            HNSWIndex(0, SimilarityMetric.COSINE)

    def test_add_and_get(self):
        idx = HNSWIndex(3, SimilarityMetric.COSINE)
        idx.add(vec(42, [1, 2, 3], "hello", {"k": 1}))
        assert len(idx) == 1
        v = idx.get_vector(42)
        assert v.id == 42
        assert v.values == [1.0, 2.0, 3.0]
        assert v.text == "hello"
        assert v.metadata == {"k": 1}

    def test_add_duplicate_id(self):
        idx = HNSWIndex(3, SimilarityMetric.COSINE)
        idx.add(vec(1, [1, 2, 3]))
        with pytest.raises(DuplicateVectorId):
            idx.add(vec(1, [4, 5, 6]))

    def test_add_dimension_mismatch(self):
        idx = HNSWIndex(3, SimilarityMetric.COSINE)
        with pytest.raises(DimensionMismatch):
            idx.add(vec(1, [1, 2]))

    def test_add_batch_duplicate_within_batch(self):
        # a batch containing the same id twice must be rejected before any
        # insertion — otherwise two graph nodes map to one id and a later
        # delete leaves a stale node that still resolves
        idx = HNSWIndex(3, SimilarityMetric.COSINE)
        batch = [vec(1, [1, 0, 0]), vec(2, [0, 1, 0]), vec(1, [0, 0, 1])]
        with pytest.raises(DuplicateVectorId):
            idx.add_batch(batch)
        assert len(idx) == 0  # nothing partially inserted

    def test_add_batch_duplicate_of_existing(self):
        idx = HNSWIndex(3, SimilarityMetric.COSINE)
        idx.add(vec(7, [1, 0, 0]))
        with pytest.raises(DuplicateVectorId):
            idx.add_batch([vec(8, [0, 1, 0]), vec(7, [0, 0, 1])])
        assert len(idx) == 1

    def test_delete_soft_tombstone(self):
        # reference: src/index/hnsw.rs:400-414
        idx = HNSWIndex(2, SimilarityMetric.EUCLIDEAN)
        for i in range(10):
            idx.add(vec(i, [float(i), float(i)]))
        idx.delete(3)
        assert len(idx) == 9
        assert idx.get_vector(3) is None
        results = idx.search([3.0, 3.0], 10, SimilarityMetric.EUCLIDEAN)
        assert 3 not in [r.id for r in results]

    def test_delete_missing_raises(self):
        idx = HNSWIndex(2, SimilarityMetric.EUCLIDEAN)
        with pytest.raises(VectorNotFound):
            idx.delete(99)

    def test_max_id(self):
        idx = HNSWIndex(2, SimilarityMetric.COSINE)
        assert idx.max_id() is None
        idx.add(vec(5, [1, 0]))
        idx.add(vec(2, [0, 1]))
        assert idx.max_id() == 5


class TestSearch:
    def test_metric_mismatch_rejected(self):
        # reference: src/index/hnsw.rs:425-430
        idx = HNSWIndex(2, SimilarityMetric.COSINE)
        idx.add(vec(1, [1, 0]))
        with pytest.raises(MetricMismatch) as ei:
            idx.search([1.0, 0.0], 5, SimilarityMetric.EUCLIDEAN)
        assert "Euclidean" in str(ei.value)
        assert "Cosine" in str(ei.value)

    def test_query_dim_mismatch(self):
        idx = HNSWIndex(3, SimilarityMetric.COSINE)
        idx.add(vec(1, [1, 0, 0]))
        with pytest.raises(DimensionMismatch):
            idx.search([1.0, 0.0], 5, SimilarityMetric.COSINE)

    def test_empty_index(self):
        idx = HNSWIndex(2, SimilarityMetric.COSINE)
        assert idx.search([1.0, 0.0], 5, SimilarityMetric.COSINE) == []

    def test_k_exceeds_len(self):
        idx = HNSWIndex(2, SimilarityMetric.EUCLIDEAN)
        idx.add(vec(1, [0, 0]))
        idx.add(vec(2, [1, 1]))
        results = idx.search([0.0, 0.0], 10, SimilarityMetric.EUCLIDEAN)
        assert len(results) == 2

    def test_custom_id_mapping(self):
        idx = HNSWIndex(2, SimilarityMetric.EUCLIDEAN)
        idx.add(vec(1000, [0, 0], "a"))
        idx.add(vec(2000, [5, 5], "b"))
        results = idx.search([0.1, 0.1], 1, SimilarityMetric.EUCLIDEAN)
        assert results[0].id == 1000
        assert results[0].text == "a"

    def test_scores_descending_and_converted(self):
        idx = HNSWIndex(2, SimilarityMetric.EUCLIDEAN)
        idx.add(vec(1, [0, 0]))
        idx.add(vec(2, [3, 4]))
        results = idx.search([0.0, 0.0], 2, SimilarityMetric.EUCLIDEAN)
        assert abs(results[0].score - 1.0) < 1e-6
        assert abs(results[1].score - 1.0 / 6.0) < 1e-5

    @pytest.mark.parametrize(
        "metric",
        [
            SimilarityMetric.COSINE,
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.MANHATTAN,
            SimilarityMetric.DOT_PRODUCT,
        ],
    )
    def test_recall_vs_flat(self, metric, rng):
        n, d, k = 500, 16, 10
        data = rng.normal(size=(n, d)) * 0.1
        flat = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        hnsw = HNSWIndex(d, metric, seed=1)
        for i in range(n):
            hnsw.add(vec(i, data[i]))
        recalls = []
        for qi in range(20):
            q = rng.normal(size=d) * 0.1
            truth = {r.id for r in flat.search(q, k, metric)}
            got = {r.id for r in hnsw.search(q, k, metric)}
            recalls.append(len(truth & got) / k)
        assert np.mean(recalls) >= 0.9, f"recall {np.mean(recalls)}"


class TestConversion:
    """Distance -> similarity contract (reference: src/index/hnsw.rs:807-1032,
    with the x1000 quantization removed — see module docstring)."""

    def test_euclidean(self):
        assert convert_distance_to_similarity(
            0.0, SimilarityMetric.EUCLIDEAN
        ) == 1.0
        assert abs(
            convert_distance_to_similarity(5.0, SimilarityMetric.EUCLIDEAN)
            - 1.0 / 6.0
        ) < 1e-12

    def test_cosine(self):
        assert convert_distance_to_similarity(
            0.0, SimilarityMetric.COSINE
        ) == 1.0
        assert convert_distance_to_similarity(
            1.0, SimilarityMetric.COSINE
        ) == 0.0
        assert convert_distance_to_similarity(
            2.0, SimilarityMetric.COSINE
        ) == -1.0

    def test_manhattan(self):
        assert abs(
            convert_distance_to_similarity(7.0, SimilarityMetric.MANHATTAN)
            - 1.0 / 8.0
        ) < 1e-12

    def test_dotproduct_clamped(self):
        # reference: src/index/hnsw.rs:67-73
        assert convert_distance_to_similarity(
            0.0, SimilarityMetric.DOT_PRODUCT
        ) == 1.0
        assert convert_distance_to_similarity(
            2000.0, SimilarityMetric.DOT_PRODUCT
        ) == 0.0
        assert convert_distance_to_similarity(
            1000.0 - 500.0, SimilarityMetric.DOT_PRODUCT
        ) == 0.5

    @pytest.mark.parametrize(
        "metric",
        [
            SimilarityMetric.COSINE,
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.MANHATTAN,
            SimilarityMetric.DOT_PRODUCT,
        ],
    )
    def test_monotonic_decreasing(self, metric):
        # larger distance must never increase similarity
        ds = np.linspace(0.0, 1500.0, 50)
        sims = [convert_distance_to_similarity(d, metric) for d in ds]
        assert all(a >= b - 1e-12 for a, b in zip(sims, sims[1:]))


class TestSerde:
    def test_roundtrip(self):
        idx = HNSWIndex(3, SimilarityMetric.COSINE)
        idx.add(vec(1, [1, 0, 0], "a", {"x": 1}))
        idx.add(vec(2, [0, 1, 0], "b"))
        idx.add(vec(3, [0, 0, 1], "c"))
        payload = idx.index_to_json()
        assert payload["metric"] == "Cosine"
        assert set(payload["vector_values"]) == {"1", "2", "3"}
        restored = HNSWIndex.index_from_json(payload)
        assert len(restored) == 3
        assert restored.metric() is SimilarityMetric.COSINE
        results = restored.search([1.0, 0.1, 0.0], 1, SimilarityMetric.COSINE)
        assert results[0].id == 1
        # post-load insert still works (reference: src/index/hnsw.rs:758-805)
        restored.add(vec(4, [0.9, 0.1, 0.0], "d"))
        results = restored.search([1.0, 0.0, 0.0], 2, SimilarityMetric.COSINE)
        assert {r.id for r in results} == {1, 4}

    def test_empty_roundtrip(self):
        idx = HNSWIndex(5, SimilarityMetric.MANHATTAN)
        restored = HNSWIndex.index_from_json(idx.index_to_json())
        assert restored.is_empty()
        assert restored.dimension == 5
        assert restored.metric() is SimilarityMetric.MANHATTAN

    def test_zero_dim_payload_rejected(self):
        with pytest.raises(ValueError):
            HNSWIndex.index_from_json(
                {"dim": 0, "metric": "Cosine", "metadata": {},
                 "vector_values": {}}
            )

    def test_dim_mismatch_payload_rejected(self):
        with pytest.raises(ValueError):
            HNSWIndex.index_from_json(
                {
                    "dim": 3,
                    "metric": "Cosine",
                    "metadata": {"1": {"text": "t", "metadata": None}},
                    "vector_values": {"1": [1.0, 2.0]},
                }
            )


class TestParallelBuild:
    """The native builder's hnswlib-style concurrent insert path: per-row
    lock pool + per-thread visited scratch + global entry lock (no
    reference analogue — the Rust crate builds single-threaded under the
    collection RwLock)."""

    def _build(self, monkeypatch, threads):
        monkeypatch.setenv("VECTORLITE_BUILD_THREADS", str(threads))
        rng = np.random.default_rng(7)
        n, d = 1200, 24
        data = rng.normal(size=(n, d))
        idx = HNSWIndex(d, SimilarityMetric.COSINE, seed=3)
        idx.add_batch([vec(i, data[i]) for i in range(n)])
        return idx, data, rng

    @pytest.mark.skipif(
        HNSWIndex(2, SimilarityMetric.COSINE)._nb is None,
        reason="native builder unavailable",
    )
    def test_parallel_build_recall(self, monkeypatch):
        idx, data, rng = self._build(monkeypatch, threads=4)
        flat = FlatIndex(data.shape[1], [vec(i, data[i]) for i in range(len(data))])
        k, recalls = 10, []
        for _ in range(20):
            q = rng.normal(size=data.shape[1])
            truth = {r.id for r in flat.search(q, k, SimilarityMetric.COSINE)}
            got = {r.id for r in idx.search(q, k, SimilarityMetric.COSINE)}
            recalls.append(len(truth & got) / k)
        assert np.mean(recalls) >= 0.9, f"recall {np.mean(recalls)}"
        assert len(idx) == len(data)

    @pytest.mark.skipif(
        HNSWIndex(2, SimilarityMetric.COSINE)._nb is None,
        reason="native builder unavailable",
    )
    def test_parallel_matches_sequential_levels(self, monkeypatch):
        # levels are pre-drawn from the builder rng, so level assignment
        # is identical regardless of thread count
        i1, data, _ = self._build(monkeypatch, threads=1)
        i4, _, _ = self._build(monkeypatch, threads=4)
        n = len(data)
        assert (i1._levels[:n] == i4._levels[:n]).all()

    @pytest.mark.skipif(
        HNSWIndex(2, SimilarityMetric.COSINE)._nb is None,
        reason="native builder unavailable",
    )
    def test_batched_native_search_matches_single(self, monkeypatch):
        idx, data, rng = self._build(monkeypatch, threads=1)
        qs = rng.normal(size=(16, data.shape[1]))
        batched = idx.search_batch(qs, 5, SimilarityMetric.COSINE)
        for i, q in enumerate(qs):
            single = idx.search(q, 5, SimilarityMetric.COSINE)
            assert [r.id for r in batched[i]] == [r.id for r in single]


class TestCorruptGraphDump:
    def test_corrupt_top_level_falls_back_to_rebuild(self, rng):
        """A dump claiming more levels than it ships (or than the native
        builder's fixed slot count) must be rejected by validation and
        rebuilt from vectors — previously it loaded 'successfully' and
        the first search crashed in native code."""
        idx = HNSWIndex(8, SimilarityMetric.COSINE)
        idx.add_batch(
            [vec(i, rng.normal(size=8), text=f"t{i}") for i in range(400)]
        )
        obj = idx.index_to_json()
        obj["graph"]["top_level"] = 50
        idx2 = HNSWIndex.index_from_json(obj)
        q = rng.normal(size=8)
        got = [r.id for r in idx2.search(q, 5, SimilarityMetric.COSINE)]
        want = [r.id for r in idx.search(q, 5, SimilarityMetric.COSINE)]
        assert got == want
        assert len(idx2) == 400


class TestCompaction:
    """Tombstone reclamation (extension: the reference leaks soft
    deletes forever, src/index/hnsw.rs:400-414)."""

    def test_compact_reclaims_and_preserves_search(self, rng):
        d, n = 24, 400
        data = rng.normal(size=(n, d))
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        idx = HNSWIndex(d, SimilarityMetric.COSINE, seed=1)
        for i in range(n):
            idx.add(Vector(id=i, values=list(data[i]), text=f"t{i}"))
        for i in range(0, n, 2):
            idx.delete(i)
        assert idx._num_nodes == n
        reclaimed = idx.compact()
        assert reclaimed == n // 2
        assert idx._num_nodes == n // 2
        assert len(idx) == n // 2
        # live vectors still found, deleted ones gone
        res = idx.search(list(data[101]), 1, SimilarityMetric.COSINE)
        assert res[0].id == 101
        assert idx.get_vector(100) is None
        assert idx.get_vector(101).text == "t101"
        # further inserts work and ids continue
        idx.add(Vector(id=n, values=list(data[0]), text="new"))
        res = idx.search(list(data[0]), 1, SimilarityMetric.COSINE)
        assert res[0].id == n

    def test_compact_noop_when_clean(self, rng):
        d = 8
        idx = HNSWIndex(d, SimilarityMetric.COSINE)
        for i in range(10):
            idx.add(Vector(id=i, values=[float(i)] * d, text=""))
        assert idx.compact() == 0
        assert len(idx) == 10
