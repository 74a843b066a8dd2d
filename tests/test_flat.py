"""FlatIndex tests (mirrors reference: src/index/flat.rs:138-275 plus
TPU-specific coverage: growth, batching, dirty-row sync, tie order)."""

import numpy as np
import pytest

from vectorlite_tpu import FlatIndex, SimilarityMetric, Vector
from vectorlite_tpu.errors import DimensionMismatch, DuplicateVectorId


def vec(id, values, text="test", metadata=None):
    return Vector(id=id, values=list(values), text=text, metadata=metadata)


class TestBasics:
    def test_create_and_len(self):
        idx = FlatIndex(3, [vec(0, [1, 2, 3]), vec(1, [4, 5, 6])])
        assert len(idx) == 2
        assert not idx.is_empty()
        assert idx.dimension == 3
        assert idx.index_type == "Flat"
        assert idx.metric() is None

    def test_add_dimension_mismatch(self):
        idx = FlatIndex(3)
        with pytest.raises(DimensionMismatch):
            idx.add(vec(1, [1.0, 2.0]))

    def test_add_duplicate_id(self):
        idx = FlatIndex(3, [vec(1, [1, 2, 3])])
        with pytest.raises(DuplicateVectorId):
            idx.add(vec(1, [4, 5, 6]))

    def test_delete_absent_id_succeeds(self):
        # reference: src/index/flat.rs:93-96 (retain semantics)
        idx = FlatIndex(3, [vec(1, [1, 2, 3])])
        idx.delete(42)
        assert len(idx) == 1

    def test_delete_then_readd(self):
        idx = FlatIndex(3, [vec(1, [1, 2, 3])])
        idx.delete(1)
        assert len(idx) == 0
        idx.add(vec(1, [7, 8, 9]))
        assert idx.get_vector(1).values == [7.0, 8.0, 9.0]

    def test_get_vector(self):
        meta = {"title": "Doc", "tags": ["a", "b"]}
        idx = FlatIndex(3, [vec(5, [1, 2, 3], "hello", meta)])
        v = idx.get_vector(5)
        assert v.id == 5
        assert v.values == [1.0, 2.0, 3.0]
        assert v.text == "hello"
        assert v.metadata == meta
        assert idx.get_vector(99) is None

    def test_max_id(self):
        idx = FlatIndex(3)
        assert idx.max_id() is None
        idx.add(vec(7, [1, 2, 3]))
        idx.add(vec(3, [1, 2, 3]))
        assert idx.max_id() == 7
        idx.delete(7)
        assert idx.max_id() == 3


class TestSearch:
    def test_cosine(self):
        idx = FlatIndex(
            3,
            [vec(1, [1, 0, 0]), vec(2, [0, 1, 0]), vec(3, [0, 0, 1])],
        )
        results = idx.search([1.0, 0.0, 0.0], 2, SimilarityMetric.COSINE)
        assert len(results) == 2
        assert results[0].id == 1
        assert abs(results[0].score - 1.0) < 1e-6

    def test_euclidean(self):
        idx = FlatIndex(2, [vec(1, [0, 0]), vec(2, [3, 4]), vec(3, [6, 8])])
        results = idx.search([0.0, 0.0], 2, SimilarityMetric.EUCLIDEAN)
        assert results[0].id == 1
        assert abs(results[0].score - 1.0) < 1e-6
        assert abs(results[1].score - 1.0 / 6.0) < 1e-6

    def test_manhattan(self):
        idx = FlatIndex(2, [vec(1, [0, 0]), vec(2, [3, 4]), vec(3, [6, 8])])
        results = idx.search([0.0, 0.0], 2, SimilarityMetric.MANHATTAN)
        assert results[0].id == 1
        assert abs(results[0].score - 1.0) < 1e-6
        assert abs(results[1].score - 1.0 / 8.0) < 1e-6

    def test_dot_product(self):
        idx = FlatIndex(2, [vec(1, [1, 2]), vec(2, [2, 1]), vec(3, [0, 0])])
        results = idx.search([1.0, 2.0], 2, SimilarityMetric.DOT_PRODUCT)
        assert results[0].id == 1
        assert abs(results[0].score - 5.0) < 1e-6

    def test_metric_switching(self):
        idx = FlatIndex(2, [vec(1, [1, 2]), vec(2, [2, 1])])
        r_cos = idx.search([1.0, 2.0], 1, SimilarityMetric.COSINE)
        r_dot = idx.search([1.0, 2.0], 1, SimilarityMetric.DOT_PRODUCT)
        assert r_cos[0].id == 1 and r_dot[0].id == 1
        assert r_cos[0].score != r_dot[0].score

    def test_k_exceeds_len(self):
        idx = FlatIndex(2, [vec(1, [1, 0]), vec(2, [0, 1])])
        results = idx.search([1.0, 0.0], 10, SimilarityMetric.COSINE)
        assert len(results) == 2

    def test_empty_index_returns_empty(self):
        idx = FlatIndex(3)
        assert idx.search([1.0, 2.0, 3.0], 5, SimilarityMetric.COSINE) == []
        # dim check skipped when empty (reference: src/index/flat.rs:99)
        assert idx.search([1.0], 5, SimilarityMetric.COSINE) == []

    def test_query_dim_mismatch_nonempty(self):
        idx = FlatIndex(3, [vec(1, [1, 2, 3])])
        with pytest.raises(DimensionMismatch):
            idx.search([1.0, 2.0], 5, SimilarityMetric.COSINE)

    def test_results_sorted_descending(self, rng):
        vectors = [vec(i, rng.normal(size=8)) for i in range(50)]
        idx = FlatIndex(8, vectors)
        results = idx.search(rng.normal(size=8), 10, SimilarityMetric.COSINE)
        scores = [r.score for r in results]
        assert scores == sorted(scores, reverse=True)

    def test_tie_breaks_by_insertion_order(self):
        # equal scores: the earlier-inserted vector wins
        # (reference stable sort, src/index/flat.rs:116)
        idx = FlatIndex(2, [vec(10, [1, 0]), vec(20, [1, 0]), vec(30, [1, 0])])
        results = idx.search([1.0, 0.0], 3, SimilarityMetric.COSINE)
        assert [r.id for r in results] == [10, 20, 30]

    def test_delete_excluded_from_search(self):
        idx = FlatIndex(2, [vec(1, [1, 0]), vec(2, [0.9, 0.1])])
        idx.delete(1)
        results = idx.search([1.0, 0.0], 5, SimilarityMetric.COSINE)
        assert [r.id for r in results] == [2]

    def test_matches_numpy_ground_truth(self, rng):
        n, d = 300, 32
        data = rng.normal(size=(n, d))
        idx = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        q = rng.normal(size=d)
        for metric in SimilarityMetric:
            results = idx.search(q, 7, metric)
            want = np.array([metric.calculate(data[i], q) for i in range(n)])
            order = np.argsort(-want, kind="stable")[:7]
            assert [r.id for r in results] == [int(i) for i in order]
            got_scores = np.array([r.score for r in results])
            np.testing.assert_allclose(
                got_scores, want[order], rtol=2e-4, atol=2e-4
            )


class TestGrowthAndBatch:
    def test_capacity_growth(self, rng):
        idx = FlatIndex(4)
        data = rng.normal(size=(600, 4))
        for i in range(600):
            idx.add(vec(i, data[i]))
            if i % 97 == 0:  # interleave searches to exercise dirty sync
                idx.search(data[0], 3, SimilarityMetric.DOT_PRODUCT)
        assert len(idx) == 600
        results = idx.search(data[123], 1, SimilarityMetric.EUCLIDEAN)
        assert results[0].id == 123

    def test_search_batch(self, rng):
        n, d, b = 100, 16, 9
        data = rng.normal(size=(n, d))
        idx = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        queries = data[:b] + rng.normal(size=(b, d)) * 1e-4
        batch = idx.search_batch(queries, 3, SimilarityMetric.COSINE)
        assert len(batch) == b
        for i, hits in enumerate(batch):
            assert hits[0].id == i

    def test_serde_roundtrip(self):
        # mirrors reference: src/index/flat.rs:144-184
        idx = FlatIndex(
            3,
            [vec(1, [1, 0, 0]), vec(2, [0, 1, 0]), vec(3, [0, 0, 1])],
        )
        payload = idx.index_to_json()
        restored = FlatIndex.index_from_json(payload)
        assert len(restored) == 3
        assert restored.dimension == 3
        results = restored.search([1.1, 0.1, 0.1], 2, SimilarityMetric.COSINE)
        assert len(results) == 2
        assert results[0].id == 1
        assert results[0].score > 0.99


class TestCompaction:
    def test_churn_does_not_grow_capacity(self, rng):
        idx = FlatIndex(8)
        for i in range(4000):
            idx.add(vec(i, rng.normal(size=8)))
            if i >= 10:
                idx.delete(i - 10)  # keep ~10 live
        assert len(idx) == 10
        # without compaction _size would be 4000 and capacity 4096
        assert idx._size < 2048
        assert idx._capacity <= 2048
        live = [r.id for r in idx.search(
            rng.normal(size=8), 20, SimilarityMetric.COSINE)]
        assert set(live) == set(range(3990, 4000))

    def test_compaction_preserves_order_and_values(self):
        idx = FlatIndex(2)
        for i in range(2000):
            idx.add(vec(i, [float(i), 0.0]))
        for i in range(0, 2000, 2):  # delete evens -> triggers compaction
            idx.delete(i)
        assert len(idx) == 1000
        v = idx.get_vector(1999)
        assert v.values == [1999.0, 0.0]
        # ties: insertion order preserved after compaction
        results = idx.search([0.0, 1.0], 3, SimilarityMetric.DOT_PRODUCT)
        assert [r.id for r in results] == [1, 3, 5]


class TestAutoProfile:
    """The "auto" device profile: f32 storage, block-W selection at Pallas
    scale, bf16 + exact rescore only past the HBM budget (measured policy,
    see index/flat.py module constants)."""

    def test_auto_resolves_f32_off_tpu(self):
        import jax.numpy as jnp

        idx = FlatIndex(4)
        idx.add(vec(1, [1, 0, 0, 0]))
        idx.search([1, 0, 0, 0], 1, SimilarityMetric.COSINE)
        assert idx._device_dtype == jnp.float32

    def test_resolve_approx_respects_explicit_flag(self):
        idx = FlatIndex(4)
        assert idx._resolve_approx(False, 16, SimilarityMetric.COSINE) is False
        # CPU backend / small corpus: auto never engages approx
        assert idx._resolve_approx(None, 16, SimilarityMetric.COSINE) is False

    def test_needs_rescore_policy(self):
        import jax.numpy as jnp

        idx = FlatIndex(4)
        idx._device_dtype = jnp.float32
        assert idx._needs_rescore() is False  # f32 block: exact scores
        idx._device_dtype = jnp.bfloat16
        assert idx._needs_rescore() is True
        idx_q = FlatIndex(4, device_dtype="int8")
        assert idx_q._needs_rescore() is True

    def test_host_norms_watermark(self):
        rng = np.random.default_rng(0)
        idx = FlatIndex(8)
        data = rng.normal(size=(20, 8))
        for i in range(10):
            idx.add(vec(i, data[i]))
        n1 = idx._host_norms()
        np.testing.assert_allclose(
            n1[:10], np.linalg.norm(data[:10], axis=1)
        )
        for i in range(10, 20):
            idx.add(vec(i, data[i]))
        n2 = idx._host_norms()
        np.testing.assert_allclose(
            n2[:20], np.linalg.norm(data[:20], axis=1)
        )
        # compaction resets the watermark; norms realign to moved rows
        for i in range(0, 15):
            idx.delete(i)
        idx._compact()
        n3 = idx._host_norms()
        np.testing.assert_allclose(
            n3[:5], np.linalg.norm(data[15:20], axis=1)
        )


class TestHostScanFastPath:
    """Small-corpus single-query searches skip the device (exact f64 host
    scan, the sub-millisecond latency path). Must agree with the device
    path on ids and near-exactly on scores."""

    @pytest.mark.parametrize(
        "metric",
        [
            SimilarityMetric.COSINE,
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.MANHATTAN,
            SimilarityMetric.DOT_PRODUCT,
        ],
    )
    def test_matches_device_path(self, metric, monkeypatch):
        rng = np.random.default_rng(5)
        n, d, k = 300, 16, 7
        data = rng.normal(size=(n, d))
        idx = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        idx.delete(17)
        idx.delete(230)
        q = rng.normal(size=(2, d))
        assert idx._host_scan_eligible(2)
        host = idx.search_batch(q, k, metric)
        monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")
        assert not idx._host_scan_eligible(2)
        dev = idx.search_batch(q, k, metric)
        for hrow, drow in zip(host, dev):
            assert [r.id for r in hrow] == [r.id for r in drow]
            np.testing.assert_allclose(
                [r.score for r in hrow],
                [r.score for r in drow],
                rtol=1e-5,
                atol=1e-6,
            )

    def test_batch_cutoff_routes_to_device(self):
        idx = FlatIndex(4, [vec(i, [i, 0, 0, 0]) for i in range(1, 6)])
        assert idx._host_scan_eligible(4)
        assert not idx._host_scan_eligible(5)

    def test_tie_break_lowest_slot(self):
        idx = FlatIndex(2)
        for i in (3, 1, 2):
            idx.add(vec(i, [1.0, 0.0]))
        res = idx.search([1.0, 0.0], 3, SimilarityMetric.COSINE)
        # identical vectors: insertion (slot) order, ids 3, 1, 2
        assert [r.id for r in res] == [3, 1, 2]

    def test_arrays_path_host_scan(self):
        rng = np.random.default_rng(6)
        data = rng.normal(size=(50, 8))
        idx = FlatIndex(8)
        idx.add_batch_arrays(list(range(50)), data)
        ids, scores = idx.search_batch_arrays(
            data[:2], 5, SimilarityMetric.COSINE
        )
        assert ids[0][0] == 0 and ids[1][0] == 1
        np.testing.assert_allclose(scores[:, 0], 1.0, rtol=1e-12)

    def test_auto_capacity_ladder(self, monkeypatch):
        """auto dtype ladder: f32 -> bf16 -> int8 as the HBM budget
        shrinks (resolution is pure given backend/capacity/budget)."""
        import jax
        import jax.numpy as jnp

        idx = FlatIndex(128)
        idx._capacity = 1 << 20  # pretend Pallas-scale
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        gib = (1 << 20) * 128  # row_bytes for this capacity/dim
        monkeypatch.setenv(
            "VECTORLITE_AUTO_BF16_GB", str(gib * 4 / (1 << 30))
        )
        assert idx._prospective_dtype() == jnp.float32
        monkeypatch.setenv(
            "VECTORLITE_AUTO_BF16_GB", str(gib * 2 / (1 << 30))
        )
        assert idx._prospective_dtype() == jnp.bfloat16
        monkeypatch.setenv(
            "VECTORLITE_AUTO_BF16_GB", str(gib * 1 / (1 << 30))
        )
        assert idx._prospective_dtype() == jnp.int8
        # off-TPU always f32
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert idx._prospective_dtype() == jnp.float32


class TestHostPrefilter:
    """Above _HOST_PREFILTER_ROWS the host scan selects candidates on a
    cached f32 copy with a provable error margin and rescores only the
    pool in exact f64 (index/flat.py:_host_scan_prefiltered). Results
    must be identical to the pure f64 scan — this is a latency path,
    not an approximation."""

    N, D = 4500, 24  # above the 4096 prefilter threshold, cheap dims

    def _corpus(self):
        rng = np.random.default_rng(11)
        data = rng.normal(size=(self.N, self.D))
        # adversarial: a cluster of near-duplicates whose f32 selection
        # scores are indistinguishable — the margin must keep them all
        data[100:140] = data[0] + rng.normal(size=(40, self.D)) * 1e-5
        data[200] = 0.0  # zero-norm row (cosine score contract: 0.0)
        return data

    def _build(self, data):
        idx = FlatIndex(self.D)
        idx.add_batch_arrays(
            np.arange(self.N, dtype=np.uint64), data
        )
        for i in range(300, 360):
            idx.delete(i)
        return idx

    @pytest.mark.parametrize(
        "metric",
        [
            SimilarityMetric.COSINE,
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.MANHATTAN,
            SimilarityMetric.DOT_PRODUCT,
        ],
    )
    def test_identical_to_pure_f64_scan(self, metric, monkeypatch):
        data = self._corpus()
        idx = self._build(data)
        rng = np.random.default_rng(12)
        q = np.stack(
            [data[0] + 1e-3, rng.normal(size=self.D), np.zeros(self.D)]
        )
        for k in (1, 10, 64):
            monkeypatch.setenv("VECTORLITE_HOST_PREFILTER", "1")
            ids_a, s_a = idx.search_batch_arrays(q, k, metric)
            monkeypatch.setenv("VECTORLITE_HOST_PREFILTER", "0")
            ids_b, s_b = idx.search_batch_arrays(q, k, metric)
            assert np.array_equal(ids_a, ids_b), (metric, k)
            finite = np.isfinite(s_b)
            assert np.array_equal(finite, np.isfinite(s_a))
            np.testing.assert_allclose(
                s_a[finite], s_b[finite], rtol=1e-12, atol=1e-13
            )

    def test_underflow_rows_fall_back_to_f64(self, monkeypatch):
        """A row whose f32 squared norm underflows to zero/subnormal
        (components ~1e-25, legal f64 input) must not be dropped: its
        f32 cosine selection score would be 0 while the exact f64 score
        is ~1.0. The certification guard reverts such corpora to the
        pure f64 scan (round-3 self-review finding, reproduced live)."""
        rng = np.random.default_rng(13)
        data = rng.normal(size=(self.N, self.D))
        q = rng.normal(size=self.D)
        data[4499] = q * 1e-25  # aligned, tiny: exact cosine 1.0
        idx = FlatIndex(self.D)
        idx.add_batch_arrays(np.arange(self.N, dtype=np.uint64), data)
        monkeypatch.setenv("VECTORLITE_HOST_PREFILTER", "1")
        res = idx.search_batch([q], 3, SimilarityMetric.COSINE)[0]
        assert res[0].id == 4499
        assert res[0].score == pytest.approx(1.0, abs=1e-12)
        # tiny QUERY norm: guarded the same way
        res = idx.search_batch([q * 1e-30], 3, SimilarityMetric.COSINE)[0]
        assert res[0].id == 4499

    def test_tie_break_lowest_slot_through_prefilter(self):
        data = self._corpus()
        data[1000:1010] = data[999]  # exact duplicates
        idx = self._build(data)
        res = idx.search_batch(
            [data[999]], 11, SimilarityMetric.COSINE
        )[0]
        assert [r.id for r in res] == list(range(999, 1010))

    def test_nonfinite_corpus_falls_back_exact(self):
        data = self._corpus()
        data[:, 0] = 1e308  # overflows the f32 cache
        data[17] = np.arange(self.D, dtype=np.float64)
        idx = self._build(data)
        assert not idx._host_f32()[2]  # finite flag tripped
        res = idx.search_batch(
            [np.arange(self.D, dtype=np.float64)],
            1,
            SimilarityMetric.EUCLIDEAN,
        )[0]
        assert res[0].id == 17 and res[0].score == 1.0

    def test_compaction_invalidates_f32_cache(self):
        data = self._corpus()
        idx = self._build(data)
        idx.search_batch([data[0]], 1, SimilarityMetric.COSINE)
        assert idx._host_f32_n > 0
        idx.compact()
        assert idx._host_f32_n == 0
        res = idx.search_batch([data[5]], 1, SimilarityMetric.COSINE)[0]
        assert res[0].id == 5


class TestBatchValidation:
    def test_row_count_mismatch_is_not_dimension_mismatch(self):
        idx = FlatIndex(12)
        with pytest.raises(ValueError, match="row mismatch"):
            idx.add_batch_arrays([1, 2], np.zeros((3, 12)))

    def test_dim_mismatch_still_reported(self):
        idx = FlatIndex(12)
        with pytest.raises(DimensionMismatch):
            idx.add_batch_arrays([1, 2], np.zeros((2, 8)))

    def test_texts_length_mismatch_rejected(self):
        idx = FlatIndex(4)
        with pytest.raises(ValueError, match="texts length mismatch"):
            idx.add_batch_arrays(
                range(10), np.zeros((10, 4)), texts=["a"] * 5
            )
        # nothing was inserted; the capacity invariant holds
        assert len(idx) == 0
        assert len(idx._texts) == idx._capacity

    def test_metadatas_length_mismatch_rejected(self):
        idx = FlatIndex(4)
        with pytest.raises(ValueError, match="metadatas length mismatch"):
            idx.add_batch_arrays(
                range(3), np.zeros((3, 4)), metadatas=[None] * 2
            )

    def test_k_nonpositive_arrays_path(self):
        idx = FlatIndex(4, [vec(i, [i, 0, 0, 0]) for i in range(1, 6)])
        ids, scores = idx.search_batch_arrays(
            np.zeros((2, 4)), 0, SimilarityMetric.COSINE
        )
        assert ids.shape == (2, 0) and scores.shape == (2, 0)
        ids, scores = idx.search_batch_arrays(
            np.zeros((2, 4)), -5, SimilarityMetric.COSINE
        )
        assert ids.shape == (2, 0)

    def test_empty_batch_is_noop(self):
        idx = FlatIndex(4)
        idx.add_batch_arrays([], [])
        idx.add_batch_arrays([], np.zeros((0, 4)))
        assert len(idx) == 0


class TestSpeedModeAutoGuard:
    """VERDICT round-2 item 9: adversarial corpora must be detected at
    sync time with no env vars set (the old escape hatch was
    VECTORLITE_SPEED_MODE=0, which required the operator to know)."""

    def _risky(self, data):
        from vectorlite_tpu.index.flat import _bf16_selection_risky

        n = len(data)
        return _bf16_selection_risky(
            np.asarray(data, np.float32), np.ones(n, bool), n
        )

    def test_realistic_corpora_not_flagged(self, rng):
        # iid gaussian
        assert not self._risky(rng.normal(size=(4096, 64)))
        # clustered L2-normalized (MiniLM-like)
        centers = rng.normal(size=(64, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        data = centers[rng.integers(0, 64, 4096)] + 0.05 * rng.normal(
            size=(4096, 64)
        ) / 8.0
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        assert not self._risky(data)
        # 10x norm spread, still well-separated
        assert not self._risky(rng.normal(size=(4096, 64)) * 10)

    def test_euclidean_cancellation_flagged(self, rng):
        # huge shared base + tiny perturbations: d^2 spread << |q||v|,
        # the bf16 cancellation pathology
        base = rng.normal(size=(1, 64)) * 1e4
        data = base + 1e-4 * rng.normal(size=(4096, 64))
        assert self._risky(data)

    def test_tight_angular_cluster_flagged(self, rng):
        # normalized vectors within ~1e-6 radians of each other: cosine
        # gaps far below bf16 resolution
        base = rng.normal(size=(1, 64))
        data = base + 1e-6 * rng.normal(size=(4096, 64))
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        assert self._risky(data)

    def test_exact_duplicates_not_flagged(self, rng):
        # pure ties are resolved by slot order, not precision
        row = rng.normal(size=(1, 64))
        data = np.repeat(row, 4096, axis=0)
        assert not self._risky(data)

    def test_small_corpus_never_flagged(self, rng):
        assert not self._risky(rng.normal(size=(100, 64)))


class TestSearchBatchStream:
    """Pipelined stream must be result-identical to search_batch_arrays,
    batch for batch, in order."""

    def _index(self, rng, n=600):
        data = rng.normal(size=(n, 16))
        idx = FlatIndex(16)
        idx.add_batch_arrays(
            ids=np.arange(n, dtype=np.uint64),
            values=data,
            texts=None,
            metadatas=None,
        )
        return idx, data

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_matches_arrays_path(self, rng, depth):
        idx, data = self._index(rng)
        batches = [
            data[i * 7 : i * 7 + 5] + 0.01 * i for i in range(6)
        ]
        got = list(
            idx.search_batch_stream(
                iter(batches), 4, SimilarityMetric.COSINE, depth=depth
            )
        )
        assert len(got) == len(batches)
        for queries, (ids, scores) in zip(batches, got):
            ref_ids, ref_scores = idx.search_batch_arrays(
                queries, 4, SimilarityMetric.COSINE
            )
            np.testing.assert_array_equal(ids, ref_ids)
            np.testing.assert_allclose(scores, ref_scores, rtol=1e-12)

    def test_empty_and_k_zero(self, rng):
        idx, data = self._index(rng, n=10)
        out = list(
            idx.search_batch_stream(
                iter([data[:3]]), 0, SimilarityMetric.COSINE
            )
        )
        assert out[0][0].shape == (3, 0)
        empty = FlatIndex(16)
        out = list(
            empty.search_batch_stream(
                iter([data[:2]]), 5, SimilarityMetric.COSINE
            )
        )
        assert out[0][0].shape == (2, 5)
        assert (out[0][0] == -1).all()

    def test_dimension_mismatch_raises(self, rng):
        idx, data = self._index(rng)
        with pytest.raises(Exception):
            list(
                idx.search_batch_stream(
                    iter([np.zeros((2, 5))]), 3, SimilarityMetric.COSINE
                )
            )

    @pytest.mark.parametrize("group", [2, 3, 8])
    @pytest.mark.parametrize("depth", [1, 3])
    def test_grouped_fetch_matches_arrays_path(self, rng, depth, group):
        """group > 1 stacks G batches into one fetch; results must stay
        per-batch identical to search_batch_arrays, including when the
        stream ends mid-group (partial flush)."""
        idx, data = self._index(rng)
        batches = [
            data[i * 9 : i * 9 + 6] + 0.01 * i for i in range(7)
        ]  # 7 batches: never a multiple of any tested group size
        got = list(
            idx.search_batch_stream(
                iter(batches), 4, SimilarityMetric.COSINE,
                depth=depth, group=group,
            )
        )
        assert len(got) == len(batches)
        for queries, (ids, scores) in zip(batches, got):
            ref_ids, ref_scores = idx.search_batch_arrays(
                queries, 4, SimilarityMetric.COSINE
            )
            np.testing.assert_array_equal(ids, ref_ids)
            np.testing.assert_allclose(scores, ref_scores, rtol=1e-12)

    def test_grouped_fetch_mixed_batch_sizes(self, rng):
        """Varying batch sizes within one group are concatenated into a
        single dispatch (only a k_eff change closes an open group —
        flat.py flush_group); each result must slice back to its own
        batch's boundaries, in order, with exact values."""
        idx, data = self._index(rng)
        sizes = [6, 6, 9, 9, 9, 5, 6]
        batches = [
            data[i * 11 : i * 11 + s] + 0.01 * i
            for i, s in enumerate(sizes)
        ]
        got = list(
            idx.search_batch_stream(
                iter(batches), 3, SimilarityMetric.EUCLIDEAN, group=4
            )
        )
        assert len(got) == len(batches)
        for queries, (ids, scores) in zip(batches, got):
            ref_ids, ref_scores = idx.search_batch_arrays(
                queries, 3, SimilarityMetric.EUCLIDEAN
            )
            np.testing.assert_array_equal(ids, ref_ids)
            np.testing.assert_allclose(scores, ref_scores, rtol=1e-12)

    def test_grouped_fetch_ready_interleave(self, rng):
        """Host-scan-eligible batches (b <= 4 at small corpora) yield
        "ready" items between grouped device batches; an open group
        popped before it fills must flush on demand, not deadlock."""
        idx, data = self._index(rng)
        batches = [data[:6]] + [
            data[i : i + 2] for i in range(8)
        ]  # one device batch opens a group of 8, then 8 host-scan items
        got = list(
            idx.search_batch_stream(
                iter(batches), 4, SimilarityMetric.COSINE,
                depth=1, group=8,
            )
        )
        assert len(got) == len(batches)
        for queries, (ids, scores) in zip(batches, got):
            ref_ids, _ = idx.search_batch_arrays(
                queries, 4, SimilarityMetric.COSINE
            )
            np.testing.assert_array_equal(ids, ref_ids)
