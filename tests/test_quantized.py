"""int8 quantized flat profile: approximate device select + exact rescore."""

import numpy as np
import pytest

from vectorlite_tpu import FlatIndex, SimilarityMetric, Vector
from vectorlite_tpu.core.metrics import quantize_rows_int8

import jax.numpy as jnp


def vec(id, values, text="t"):
    return Vector(id=id, values=list(values), text=text)


class TestQuantizeRows:
    def test_roundtrip_error_bounded(self, rng):
        rows = jnp.asarray(rng.normal(size=(50, 64)).astype(np.float32))
        q, s = quantize_rows_int8(rows)
        recon = np.asarray(q, np.float32) * np.asarray(s)[:, None]
        err = np.max(np.abs(recon - np.asarray(rows)))
        max_abs = float(np.max(np.abs(np.asarray(rows))))
        assert err <= max_abs / 127.0 + 1e-6

    def test_zero_row(self):
        rows = jnp.zeros((4, 8), jnp.float32)
        q, s = quantize_rows_int8(rows)
        assert np.all(np.asarray(q) == 0)
        assert np.all(np.asarray(s) == 1.0)


class TestQuantizedFlat:
    @pytest.mark.parametrize("metric", list(SimilarityMetric))
    def test_recall_and_exact_scores(self, metric, rng):
        n, d, k = 400, 64, 10
        data = rng.normal(size=(n, d))
        idx8 = FlatIndex(d, [vec(i, data[i]) for i in range(n)],
                         device_dtype="int8")
        idx32 = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        q = rng.normal(size=d)
        r8 = idx8.search(list(q), k, metric)
        r32 = idx32.search(list(q), k, metric)
        # top-k sets nearly identical (int8 selection noise is tiny)
        overlap = len({r.id for r in r8} & {r.id for r in r32}) / k
        assert overlap >= 0.9, (metric, overlap)
        # returned scores are EXACT float64 math (rescored on host)
        for r in r8:
            want = metric.calculate(data[r.id], q)
            assert abs(r.score - want) < 1e-9, (metric, r.id)

    def test_results_sorted_after_rescore(self, rng):
        n, d = 200, 32
        data = rng.normal(size=(n, d))
        idx = FlatIndex(d, [vec(i, data[i]) for i in range(n)],
                        device_dtype="int8")
        res = idx.search(list(rng.normal(size=d)), 10,
                         SimilarityMetric.COSINE)
        scores = [r.score for r in res]
        assert scores == sorted(scores, reverse=True)

    def test_arrays_path_and_delete(self, rng):
        n, d = 128, 16
        data = rng.normal(size=(n, d))
        idx = FlatIndex(d, [vec(i, data[i]) for i in range(n)],
                        device_dtype="int8")
        ids, scores = idx.search_batch_arrays(
            data[:8].astype(np.float32), 3, SimilarityMetric.EUCLIDEAN
        )
        assert list(ids[:, 0]) == list(range(8))
        assert np.allclose(scores[:, 0], 1.0)
        idx.delete(0)
        ids, _ = idx.search_batch_arrays(
            data[:1].astype(np.float32), 1, SimilarityMetric.EUCLIDEAN
        )
        assert ids[0, 0] != 0

    def test_incremental_sync(self, rng):
        d = 16
        idx = FlatIndex(d, device_dtype="int8")
        data = rng.normal(size=(300, d))
        for i in range(200):
            idx.add(vec(i, data[i]))
        idx.search(list(data[0]), 1, SimilarityMetric.COSINE)  # sync
        for i in range(200, 300):
            idx.add(vec(i, data[i]))
        res = idx.search(list(data[250]), 1, SimilarityMetric.COSINE)
        assert res[0].id == 250

    def test_profile_selects_int8(self):
        from vectorlite_tpu import (
            IndexType,
            MockEmbeddingFunction,
            VectorLiteClient,
            VectorLiteConfig,
        )

        client = VectorLiteClient(
            MockEmbeddingFunction(dimension=8),
            config=VectorLiteConfig.profile("quantized"),
        )
        client.create_collection("q", IndexType.FLAT)
        with client.get_collection("q").index_read() as idx:
            assert idx._quantized
        client.add_text_to_collection("q", "hello")
        res = client.search_text_in_collection("q", "hello", 1)
        assert res[0].score > 0.999
