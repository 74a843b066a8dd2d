"""Device beam search vs host HNSW search and flat ground truth."""

import numpy as np
import pytest

from vectorlite_tpu import FlatIndex, HNSWIndex, SimilarityMetric, Vector


def vec(id, values, text="t"):
    return Vector(id=id, values=list(values), text=text)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(3)
    n, d = 800, 24
    data = rng.normal(size=(n, d)).astype(np.float64)
    idx = HNSWIndex(d, SimilarityMetric.EUCLIDEAN, seed=5)
    for i in range(n):
        idx.add(vec(i, data[i]))
    flat = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
    return idx, flat, data, rng


class TestDeviceBeam:
    def test_matches_host_path(self, built):
        idx, _, data, rng = built
        queries = [list(rng.normal(size=data.shape[1])) for _ in range(16)]
        host = idx.search_batch(
            queries, 10, SimilarityMetric.EUCLIDEAN, use_device=False
        )
        dev = idx.search_batch(
            queries, 10, SimilarityMetric.EUCLIDEAN, use_device=True
        )
        overlaps = []
        for h, d_ in zip(host, dev):
            hs = {r.id for r in h}
            ds = {r.id for r in d_}
            overlaps.append(len(hs & ds) / max(len(hs), 1))
        assert np.mean(overlaps) >= 0.9, overlaps

    def test_recall_vs_flat(self, built):
        idx, flat, data, rng = built
        k = 10
        recalls = []
        for _ in range(16):
            q = list(rng.normal(size=data.shape[1]))
            truth = {r.id for r in flat.search(q, k, SimilarityMetric.EUCLIDEAN)}
            got = {
                r.id
                for r in idx.search(
                    q, k, SimilarityMetric.EUCLIDEAN, use_device=True
                )
            }
            recalls.append(len(truth & got) / k)
        assert np.mean(recalls) >= 0.9, recalls

    def test_scores_sorted_and_converted(self, built):
        idx, _, data, rng = built
        q = list(data[5])
        res = idx.search(q, 5, SimilarityMetric.EUCLIDEAN, use_device=True)
        assert res[0].id == 5
        assert abs(res[0].score - 1.0) < 1e-4  # identical vector: d=0
        scores = [r.score for r in res]
        assert scores == sorted(scores, reverse=True)

    def test_tombstones_excluded(self, built):
        idx, _, data, rng = built
        q = list(data[7])
        idx.delete(7)
        try:
            res = idx.search(q, 5, SimilarityMetric.EUCLIDEAN, use_device=True)
            assert 7 not in [r.id for r in res]
        finally:
            idx.add(vec(7, data[7]))  # restore for other tests

    def test_incremental_insert_visible_on_device(self, built):
        idx, _, data, rng = built
        # force a device sync, then insert and search again
        probe = list(data[0])
        idx.search(probe, 3, SimilarityMetric.EUCLIDEAN, use_device=True)
        new_vec = data[1] * 0.5 + data[2] * 0.5
        idx.add(vec(9999, new_vec))
        res = idx.search(
            list(new_vec), 1, SimilarityMetric.EUCLIDEAN, use_device=True
        )
        assert res[0].id == 9999
        idx.delete(9999)

    @pytest.mark.parametrize(
        "metric",
        [
            SimilarityMetric.COSINE,
            SimilarityMetric.MANHATTAN,
            SimilarityMetric.DOT_PRODUCT,
        ],
    )
    def test_other_metrics_device(self, metric, rng):
        n, d = 400, 16
        data = rng.normal(size=(n, d)) * 0.1
        idx = HNSWIndex(d, metric, seed=2)
        for i in range(n):
            idx.add(vec(i, data[i]))
        flat = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        recalls = []
        for _ in range(8):
            q = list(rng.normal(size=d) * 0.1)
            truth = {r.id for r in flat.search(q, 10, metric)}
            got = {r.id for r in idx.search(q, 10, metric, use_device=True)}
            recalls.append(len(truth & got) / 10)
        assert np.mean(recalls) >= 0.85, (metric, recalls)
