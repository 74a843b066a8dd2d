"""TPU-accelerated bulk HNSW construction vs the classic insert path."""

import numpy as np
import pytest

from vectorlite_tpu import FlatIndex, HNSWIndex, SimilarityMetric, Vector
from vectorlite_tpu import native as native_mod

needs_native = pytest.mark.skipif(
    native_mod.load() is None, reason="native builder unavailable"
)


@pytest.fixture(autouse=True)
def _force_bulk(monkeypatch):
    monkeypatch.setenv("VECTORLITE_BULK_BUILD", "always")


def make_embeddings(n, d, n_clusters=64, spread=0.35, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    data = centers[assign] + spread * rng.normal(size=(n, d)) / np.sqrt(d)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    return data.astype(np.float64)


def vec(i, values):
    return Vector(id=i, values=list(values), text=f"t{i}")


@needs_native
class TestBulkBuild:
    @pytest.fixture(scope="class")
    def corpus(self):
        n, d = 6000, 48
        data = make_embeddings(n, d)
        flat = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        return n, d, data, flat

    def _recall(self, idx, flat, data, metric, nq=24, k=10, seed=9):
        rng = np.random.default_rng(seed)
        recalls = []
        for qi in rng.integers(0, len(data), nq):
            q = list(data[qi] + 0.01 * rng.normal(size=data.shape[1]))
            truth = {r.id for r in flat.search(q, k, metric)}
            got = {
                r.id for r in idx.search(q, k, metric, use_device=False)
            }
            recalls.append(len(truth & got) / k)
        return float(np.mean(recalls))

    def test_recall_parity_with_classic(self, corpus):
        n, d, data, flat = corpus
        metric = SimilarityMetric.COSINE
        vectors = [vec(i, data[i]) for i in range(n)]

        bulk = HNSWIndex(d, metric, seed=3, store_f64=False)
        bulk.add_batch(vectors)  # count >= 2048 -> bulk path
        assert len(bulk) == n
        assert bulk._entry >= 0
        assert bulk._num_nodes == n

        classic = HNSWIndex(d, metric, seed=3, store_f64=False)
        for v in vectors:
            classic.add(v)  # per-insert path

        r_bulk = self._recall(bulk, flat, data, metric)
        r_classic = self._recall(classic, flat, data, metric)
        assert r_bulk >= r_classic - 0.05, (r_bulk, r_classic)
        assert r_bulk >= 0.9, r_bulk

    def test_euclidean_bulk(self, corpus):
        n, d, data, flat = corpus
        metric = SimilarityMetric.EUCLIDEAN
        idx = HNSWIndex(d, metric, seed=1, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(n)])
        assert self._recall(idx, flat, data, metric) >= 0.9

    def test_manhattan_uses_classic_path(self, corpus):
        # manhattan has no matmul form: always classic, even when forced
        n, d, data, _ = corpus
        idx = HNSWIndex(d, SimilarityMetric.MANHATTAN, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(2100)])
        assert len(idx) == 2100
        res = idx.search(
            list(data[7]), 3, SimilarityMetric.MANHATTAN, use_device=False
        )
        assert res[0].id == 7

    def test_incremental_after_bulk(self, corpus):
        n, d, data, flat = corpus
        metric = SimilarityMetric.COSINE
        idx = HNSWIndex(d, metric, seed=5, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(3000)])
        # classic single inserts on top of a bulk-built graph
        for i in range(3000, 3100):
            idx.add(vec(i, data[i]))
        assert len(idx) == 3100
        res = idx.search(list(data[3050]), 1, metric, use_device=False)
        assert res[0].id == 3050

    def test_device_search_on_bulk_graph(self, corpus):
        n, d, data, _ = corpus
        metric = SimilarityMetric.COSINE
        idx = HNSWIndex(d, metric, seed=2, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(4096)])
        res = idx.search(list(data[123]), 5, metric, use_device=True)
        assert res[0].id == 123

    def test_serde_roundtrip_of_bulk_graph(self, corpus):
        n, d, data, _ = corpus
        metric = SimilarityMetric.COSINE
        idx = HNSWIndex(d, metric, seed=4, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(2500)])
        restored = HNSWIndex.index_from_json(idx.index_to_json())
        assert len(restored) == 2500
        res = restored.search(list(data[42]), 1, metric, use_device=False)
        assert res[0].id == 42

    def test_refine_preserves_or_improves_recall(self, corpus, monkeypatch):
        """hnsw_refine_l0: NN-descent NoN re-link must not regress recall
        on a bulk graph (at this scale bulk is already ~exact, so the
        invariant is non-degradation; the 1M navigability effect is
        measured in bench runs)."""
        n, d, data, flat = corpus
        results = {}
        for rounds in ("0", "2"):
            monkeypatch.setenv("VECTORLITE_BULK_REFINE", rounds)
            idx = HNSWIndex(d, SimilarityMetric.COSINE, seed=5)
            idx.add_batch([vec(i, data[i]) for i in range(n)])
            results[rounds] = self._recall(
                idx, flat, data, SimilarityMetric.COSINE
            )
        assert results["2"] >= results["0"] - 0.02, results

    def test_refine_keeps_graph_consistent(self, corpus, monkeypatch):
        """After refinement every adjacency entry is a live node and the
        graph still serves searches (no dangling/self links)."""
        n, d, data, flat = corpus
        monkeypatch.setenv("VECTORLITE_BULK_REFINE", "1")
        idx = HNSWIndex(d, SimilarityMetric.COSINE, seed=6)
        idx.add_batch([vec(i, data[i]) for i in range(2000)])
        idx._native_drain_dirty()
        adj = idx._adj[0][:2000]
        assert adj.max() < 2000
        for v in (0, 999, 1999):
            row = adj[v]
            live = row[row >= 0]
            assert v not in live  # no self links
            assert len(set(live.tolist())) == len(live)  # no dups
        res = idx.search(
            list(data[17]), 5, SimilarityMetric.COSINE, use_device=False
        )
        assert res[0].id == 17


    def test_threaded_link_and_refine(self, corpus, monkeypatch):
        """VECTORLITE_BUILD_THREADS>1 routes link + refine through the
        row-lock worker pool: the graph must stay consistent (no
        dangling/self links) and recall must match the sequential
        build's."""
        n, d, data, flat = corpus
        metric = SimilarityMetric.COSINE
        monkeypatch.setenv("VECTORLITE_BULK_REFINE", "2")

        monkeypatch.setenv("VECTORLITE_BUILD_THREADS", "1")
        seq = HNSWIndex(d, metric, seed=11, store_f64=False)
        seq.add_batch([vec(i, data[i]) for i in range(n)])

        monkeypatch.setenv("VECTORLITE_BUILD_THREADS", "4")
        par = HNSWIndex(d, metric, seed=11, store_f64=False)
        par.add_batch([vec(i, data[i]) for i in range(n)])

        assert len(par) == n and par._entry >= 0
        r_seq = self._recall(seq, flat, data, metric)
        r_par = self._recall(par, flat, data, metric)
        assert r_par >= r_seq - 0.03, (r_par, r_seq)
        par._native_drain_dirty()
        adj = par._adj[0][:n]
        assert adj.max() < n
        for v in (0, n // 2, n - 1):
            row = adj[v]
            assert v not in row[row >= 0]


@needs_native
class TestBulkAutoPolicy:
    """VECTORLITE_BULK_BUILD=auto (the default): bulk+refine engages
    past VECTORLITE_BULK_AUTO_ROWS on a TPU backend, classic below it
    and on other backends."""

    def _spy(self, monkeypatch):
        from vectorlite_tpu.index import bulk_build as bb

        calls = []
        real = bb.bulk_build

        def spy(index, start, count):
            calls.append((start, count))
            return real(index, start, count)

        monkeypatch.setattr(bb, "bulk_build", spy)
        return calls

    def _data(self, n=3000, d=32):
        return make_embeddings(n, d, seed=3)

    def test_engages_past_threshold_on_tpu(self, monkeypatch):
        import jax

        monkeypatch.delenv("VECTORLITE_BULK_BUILD", raising=False)
        monkeypatch.setenv("VECTORLITE_BULK_AUTO_ROWS", "2048")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        calls = self._spy(monkeypatch)
        data = self._data()
        idx = HNSWIndex(32, SimilarityMetric.COSINE, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(len(data))])
        assert calls, "auto policy must engage bulk past the threshold"
        res = idx.search(
            list(data[5]), 1, SimilarityMetric.COSINE, use_device=False
        )
        assert res[0].id == 5

    def test_stays_classic_below_threshold(self, monkeypatch):
        import jax

        monkeypatch.delenv("VECTORLITE_BULK_BUILD", raising=False)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        calls = self._spy(monkeypatch)  # default threshold: 400K
        data = self._data()
        idx = HNSWIndex(32, SimilarityMetric.COSINE, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(len(data))])
        assert not calls

    def test_stays_classic_on_non_tpu_backend(self, monkeypatch):
        monkeypatch.delenv("VECTORLITE_BULK_BUILD", raising=False)
        monkeypatch.setenv("VECTORLITE_BULK_AUTO_ROWS", "2048")
        calls = self._spy(monkeypatch)  # real backend here is cpu
        data = self._data()
        idx = HNSWIndex(32, SimilarityMetric.COSINE, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(len(data))])
        assert not calls

    def test_never_overrides_auto(self, monkeypatch):
        import jax

        monkeypatch.setenv("VECTORLITE_BULK_BUILD", "never")
        monkeypatch.setenv("VECTORLITE_BULK_AUTO_ROWS", "1024")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        calls = self._spy(monkeypatch)
        data = self._data()
        idx = HNSWIndex(32, SimilarityMetric.COSINE, store_f64=False)
        idx.add_batch([vec(i, data[i]) for i in range(len(data))])
        assert not calls
