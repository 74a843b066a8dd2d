"""Native C++ HNSW builder: parity with the pure-Python path."""

import numpy as np
import pytest

from vectorlite_tpu import FlatIndex, HNSWIndex, SimilarityMetric, Vector
from vectorlite_tpu import native as native_mod


def vec(id, values, text="t"):
    return Vector(id=id, values=list(values), text=text)


needs_native = pytest.mark.skipif(
    native_mod.load() is None, reason="native builder unavailable"
)


@needs_native
class TestNativeBuilder:
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
        n, d, k = 600, 24, 10
        data = rng.normal(size=(n, d)) * 0.1
        idx = HNSWIndex(d, metric, native=True, seed=7)
        idx.add_batch([vec(i, data[i]) for i in range(n)])
        assert len(idx) == n
        flat = FlatIndex(d, [vec(i, data[i]) for i in range(n)])
        recalls = []
        for _ in range(16):
            q = list(rng.normal(size=d) * 0.1)
            truth = {r.id for r in flat.search(q, k, metric)}
            got = {r.id for r in idx.search(q, k, metric, use_device=False)}
            recalls.append(len(truth & got) / k)
        assert np.mean(recalls) >= 0.9, (metric, recalls)

    def test_incremental_add_and_capacity_growth(self, rng):
        d = 16
        idx = HNSWIndex(d, SimilarityMetric.EUCLIDEAN, native=True)
        data = rng.normal(size=(700, d))  # crosses the 256 -> 512 -> 1024 caps
        for i in range(700):
            idx.add(vec(i, data[i]))
        res = idx.search(
            list(data[650]), 1, SimilarityMetric.EUCLIDEAN, use_device=False
        )
        assert res[0].id == 650
        assert abs(res[0].score - 1.0) < 1e-4

    def test_device_search_over_native_graph(self, rng):
        n, d = 500, 16
        data = rng.normal(size=(n, d))
        idx = HNSWIndex(d, SimilarityMetric.EUCLIDEAN, native=True, seed=3)
        idx.add_batch([vec(i, data[i]) for i in range(n)])
        # force device path; dirty rows must flow C++ -> device
        res = idx.search(
            list(data[123]), 5, SimilarityMetric.EUCLIDEAN, use_device=True
        )
        assert res[0].id == 123
        idx.add(vec(9000, data[7] * 0.5))
        res = idx.search(
            list(data[7] * 0.5), 1, SimilarityMetric.EUCLIDEAN,
            use_device=True,
        )
        assert res[0].id == 9000

    def test_delete_tombstone(self, rng):
        d = 8
        data = rng.normal(size=(50, d))
        idx = HNSWIndex(d, SimilarityMetric.COSINE, native=True)
        idx.add_batch([vec(i, data[i]) for i in range(50)])
        idx.delete(10)
        res = idx.search(
            list(data[10]), 10, SimilarityMetric.COSINE, use_device=False
        )
        assert 10 not in [r.id for r in res]

    def test_serde_rebuild_uses_batch(self, rng):
        d = 8
        data = rng.normal(size=(40, d))
        idx = HNSWIndex(d, SimilarityMetric.EUCLIDEAN, native=True)
        idx.add_batch([vec(i, data[i], f"t{i}") for i in range(40)])
        restored = HNSWIndex.index_from_json(idx.index_to_json())
        assert len(restored) == 40
        res = restored.search(
            list(data[5]), 1, SimilarityMetric.EUCLIDEAN, use_device=False
        )
        assert res[0].id == 5
        assert res[0].text == "t5"

    def test_graph_arrays_export(self, rng):
        d = 8
        data = rng.normal(size=(300, d))
        idx = HNSWIndex(d, SimilarityMetric.EUCLIDEAN, native=True)
        idx.add_batch([vec(i, data[i]) for i in range(300)])
        vecs, adj0, entry, levels, upper = idx.graph_arrays()
        assert vecs.shape == (300, d)
        assert adj0.shape == (300, idx.m0)
        assert 0 <= entry < 300
        assert (levels >= 0).all()
        # every node must have at least one level-0 link (connected graph)
        assert (adj0 >= 0).any(axis=1).all()


class TestTsanHarness:
    """ThreadSanitizer pass over the parallel builder (the reference has
    no race-detection tooling; this is the TPU build's analogue of
    cargo's thread-safety-by-construction). Skips when the toolchain
    lacks -fsanitize=thread."""

    def test_tsan_clean(self, tmp_path):
        import subprocess
        from pathlib import Path

        src = (
            Path(__file__).parent.parent
            / "vectorlite_tpu"
            / "native"
            / "tsan_harness.cpp"
        )
        exe = tmp_path / "vl_tsan"
        build = subprocess.run(
            [
                "g++", "-fsanitize=thread", "-O1", "-g", "-std=c++17",
                "-pthread", str(src), "-o", str(exe),
            ],
            capture_output=True,
            text=True,
        )
        if build.returncode != 0:
            import pytest

            pytest.skip(f"tsan unsupported: {build.stderr[:200]}")
        run = subprocess.run(
            [str(exe)], capture_output=True, text=True, timeout=600
        )
        assert run.returncode == 0, run.stderr[-2000:]
        assert "ThreadSanitizer" not in run.stderr, run.stderr[-2000:]
        assert "tsan harness OK" in run.stdout


@needs_native
def test_search_pool_fanout(monkeypatch, rng):
    """Force VECTORLITE_SEARCH_THREADS>1 so the persistent pool engages
    (this box defaults to 1 thread); results must match the sequential
    path exactly, including under concurrent batched calls."""
    import threading

    from vectorlite_tpu import HNSWIndex, SimilarityMetric, Vector

    d, n = 16, 800
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    idx = HNSWIndex(d, SimilarityMetric.COSINE, seed=4)
    idx.add_batch(
        [Vector(id=i, values=[float(x) for x in data[i]], text="") for i in range(n)]
    )
    queries = [list(map(float, data[i] + 1e-3)) for i in range(64)]

    monkeypatch.setenv("VECTORLITE_SEARCH_THREADS", "1")
    seq = idx.search_batch(queries, 5, SimilarityMetric.COSINE, ef=32,
                           use_device=False)
    monkeypatch.setenv("VECTORLITE_SEARCH_THREADS", "3")
    pooled = idx.search_batch(queries, 5, SimilarityMetric.COSINE, ef=32,
                              use_device=False)
    for a, b in zip(seq, pooled):
        assert [r.id for r in a] == [r.id for r in b]

    # concurrent batched calls share the pool without interference
    errs = []

    def hammer():
        try:
            for _ in range(5):
                out = idx.search_batch(
                    queries, 5, SimilarityMetric.COSINE, ef=32,
                    use_device=False,
                )
                assert [r.id for r in out[0]] == [r.id for r in seq[0]]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=hammer) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
