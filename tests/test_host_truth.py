"""Disk-backed f64 truth mode (VECTORLITE_HOST_TRUTH_DIR): the truth
matrix lives in an unlinked memmap so host RAM bounds the working set,
not the corpus — the companion to the pq HBM rung at 10M+ scale.
Behavior must be bit-identical to the RAM matrix."""

import numpy as np
import pytest

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.core.types import Vector
from vectorlite_tpu.index.flat import FlatIndex

M = SimilarityMetric
D = 16


def rows_of(n, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.normal(size=(n, D))
    return r / np.linalg.norm(r, axis=1, keepdims=True)


@pytest.fixture
def truth_dir(tmp_path, monkeypatch):
    d = tmp_path / "truth"
    monkeypatch.setenv("VECTORLITE_HOST_TRUTH_DIR", str(d))
    return d


class TestMemmapTruth:
    def test_backing_is_memmap_and_file_unlinked(self, truth_dir):
        index = FlatIndex(D)
        assert isinstance(index._values64, np.memmap)
        # unlink-after-map: no visible files, nothing to leak
        assert list(truth_dir.iterdir()) == []

    def test_identical_to_ram_index(self, truth_dir, monkeypatch):
        rows = rows_of(700)
        mm = FlatIndex(D)
        monkeypatch.delenv("VECTORLITE_HOST_TRUTH_DIR")
        ram = FlatIndex(D)
        for idx in (mm, ram):
            idx.add_batch_arrays(
                list(range(600)), rows[:600],
                metadatas=[{"p": i % 3} for i in range(600)],
            )
            for i in range(600, 700):  # forces capacity growth
                idx.add(Vector(id=i, values=rows[i], text=f"t{i}"))
            for i in range(0, 600, 3):
                idx.delete(i)
            idx.compact()
        assert isinstance(mm._values64, np.memmap)
        assert not isinstance(ram._values64, np.memmap)
        q = rows_of(4, seed=9)
        for metric in (M.COSINE, M.EUCLIDEAN, M.DOT_PRODUCT, M.MANHATTAN):
            for b in range(4):
                a = mm.search(q[b], 10, metric)
                e = ram.search(q[b], 10, metric)
                assert [(r.id, r.score) for r in a] == [
                    (r.id, r.score) for r in e
                ], metric
        a = mm.search(q[0], 10, M.COSINE, where={"p": {"$eq": 1}})
        e = ram.search(q[0], 10, M.COSINE, where={"p": {"$eq": 1}})
        assert [r.id for r in a] == [r.id for r in e]

    def test_vlc_roundtrip_from_memmap(self, truth_dir, tmp_path):
        from vectorlite_tpu.persist.vlc import (
            load_collection_from_file,
            save_collection_to_file,
        )
        from vectorlite_tpu.store.collection import Collection

        index = FlatIndex(D)
        rows = rows_of(50)
        index.add_batch_arrays(
            list(range(50)), rows, texts=[f"t{i}" for i in range(50)]
        )
        col = Collection("mm", index)
        save_collection_to_file(col, tmp_path / "mm.vlc")
        loaded = load_collection_from_file(tmp_path / "mm.vlc")
        got = loaded.get_vectors(list(range(50)))
        assert len(got) == 50
        np.testing.assert_array_equal(
            np.asarray(got[7].values), index._values64[7]
        )

    def test_pq_profile_on_memmap_truth(self, truth_dir, monkeypatch):
        """The intended composition: codes in HBM, truth on disk."""
        monkeypatch.setenv("VECTORLITE_PQ_MIN_ROWS", "1024")
        monkeypatch.setenv("VECTORLITE_PQ_TRAIN_SAMPLE", "1024")
        monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")
        index = FlatIndex(D, device_dtype="pq")
        rows = rows_of(2048)
        index.add_batch_arrays(list(range(2048)), rows)
        got = index.search(rows[33], 3, M.COSINE)
        assert index._pq_active
        assert isinstance(index._values64, np.memmap)
        assert got[0].id == 33 and got[0].score == pytest.approx(1.0)
