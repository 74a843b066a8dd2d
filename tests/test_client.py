"""Client / collection tests (mirrors reference: src/client.rs:499-851)."""

import pytest

from vectorlite_tpu import (
    Collection,
    FlatIndex,
    IndexType,
    MockEmbeddingFunction,
    SimilarityMetric,
    Vector,
    VectorLiteClient,
)
from vectorlite_tpu.embed.mock import ConstantEmbeddingFunction
from vectorlite_tpu.errors import (
    CollectionAlreadyExists,
    CollectionNotFound,
    EmbeddingError,
    MetricRequired,
    VectorNotFound,
)


@pytest.fixture
def client():
    return VectorLiteClient(MockEmbeddingFunction(dimension=8))


class TestCollectionCrud:
    def test_create_and_list(self, client):
        client.create_collection("a", IndexType.FLAT)
        client.create_collection(
            "b", IndexType.HNSW, SimilarityMetric.COSINE
        )
        assert sorted(client.list_collections()) == ["a", "b"]
        assert client.has_collection("a")
        assert not client.has_collection("c")

    def test_create_with_string_index_type(self, client):
        """SDK convenience: "flat"/"hnsw" strings parse case-insensitively
        (a raw string must never fall through the enum identity check
        and silently build the wrong index)."""
        from vectorlite_tpu.errors import InvalidIndexType

        client.create_collection("s1", "flat")
        client.create_collection("s2", "HNSW", SimilarityMetric.COSINE)
        assert client.get_collection("s1").get_info().dimension == 8
        with client.get_collection("s1").index_read() as idx:
            assert idx.index_type == "Flat"
        with client.get_collection("s2").index_read() as idx:
            assert idx.index_type == "HNSW"
        with pytest.raises(InvalidIndexType):
            client.create_collection("s3", "btree")

    def test_create_duplicate(self, client):
        client.create_collection("a", IndexType.FLAT)
        with pytest.raises(CollectionAlreadyExists):
            client.create_collection("a", IndexType.FLAT)

    def test_hnsw_requires_metric(self, client):
        # reference: src/client.rs:96
        with pytest.raises(MetricRequired):
            client.create_collection("h", IndexType.HNSW)

    def test_delete_collection(self, client):
        client.create_collection("a", IndexType.FLAT)
        client.delete_collection("a")
        assert not client.has_collection("a")
        with pytest.raises(CollectionNotFound):
            client.delete_collection("a")

    def test_collection_dimension_from_embedder(self, client):
        client.create_collection("a", IndexType.FLAT)
        info = client.get_collection_info("a")
        assert info.dimension == 8

    def test_info_missing_collection(self, client):
        with pytest.raises(CollectionNotFound):
            client.get_collection_info("missing")


class TestTextOps:
    def test_id_sequencing(self, client):
        # ids are 0, 1, 2, ... (reference: src/client.rs:350)
        client.create_collection("a", IndexType.FLAT)
        ids = [
            client.add_text_to_collection("a", f"text {i}") for i in range(5)
        ]
        assert ids == [0, 1, 2, 3, 4]

    def test_update_text_replaces_in_place(self, client):
        """PUT semantics on both index types: same id, re-embedded
        values, replaced text+metadata, next_id untouched."""
        from vectorlite_tpu.errors import VectorNotFound

        client.create_collection("f", IndexType.FLAT)
        client.create_collection("h", IndexType.HNSW, SimilarityMetric.COSINE)
        for c in ("f", "h"):
            client.add_text_to_collection(c, "old text", {"rev": 1})
            client.add_text_to_collection(c, "other")
            client.update_text_in_collection(c, 0, "new text", {"rev": 2})
            v = client.get_vector_from_collection(c, 0)
            assert v.text == "new text" and v.metadata == {"rev": 2}
            # re-embedded: searching the new text hits id 0 with ~1.0
            hits = client.search_text_in_collection(c, "new text", 1)
            assert hits[0].id == 0 and hits[0].score > 0.999
            # same id space: the next insert takes id 2, not 3
            assert client.add_text_to_collection(c, "third") == 2
            with pytest.raises(VectorNotFound):
                client.update_text_in_collection(c, 99, "nope")

    def test_failed_embed_burns_id(self):
        # reference: src/client.rs:350-353
        class FailingEmbedder:
            calls = 0

            @property
            def dimension(self):
                return 4

            def generate_embedding(self, text):
                FailingEmbedder.calls += 1
                if FailingEmbedder.calls == 2:
                    raise RuntimeError("boom")
                return [1.0, 0.0, 0.0, 0.0]

            def embed_batch(self, texts):
                return [self.generate_embedding(t) for t in texts]

        client = VectorLiteClient(FailingEmbedder())
        client.create_collection("a", IndexType.FLAT)
        assert client.add_text_to_collection("a", "one") == 0
        with pytest.raises(EmbeddingError):
            client.add_text_to_collection("a", "two")
        assert client.add_text_to_collection("a", "three") == 2  # 1 burned

    def test_add_and_search(self, client):
        client.create_collection("a", IndexType.FLAT)
        client.add_text_to_collection("a", "hello world", {"tag": "greet"})
        client.add_text_to_collection("a", "completely different")
        results = client.search_text_in_collection("a", "hello world", 1)
        assert results[0].id == 0
        assert results[0].text == "hello world"
        assert results[0].metadata == {"tag": "greet"}
        assert results[0].score > 0.999

    def test_search_metric_autodetect_hnsw(self, client):
        # HNSW -> its own metric (reference: src/client.rs:143-155)
        client.create_collection(
            "h", IndexType.HNSW, SimilarityMetric.EUCLIDEAN
        )
        client.add_text_to_collection("h", "abc")
        # would raise MetricMismatch if the default Cosine were used
        results = client.search_text_in_collection("h", "abc", 1, None)
        assert len(results) == 1

    def test_delete_vector(self, client):
        client.create_collection("a", IndexType.FLAT)
        vid = client.add_text_to_collection("a", "hello")
        client.delete_from_collection("a", vid)
        assert client.get_vector_from_collection("a", vid) is None

    def test_hnsw_delete_missing_raises(self, client):
        client.create_collection(
            "h", IndexType.HNSW, SimilarityMetric.COSINE
        )
        with pytest.raises(VectorNotFound):
            client.delete_from_collection("h", 123)

    def test_get_vector(self, client):
        client.create_collection("a", IndexType.FLAT)
        vid = client.add_text_to_collection("a", "hello")
        v = client.get_vector_from_collection("a", vid)
        assert v.id == vid
        assert v.text == "hello"
        assert len(v.values) == 8

    def test_batched_add_and_search(self, client):
        client.create_collection("a", IndexType.FLAT)
        ids = client.add_texts_to_collection(
            "a", ["t0", "t1", "t2"], [{"i": 0}, None, None]
        )
        assert ids == [0, 1, 2]
        batches = client.search_texts_in_collection("a", ["t0", "t2"], 1)
        assert batches[0][0].id == 0
        assert batches[1][0].id == 2


class TestCollectionNextId:
    def test_next_id_recovery(self):
        # next_id = max_id + 1 on load (reference: src/client.rs:295-308)
        vectors = [
            Vector(id=5, values=[1.0, 0.0], text="a"),
            Vector(id=9, values=[0.0, 1.0], text="b"),
        ]
        collection = Collection("c", FlatIndex(2, vectors))
        assert collection.next_id() == 10

    def test_next_id_empty(self):
        collection = Collection("c", FlatIndex(2))
        assert collection.next_id() == 0

    def test_constant_embedder(self):
        client = VectorLiteClient(ConstantEmbeddingFunction([1.0, 2.0, 3.0]))
        client.create_collection("a", IndexType.FLAT)
        client.add_text_to_collection("a", "x")
        v = client.get_vector_from_collection("a", 0)
        assert v.values == [1.0, 2.0, 3.0]


class TestEfPlumbing:
    """Per-request ef must actually reach the HNSW index (and never be
    forwarded to Flat, whose search methods don't take it)."""

    def test_ef_reaches_hnsw_index(self, client, monkeypatch):
        # direct path (the coalescer batches asynchronously, which
        # would race the spy; ef-carrying requests bypass it anyway)
        monkeypatch.setenv("VECTORLITE_COALESCE", "0")
        client.create_collection(
            "h", IndexType.HNSW, SimilarityMetric.COSINE
        )
        client.add_texts_to_collection("h", [f"t{i}" for i in range(12)])
        col = client.get_collection("h")
        seen = {}
        orig_search = col._index.search
        orig_batch = col._index.search_batch

        def spy_search(q, k, metric, **kw):
            seen["search"] = kw.get("ef", "absent")
            return orig_search(q, k, metric, **kw)

        def spy_batch(q, k, metric, **kw):
            seen["batch"] = kw.get("ef", "absent")
            return orig_batch(q, k, metric, **kw)

        col._index.search = spy_search
        col._index.search_batch = spy_batch
        try:
            client.search_text_in_collection("h", "t3", 2, ef=7)
            assert seen["search"] == 7
            client.search_texts_in_collection("h", ["t1", "t2"], 2, ef=9)
            assert seen["batch"] == 9
            # ef=0 (reference-exact beam) must pass through, not be
            # dropped as falsy
            client.search_text_in_collection("h", "t3", 2, ef=0)
            assert seen["search"] == 0
            # absent -> the index's own default (no kwarg at all)
            client.search_text_in_collection("h", "t3", 2)
            assert seen["search"] == "absent"
        finally:
            col._index.search = orig_search
            col._index.search_batch = orig_batch

    def test_ef_ignored_on_flat(self, client):
        client.create_collection("f", IndexType.FLAT)
        client.add_texts_to_collection("f", ["a", "b", "c"])
        # FlatIndex.search has no ef parameter; this not raising IS the
        # assertion that collection-level dispatch drops it for Flat
        hits = client.search_text_in_collection("f", "a", 2, ef=64)
        assert hits and hits[0].text == "a"
        hits = client.search_vectors_in_collection(
            "f", [[1.0] * 8], 1, ef=64
        )
        assert len(hits) == 1
