"""The array-native embed->insert->search path (SURVEY §2 row 6 target:
the loop never materializes per-value Python objects; VERDICT round-1
item 4). Checks equivalence with the Vector-object path and the
all-or-nothing validation contract.
"""

import numpy as np
import pytest

from vectorlite_tpu import (
    FlatIndex,
    HNSWIndex,
    IndexType,
    SimilarityMetric,
    Vector,
    VectorLiteClient,
)
from vectorlite_tpu.embed.minilm import MiniLMEmbedder
from vectorlite_tpu.embed.mock import MockEmbeddingFunction
from vectorlite_tpu.errors import DimensionMismatch, DuplicateVectorId


@pytest.fixture
def data(rng):
    return rng.normal(size=(64, 12))


class TestFlatAddBatchArrays:
    def test_matches_per_row_add(self, data):
        a = FlatIndex(12)
        b = FlatIndex(12)
        a.add_batch_arrays(range(64), data, [f"t{i}" for i in range(64)])
        for i, row in enumerate(data):
            b.add(Vector(id=i, values=list(map(float, row)), text=f"t{i}"))
        q = data[:5]
        ids_a, sc_a = a.search_batch_arrays(q, 3, SimilarityMetric.COSINE)
        ids_b, sc_b = b.search_batch_arrays(q, 3, SimilarityMetric.COSINE)
        assert np.array_equal(ids_a, ids_b)
        np.testing.assert_array_equal(sc_a, sc_b)
        assert a.get_vector(7).values == b.get_vector(7).values
        assert a.get_vector(7).text == "t7"

    def test_all_or_nothing_on_duplicate(self, data):
        idx = FlatIndex(12)
        idx.add(Vector(id=5, values=list(map(float, data[0])), text=""))
        with pytest.raises(DuplicateVectorId):
            idx.add_batch_arrays([1, 2, 5], data[:3])
        with pytest.raises(DuplicateVectorId):
            idx.add_batch_arrays([7, 7, 8], data[:3])
        assert len(idx) == 1  # nothing partially inserted

    def test_dimension_mismatch(self, data):
        idx = FlatIndex(10)
        with pytest.raises(DimensionMismatch):
            idx.add_batch_arrays([1], data[:1])

    def test_metadata_and_growth(self, rng):
        idx = FlatIndex(4)
        big = rng.normal(size=(600, 4))  # grows past the 256 min capacity
        metas = [{"i": i} for i in range(600)]
        idx.add_batch_arrays(range(600), big, metadatas=metas)
        assert len(idx) == 600
        assert idx.get_vector(599).metadata == {"i": 599}
        assert idx.get_vector(0).text == ""


class TestHnswAddBatchArrays:
    def test_matches_vector_batch(self, data):
        a = HNSWIndex(12, SimilarityMetric.COSINE, seed=3)
        b = HNSWIndex(12, SimilarityMetric.COSINE, seed=3)
        a.add_batch_arrays(
            [i * 2 for i in range(64)], data, [f"t{i}" for i in range(64)]
        )
        b.add_batch(
            [
                Vector(id=i * 2, values=list(map(float, r)), text=f"t{i}")
                for i, r in enumerate(data)
            ]
        )
        for qi in (0, 17, 40):
            ra = a.search(list(data[qi]), 3, SimilarityMetric.COSINE)
            rb = b.search(list(data[qi]), 3, SimilarityMetric.COSINE)
            assert [h.id for h in ra] == [h.id for h in rb]
        assert a.get_vector(34).text == "t17"

    def test_duplicate_rejected_before_mutation(self, data):
        idx = HNSWIndex(12, SimilarityMetric.EUCLIDEAN)
        idx.add_batch_arrays([0, 1], data[:2])
        with pytest.raises(DuplicateVectorId):
            idx.add_batch_arrays([2, 1], data[2:4])
        assert len(idx) == 2


class TestEmbedBatchArrays:
    def test_minilm_array_path_matches_lists(self):
        emb = MiniLMEmbedder.random_init(
            seed=0,
            config={
                "hidden_size": 32,
                "num_hidden_layers": 1,
                "num_attention_heads": 4,
                "intermediate_size": 64,
                "vocab_size": 512,
                "max_position_embeddings": 64,
            },
        )
        texts = ["alpha beta", "gamma", "delta epsilon zeta"]
        arr = emb.embed_batch_arrays(texts)
        assert arr.shape == (3, 32)
        assert arr.dtype == np.float32
        lists = emb.embed_batch(texts)
        np.testing.assert_allclose(
            arr.astype(np.float64), np.asarray(lists), rtol=0, atol=0
        )
        # L2 normalized (reference: src/embeddings.rs:175-181)
        np.testing.assert_allclose(
            np.linalg.norm(arr, axis=1), 1.0, atol=1e-5
        )

    def test_mock_fallback_shape(self):
        emb = MockEmbeddingFunction(dimension=16)
        arr = emb.embed_batch_arrays(["a", "b"])
        assert arr.shape == (2, 16)
        assert emb.embed_batch_arrays([]).shape == (0, 16)

    def test_client_roundtrip_uses_array_path(self):
        # end to end through the client: add_texts -> search_texts
        client = VectorLiteClient(MockEmbeddingFunction(dimension=16))
        client.create_collection("c", IndexType.FLAT)
        texts = [f"doc {i}" for i in range(32)]
        ids = client.add_texts_to_collection("c", texts)
        assert ids == list(range(32))
        res = client.search_texts_in_collection("c", texts[:4], 1)
        assert [r[0].text for r in res] == texts[:4]
        # stored values are the embedder's output in f64
        v = client.get_vector_from_collection("c", 3)
        expect = MockEmbeddingFunction(16).generate_embedding("doc 3")
        np.testing.assert_allclose(v.values, expect, rtol=0, atol=0)
