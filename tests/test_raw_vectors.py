"""Raw-vector API (extension): bulk insert of precomputed embeddings and
search-by-vector across Collection/Client/HTTP.

The reference exposes these only at the library level — hand-built
``Vector`` records against ``VectorIndex::add`` (reference:
src/lib.rs:224-245; its own integration test ingests a precomputed-
embedding dataset exactly this way, tests/integration_test.rs:39-66) and
``VectorIndex::search(&[f64], k)`` (reference: src/lib.rs:293-298).
Here they are first-class SDK + HTTP paths.
"""

import asyncio
import math

import numpy as np
import pytest

from vectorlite_tpu import SimilarityMetric, VectorLiteClient
from vectorlite_tpu.embed.mock import MockEmbeddingFunction
from vectorlite_tpu.errors import (
    CollectionNotFound,
    DimensionMismatch,
    DuplicateVectorId,
    MetricMismatch,
)
from vectorlite_tpu.store.client import IndexType

DIM = 8


@pytest.fixture()
def client():
    return VectorLiteClient(MockEmbeddingFunction(DIM))


def _unit(i, dim=DIM):
    v = [0.0] * dim
    v[i] = 1.0
    return v


class TestAddVectorsSDK:
    def test_auto_ids_sequential_and_roundtrip(self, client):
        client.create_collection("c", IndexType.FLAT)
        ids = client.add_vectors_to_collection(
            "c",
            [_unit(0), _unit(1)],
            texts=["a", "b"],
            metadatas=[{"k": 1}, None],
        )
        assert ids == [0, 1]
        v = client.get_vector_from_collection("c", 0)
        assert v.text == "a" and v.metadata == {"k": 1}
        assert list(np.asarray(v.values)) == _unit(0)
        # counter continues from the bulk insert
        assert client.add_text_to_collection("c", "next") == 2

    def test_explicit_ids_bump_counter(self, client):
        client.create_collection("c", IndexType.FLAT)
        ids = client.add_vectors_to_collection(
            "c", [_unit(0), _unit(1)], ids=[10, 20]
        )
        assert ids == [10, 20]
        # later auto ids never collide with explicit ones
        assert client.add_text_to_collection("c", "t") == 21

    def test_explicit_id_reuse_rejected_all_or_nothing(self, client):
        client.create_collection("c", IndexType.FLAT)
        client.add_vectors_to_collection("c", [_unit(0)], ids=[5])
        with pytest.raises(DuplicateVectorId):
            client.add_vectors_to_collection(
                "c", [_unit(1), _unit(2)], ids=[6, 5]
            )
        # nothing from the failed batch landed
        assert client.get_vector_from_collection("c", 6) is None
        assert client.get_collection_info("c").count == 1

    def test_id_validation(self, client):
        client.create_collection("c", IndexType.FLAT)
        with pytest.raises(ValueError):
            client.add_vectors_to_collection("c", [_unit(0)], ids=[-1])
        with pytest.raises(ValueError):
            client.add_vectors_to_collection("c", [_unit(0)], ids=[1 << 64])

    def test_shape_validation(self, client):
        client.create_collection("c", IndexType.FLAT)
        with pytest.raises(ValueError):
            client.add_vectors_to_collection("c", [[1.0, 2.0], [1.0]])
        with pytest.raises(ValueError):
            client.add_vectors_to_collection("c", [[1.0, float("nan")]])
        with pytest.raises(DimensionMismatch):
            client.add_vectors_to_collection("c", [[1.0, 2.0, 3.0]])
        assert client.add_vectors_to_collection("c", []) == []

    def test_missing_collection(self, client):
        with pytest.raises(CollectionNotFound):
            client.add_vectors_to_collection("nope", [_unit(0)])

    def test_zero_width_rows_rejected(self, client):
        # a batch of B empty rows must error, not silently insert nothing
        client.create_collection("c", IndexType.FLAT)
        with pytest.raises(ValueError):
            client.add_vectors_to_collection("c", [[], []], texts=["a", "b"])
        assert client.get_collection_info("c").count == 0

    def test_float_ids_rejected_not_truncated(self, client):
        client.create_collection("c", IndexType.FLAT)
        with pytest.raises(ValueError):
            client.add_vectors_to_collection("c", [_unit(0)], ids=[5.5])
        assert client.get_collection_info("c").count == 0
        # np.integer is fine
        ids = client.add_vectors_to_collection(
            "c", [_unit(0)], ids=[np.int64(5)]
        )
        assert ids == [5]

    def test_ids_rows_mismatch(self, client):
        client.create_collection("c", IndexType.FLAT)
        with pytest.raises(ValueError):
            client.add_vectors_to_collection(
                "c", [_unit(0), _unit(1)], ids=[1]
            )
        with pytest.raises(ValueError):
            client.add_vectors_to_collection("c", [_unit(0)], ids=[1, 2])
        assert client.get_collection_info("c").count == 0

    def test_failed_explicit_insert_still_burns_id_range(self, client):
        # ids are burned BEFORE the insert (same semantics as text adds,
        # reference: src/client.rs:350-353) so a concurrent auto-id add
        # can never be handed a colliding id mid-flight
        client.create_collection("c", IndexType.FLAT)
        with pytest.raises(DimensionMismatch):
            client.add_vectors_to_collection(
                "c", [[1.0, 2.0, 3.0]], ids=[100]
            )
        assert client.add_text_to_collection("c", "after") == 101

    def test_generic_index_fallback_is_all_or_nothing(self, client):
        # an index without add_batch_arrays (third-party VectorIndex
        # implementations) must get the same all-or-nothing validation
        from vectorlite_tpu.index.flat import FlatIndex
        from vectorlite_tpu.store.collection import Collection

        class MinimalIndex:
            """Protocol-only index: delegates to Flat, hides the batch API."""

            def __init__(self, dim):
                self._f = FlatIndex(dim)
                self.dimension = dim

            def __getattr__(self, name):
                if name == "add_batch_arrays":
                    raise AttributeError(name)
                return getattr(self._f, name)

            def __len__(self):
                return len(self._f)

        col = Collection("m", MinimalIndex(DIM))
        col.add_vectors([_unit(0)], ids=[3])
        with pytest.raises(DuplicateVectorId):
            # 2nd row collides with the stored id: NOTHING may land
            col.add_vectors([_unit(1), _unit(2)], ids=[4, 3])
        assert col.get_vector(4) is None
        with pytest.raises(DuplicateVectorId):
            # in-batch duplicate
            col.add_vectors([_unit(1), _unit(2)], ids=[5, 5])
        assert col.get_vector(5) is None
        with pytest.raises(ValueError):
            col.add_vectors([_unit(1), _unit(2)], texts=["only-one"])
        assert len(col.list_vectors()[0]) == 1

    def test_hnsw_add_and_search(self, client):
        client.create_collection(
            "h", IndexType.HNSW, SimilarityMetric.EUCLIDEAN
        )
        ids = client.add_vectors_to_collection(
            "h", [_unit(i) for i in range(DIM)]
        )
        assert ids == list(range(DIM))
        hits = client.search_vector_in_collection("h", _unit(3), k=1)
        assert hits[0].id == 3
        # identical vector -> distance 0 -> similarity 1/(1+0)
        assert math.isclose(hits[0].score, 1.0, rel_tol=1e-9)


class TestSearchVectorsSDK:
    def test_flat_cosine_exact(self, client):
        client.create_collection("c", IndexType.FLAT)
        client.add_vectors_to_collection(
            "c", [_unit(i) for i in range(DIM)],
            texts=[f"t{i}" for i in range(DIM)],
        )
        hits = client.search_vector_in_collection("c", _unit(2), k=3)
        assert hits[0].id == 2 and hits[0].text == "t2"
        assert math.isclose(hits[0].score, 1.0, abs_tol=1e-12)

    def test_batched_order(self, client):
        client.create_collection("c", IndexType.FLAT)
        client.add_vectors_to_collection("c", [_unit(i) for i in range(DIM)])
        batches = client.search_vectors_in_collection(
            "c", [_unit(4), _unit(1)], k=1
        )
        assert [b[0].id for b in batches] == [4, 1]

    def test_raw_and_text_paths_interoperate(self, client):
        client.create_collection("c", IndexType.FLAT)
        tid = client.add_text_to_collection("c", "hello world")
        emb = client.embedding_function.generate_embedding("hello world")
        hits = client.search_vector_in_collection("c", emb, k=1)
        assert hits[0].id == tid and hits[0].text == "hello world"
        # and raw-added vectors are reachable via text search
        rid = client.add_vectors_to_collection(
            "c",
            [client.embedding_function.generate_embedding("raw doc")],
            texts=["raw doc"],
        )[0]
        out = client.search_text_in_collection("c", "raw doc", 1)
        assert out[0].id == rid

    def test_where_filter(self, client):
        client.create_collection("c", IndexType.FLAT)
        client.add_vectors_to_collection(
            "c",
            [_unit(i) for i in range(4)],
            metadatas=[{"lang": "en" if i % 2 else "de"} for i in range(4)],
        )
        hits = client.search_vector_in_collection(
            "c", _unit(0), k=4, where={"lang": "en"}
        )
        assert sorted(h.id for h in hits) == [1, 3]

    def test_metric_mismatch_on_hnsw(self, client):
        client.create_collection(
            "h", IndexType.HNSW, SimilarityMetric.COSINE
        )
        client.add_vectors_to_collection("h", [_unit(0)])
        with pytest.raises(MetricMismatch):
            client.search_vector_in_collection(
                "h", _unit(0), k=1,
                similarity_metric=SimilarityMetric.EUCLIDEAN,
            )

    def test_query_validation(self, client):
        client.create_collection("c", IndexType.FLAT)
        client.add_vectors_to_collection("c", [_unit(0)])
        with pytest.raises(ValueError):
            client.search_vector_in_collection("c", [float("inf")] * DIM, 1)
        with pytest.raises(DimensionMismatch):
            client.search_vector_in_collection("c", [1.0, 2.0], 1)

    def test_empty_query_vector_is_value_error(self, client):
        # must be ValueError, not IndexError from an empty batch
        client.create_collection("c", IndexType.FLAT)
        client.add_vectors_to_collection("c", [_unit(0)])
        with pytest.raises(ValueError):
            client.search_vector_in_collection("c", [], 3)
        with pytest.raises(ValueError):
            client.search_vectors_in_collection("c", [[], []], 3)

    def test_empty_index_search_is_empty(self, client):
        # reference quirk: dim check only applies when non-empty
        # (reference: src/index/flat.rs:99)
        client.create_collection("c", IndexType.FLAT)
        assert client.search_vector_in_collection("c", [1.0, 2.0], 3) == []


class TestPersistence:
    def test_raw_added_vectors_survive_vlc(self, client, tmp_path):
        from vectorlite_tpu.store.collection import Collection

        client.create_collection("c", IndexType.FLAT)
        client.add_vectors_to_collection(
            "c", [_unit(0), _unit(1)], texts=["a", "b"], ids=[7, 9]
        )
        path = tmp_path / "c.vlc"
        client.get_collection("c").save_to_file(path)
        loaded = Collection.load_from_file(path)
        # next_id recovered as max_id + 1 (reference: src/client.rs:295-308)
        assert loaded.next_id() == 10
        v = loaded.get_vector(9)
        assert v is not None and v.text == "b"


class TestHTTP:
    def _run(self, coro):
        return asyncio.run(coro)

    def test_http_roundtrip(self):
        from aiohttp.test_utils import TestClient, TestServer

        from vectorlite_tpu.api.server import create_app

        async def go():
            app = create_app(VectorLiteClient(MockEmbeddingFunction(4)))
            async with TestClient(TestServer(app)) as tc:
                r = await tc.post(
                    "/collections",
                    json={"name": "c", "index_type": "flat"},
                )
                assert r.status == 200
                r = await tc.post(
                    "/collections/c/vectors",
                    json={
                        "vectors": [
                            {"values": [1, 0, 0, 0], "text": "x",
                             "metadata": {"m": 1}},
                            {"values": [0, 1, 0, 0]},
                        ]
                    },
                )
                assert r.status == 200
                assert (await r.json())["ids"] == [0, 1]
                # explicit id + GET by id
                r = await tc.post(
                    "/collections/c/vectors",
                    json={"vectors": [{"values": [0, 0, 1, 0], "id": 42}]},
                )
                assert (await r.json())["ids"] == [42]
                r = await tc.get("/collections/c/vectors/42")
                assert r.status == 200
                got = (await r.json())["vector"]
                assert got["values"] == [0.0, 0.0, 1.0, 0.0]
                # single raw search
                r = await tc.post(
                    "/collections/c/search/vector",
                    json={"vector": [1, 0, 0, 0], "k": 1},
                )
                assert r.status == 200
                hit = (await r.json())["results"][0]
                assert hit["id"] == 0 and hit["metadata"] == {"m": 1}
                # batched raw search
                r = await tc.post(
                    "/collections/c/search/vectors",
                    json={"vectors": [[0, 1, 0, 0], [0, 0, 1, 0]], "k": 1},
                )
                rows = (await r.json())["results"]
                assert [row[0]["id"] for row in rows] == [1, 42]

        self._run(go())

    def test_http_validation(self):
        from aiohttp.test_utils import TestClient, TestServer

        from vectorlite_tpu.api.server import create_app

        async def go():
            app = create_app(VectorLiteClient(MockEmbeddingFunction(4)))
            async with TestClient(TestServer(app)) as tc:
                await tc.post(
                    "/collections", json={"name": "c", "index_type": "flat"}
                )
                cases = [
                    # (body, fragment of the 400 message)
                    ({"vectors": "nope"}, "list of objects"),
                    ({"vectors": [{"text": "no values"}]},
                     "vectors[0].values"),
                    ({"vectors": [{"values": [1, True, 3, 4]}]},
                     "array of numbers"),
                    ({"vectors": [{"values": [1, 2, 3, 4], "id": -1}]},
                     "u64"),
                    ({"vectors": [{"values": [1, 2, 3, 4], "text": 7}]},
                     "must be a string"),
                    ({"vectors": [{"values": [1, 2, 3]},
                                  {"values": [1, 2, 3, 4]}]},
                     "share one dimension"),
                ]
                for body, frag in cases:
                    r = await tc.post("/collections/c/vectors", json=body)
                    assert r.status == 400, (body, await r.text())
                    assert frag in (await r.json())["message"], body
                # NaN literal: Python's json.loads accepts it, serde_json
                # rejects it — our posture matches serde
                r = await tc.post(
                    "/collections/c/search/vector",
                    data=b'{"vector": [NaN, 0, 0, 0]}',
                    headers={"content-type": "application/json"},
                )
                assert r.status == 400
                assert "finite" in (await r.json())["message"]
                # dim mismatch against a non-empty index is the canonical
                # DimensionMismatch message
                await tc.post(
                    "/collections/c/vectors",
                    json={"vectors": [{"values": [1, 0, 0, 0]}]},
                )
                r = await tc.post(
                    "/collections/c/search/vector",
                    json={"vector": [1, 0]},
                )
                assert r.status == 400

        self._run(go())
