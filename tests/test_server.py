"""HTTP surface tests — in-process, no real socket.

Mirrors the reference's tower::oneshot-based integration suites
(reference: tests/http_integration_test.rs, tests/persistence_api_test.rs):
status codes, JSON body shapes, and the error ``{"message": ...}`` contract.
"""

import asyncio

from aiohttp.test_utils import TestClient, TestServer

from vectorlite_tpu import VectorLiteClient
from vectorlite_tpu.api.server import create_app
from vectorlite_tpu.embed.mock import ConstantEmbeddingFunction


def make_client():
    # constant [1,2,3] mock (reference: tests/http_integration_test.rs:20-28)
    return VectorLiteClient(ConstantEmbeddingFunction([1.0, 2.0, 3.0]))


def make_text_client(dim=16):
    """Text-deterministic mock, for tests that must distinguish
    embeddings. Patched by test_server_mesh to return a mesh client."""
    from vectorlite_tpu.embed.mock import MockEmbeddingFunction

    return VectorLiteClient(MockEmbeddingFunction(dim))


def http(coro_fn, client=None):
    async def runner():
        app = create_app(client or make_client())
        async with TestClient(TestServer(app)) as tc:
            return await coro_fn(tc)

    return asyncio.run(runner())


class TestHealthAndCollections:
    def test_health(self):
        async def go(tc):
            resp = await tc.get("/health")
            assert resp.status == 200
            body = await resp.json()
            assert body["status"] == "healthy"
            assert body["service"] == "vectorlite"

        http(go)

    def test_list_collections_empty(self):
        async def go(tc):
            resp = await tc.get("/collections")
            assert resp.status == 200
            assert (await resp.json())["collections"] == []

        http(go)

    def test_create_collection(self):
        async def go(tc):
            resp = await tc.post(
                "/collections",
                json={"name": "test_collection", "index_type": "flat"},
            )
            assert resp.status == 200
            assert (await resp.json())["name"] == "test_collection"
            resp = await tc.get("/collections")
            assert (await resp.json())["collections"] == ["test_collection"]

        http(go)

    def test_create_duplicate_collection_409(self):
        async def go(tc):
            payload = {"name": "test_collection", "index_type": "flat"}
            assert (await tc.post("/collections", json=payload)).status == 200
            resp = await tc.post("/collections", json=payload)
            assert resp.status == 409
            body = await resp.json()
            assert (
                body["message"]
                == "Collection 'test_collection' already exists"
            )

        http(go)

    def test_create_invalid_index_type_400(self):
        async def go(tc):
            resp = await tc.post(
                "/collections", json={"name": "x", "index_type": "btree"}
            )
            assert resp.status == 400
            body = await resp.json()
            assert (
                body["message"]
                == "Invalid index type: btree. Must be 'flat' or 'hnsw'"
            )

        http(go)

    def test_create_hnsw_without_metric_400(self):
        async def go(tc):
            resp = await tc.post(
                "/collections", json={"name": "h", "index_type": "hnsw"}
            )
            assert resp.status == 400
            assert "HNSW index requires an explicit similarity metric" in (
                await resp.json()
            )["message"]

        http(go)

    def test_create_hnsw_with_metric(self):
        async def go(tc):
            resp = await tc.post(
                "/collections",
                json={
                    "name": "h",
                    "index_type": "HNSW",
                    "metric": "Euclidean",
                },
            )
            assert resp.status == 200

        http(go)

    def test_get_collection_info(self):
        async def go(tc):
            await tc.post(
                "/collections",
                json={"name": "test_collection", "index_type": "flat"},
            )
            resp = await tc.get("/collections/test_collection")
            assert resp.status == 200
            info = (await resp.json())["info"]
            assert info["name"] == "test_collection"
            assert info["count"] == 0
            assert info["is_empty"] is True
            assert info["dimension"] == 3

        http(go)

    def test_get_missing_collection_404(self):
        async def go(tc):
            resp = await tc.get("/collections/missing")
            assert resp.status == 404
            assert (await resp.json())["message"] == (
                "Collection 'missing' not found"
            )

        http(go)

    def test_delete_collection(self):
        async def go(tc):
            await tc.post(
                "/collections",
                json={"name": "test_collection", "index_type": "flat"},
            )
            resp = await tc.delete("/collections/test_collection")
            assert resp.status == 200
            assert (await resp.json())["name"] == "test_collection"
            resp = await tc.delete("/collections/test_collection")
            assert resp.status == 404

        http(go)


class TestVectorOps:
    def test_add_text(self):
        async def go(tc):
            await tc.post(
                "/collections",
                json={"name": "test_collection", "index_type": "flat"},
            )
            resp = await tc.post(
                "/collections/test_collection/text",
                json={"text": "Hello world"},
            )
            assert resp.status == 200
            assert (await resp.json())["id"] == 0

        http(go)

    def test_add_text_missing_collection_404(self):
        async def go(tc):
            resp = await tc.post(
                "/collections/missing/text", json={"text": "x"}
            )
            assert resp.status == 404

        http(go)

    def test_search_text(self):
        async def go(tc):
            await tc.post(
                "/collections",
                json={"name": "test_collection", "index_type": "flat"},
            )
            await tc.post(
                "/collections/test_collection/text",
                json={"text": "Hello world"},
            )
            resp = await tc.post(
                "/collections/test_collection/search/text",
                json={
                    "query": "Hello",
                    "k": 5,
                    "similarity_metric": "cosine",
                },
            )
            assert resp.status == 200
            results = (await resp.json())["results"]
            assert len(results) == 1
            assert results[0]["id"] == 0
            assert results[0]["text"] == "Hello world"

        http(go)

    def test_search_default_k(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            for i in range(12):
                await tc.post(
                    "/collections/c/text", json={"text": f"t{i}"}
                )
            resp = await tc.post(
                "/collections/c/search/text", json={"query": "q"}
            )
            # default k = 10 (reference: src/server.rs:263)
            assert len((await resp.json())["results"]) == 10

        http(go)

    def test_search_invalid_metric_400(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "q", "similarity_metric": "bogus"},
            )
            assert resp.status == 400

        http(go)

    def test_search_metric_mismatch_400(self):
        async def go(tc):
            await tc.post(
                "/collections",
                json={
                    "name": "h",
                    "index_type": "hnsw",
                    "metric": "euclidean",
                },
            )
            await tc.post("/collections/h/text", json={"text": "x"})
            resp = await tc.post(
                "/collections/h/search/text",
                json={"query": "q", "similarity_metric": "cosine"},
            )
            assert resp.status == 400
            assert "Metric mismatch" in (await resp.json())["message"]

        http(go)

    def test_get_vector(self):
        async def go(tc):
            await tc.post(
                "/collections",
                json={"name": "test_collection", "index_type": "flat"},
            )
            await tc.post(
                "/collections/test_collection/text",
                json={"text": "Hello world"},
            )
            resp = await tc.get("/collections/test_collection/vectors/0")
            assert resp.status == 200
            vector = (await resp.json())["vector"]
            assert vector["id"] == 0
            assert vector["values"] == [1.0, 2.0, 3.0]

        http(go)

    def test_get_missing_vector_404(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.get("/collections/c/vectors/99")
            assert resp.status == 404
            assert (await resp.json())["message"] == (
                "Vector ID 99 does not exist"
            )

        http(go)

    def test_delete_vector(self):
        async def go(tc):
            await tc.post(
                "/collections",
                json={"name": "test_collection", "index_type": "flat"},
            )
            await tc.post(
                "/collections/test_collection/text",
                json={"text": "Hello world"},
            )
            resp = await tc.delete("/collections/test_collection/vectors/0")
            assert resp.status == 200
            assert (await resp.json()) == {}

        http(go)

    def test_put_replaces_vector_in_place(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post(
                "/collections/c/texts",
                json={"texts": ["alpha", "beta"],
                      "metadatas": [{"v": 1}, {"v": 1}]},
            )
            resp = await tc.put(
                "/collections/c/vectors/0",
                json={"text": "gamma", "metadata": {"v": 2}},
            )
            assert resp.status == 200
            assert (await resp.json()) == {"id": 0}
            # same id, new text/values/metadata: a search for the new
            # text must hit id 0 exactly (mock embeddings are
            # text-deterministic)
            resp = await tc.post(
                "/collections/c/search/text", json={"query": "gamma", "k": 1}
            )
            hit = (await resp.json())["results"][0]
            assert hit["id"] == 0 and hit["text"] == "gamma"
            assert hit["metadata"] == {"v": 2} and hit["score"] > 0.999
            # metadata omitted = cleared; count unchanged
            resp = await tc.put(
                "/collections/c/vectors/0", json={"text": "delta"}
            )
            assert resp.status == 200
            resp = await tc.get("/collections/c/vectors/0")
            body = (await resp.json())["vector"]
            assert body["text"] == "delta" and body["metadata"] is None
            info = await (await tc.get("/collections/c")).json()
            assert info["info"]["count"] == 2
            # missing text -> 400; absent id / collection -> 404
            resp = await tc.put(
                "/collections/c/vectors/0", json={"metadata": {}}
            )
            assert resp.status == 400
            resp = await tc.put(
                "/collections/c/vectors/99", json={"text": "x"}
            )
            assert resp.status == 404
            resp = await tc.put(
                "/collections/zz/vectors/0", json={"text": "x"}
            )
            assert resp.status == 404

        http(go, make_text_client())

    def test_metadata_roundtrip(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            meta = {"author": "Kevin Malone", "year": 2005}
            await tc.post(
                "/collections/c/text",
                json={"text": "beach", "metadata": meta},
            )
            resp = await tc.post(
                "/collections/c/search/text", json={"query": "beach"}
            )
            results = (await resp.json())["results"]
            assert results[0]["metadata"] == meta

        http(go)


class TestPersistenceApi:
    """Mirrors reference: tests/persistence_api_test.rs."""

    def test_save_and_load(self, tmp_path):
        path = str(tmp_path / "c.vlc")

        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post("/collections/c/text", json={"text": "hello"})
            resp = await tc.post(
                "/collections/c/save", json={"file_path": path}
            )
            assert resp.status == 200
            assert (await resp.json())["file_path"] == path

            resp = await tc.post(
                "/collections/load",
                json={"file_path": path, "collection_name": "restored"},
            )
            assert resp.status == 200
            assert (await resp.json())["collection_name"] == "restored"

            resp = await tc.get("/collections/restored")
            info = (await resp.json())["info"]
            assert info["count"] == 1

        http(go)

    def test_save_missing_collection_404(self, tmp_path):
        async def go(tc):
            resp = await tc.post(
                "/collections/missing/save",
                json={"file_path": str(tmp_path / "x.vlc")},
            )
            assert resp.status == 404

        http(go)

    def test_load_missing_file_404(self, tmp_path):
        async def go(tc):
            resp = await tc.post(
                "/collections/load",
                json={"file_path": str(tmp_path / "nope.vlc")},
            )
            assert resp.status == 404
            assert (await resp.json())["message"].startswith(
                "File not found:"
            )

        http(go)

    def test_load_existing_name_409(self, tmp_path):
        path = str(tmp_path / "c.vlc")

        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post(
                "/collections/c/save", json={"file_path": path}
            )
            resp = await tc.post(
                "/collections/load", json={"file_path": path}
            )
            assert resp.status == 409

        http(go)

    def test_load_uses_name_from_file(self, tmp_path):
        path = str(tmp_path / "c.vlc")

        async def go(tc):
            await tc.post(
                "/collections", json={"name": "orig", "index_type": "flat"}
            )
            await tc.post(
                "/collections/orig/save", json={"file_path": path}
            )
            await tc.delete("/collections/orig")
            resp = await tc.post(
                "/collections/load", json={"file_path": path}
            )
            assert (await resp.json())["collection_name"] == "orig"

        http(go)


class TestObservability:
    def test_stats_endpoint(self):
        async def go(tc):
            await tc.get("/health")
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.get("/stats")
            assert resp.status == 200
            stats = await resp.json()
            assert any("GET /health" in k for k in stats)
            post_key = next(k for k in stats if k == "POST /collections")
            assert stats[post_key]["count"] == 1
            assert stats[post_key]["p50_ms"] >= 0

        http(go)

    def test_debug_trace_gated(self):
        async def go(tc):
            resp = await tc.post("/debug/trace")
            assert resp.status == 400
            assert "VECTORLITE_JAX_PROFILE_DIR" in (
                await resp.json()
            )["message"]

        http(go)


class TestReviewRegressions:
    def test_k_out_of_contract_bounds_400(self):
        # contract: k in 1..1000 (reference: docs/openapi.yaml:624-630)
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post("/collections/c/text", json={"text": "x"})
            for bad_k in (0, -3, 1001):
                resp = await tc.post(
                    "/collections/c/search/text",
                    json={"query": "x", "k": bad_k},
                )
                assert resp.status == 400, bad_k
                assert "between 1 and 1000" in (await resp.json())["message"]
            resp = await tc.post(
                "/collections/c/search/text", json={"query": "x", "k": 1000}
            )
            assert resp.status == 200

        http(go)

    def test_k_non_integer_400(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "x", "k": "abc"},
            )
            assert resp.status == 400
            assert "integer" in (await resp.json())["message"]

        http(go)

    def test_non_string_fields_400(self):
        """serde-typed DTO parity: the reference types text/query/name/
        index_type/file_path as String (src/server.rs:71-100), so a
        number/null/object body value is a reject, not a str() coercion."""
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            cases = [
                ("/collections", {"name": 7, "index_type": "flat"}),
                ("/collections", {"name": "x", "index_type": None}),
                ("/collections/c/text", {"text": 7}),
                ("/collections/c/text", {"text": None}),
                ("/collections/c/text", {"text": {"a": 1}}),
                ("/collections/c/search/text", {"query": 7}),
                ("/collections/c/search/text", {"query": ["q"]}),
                ("/collections/c/save", {"file_path": 7}),
                ("/collections/load", {"file_path": None}),
                (
                    "/collections/load",
                    {"file_path": "/tmp/x.vlc", "collection_name": 9},
                ),
                (
                    "/collections",
                    {"name": "m", "index_type": "flat", "metric": 0},
                ),
                (
                    "/collections",
                    {"name": "m", "index_type": "flat", "metric": None},
                ),
                (
                    "/collections/c/search/text",
                    {"query": "q", "similarity_metric": {"a": 1}},
                ),
            ]
            for path, body in cases:
                resp = await tc.post(path, json=body)
                assert resp.status == 400, (path, body)
                msg = (await resp.json())["message"]
                assert "must be a string" in msg, (path, body, msg)

        http(go)

    def test_vector_id_u64_bounds_400(self):
        """Path<u64> parity: negative or 2^64+ ids fail path parsing
        (400) rather than reading as absent ids (404)."""
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            # u64 FromStr parity: underscores, unicode digits, and
            # whitespace are Python int() quirks, not valid u64 text
            for bad in (
                "-1", str(1 << 64), "abc", "1e5", "1_0",
                "%D9%A1%D9%A0", "%205%20",
            ):
                resp = await tc.get(f"/collections/c/vectors/{bad}")
                assert resp.status == 400, bad
            # leading '+' IS accepted by Rust's u64 FromStr
            resp = await tc.get("/collections/c/vectors/+3")
            assert resp.status == 404
            # u64::MAX itself is a VALID id -> absent, 404
            resp = await tc.get(
                f"/collections/c/vectors/{(1 << 64) - 1}"
            )
            assert resp.status == 404

        http(go)

    def test_search_empty_metric_string_400(self):
        """Option<String> parity: similarity_metric present-but-empty
        reaches parse and errors (reference: src/server.rs:264-266) —
        only create's #[serde(default)] metric treats "" as unset."""
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "x", "similarity_metric": ""},
            )
            assert resp.status == 400
            assert "Invalid similarity metric" in (
                await resp.json()
            )["message"]
            # absent and null still auto-detect
            for body in (
                {"query": "x"},
                {"query": "x", "similarity_metric": None},
            ):
                resp = await tc.post(
                    "/collections/c/search/text", json=body
                )
                assert resp.status == 200, body
            # create still treats "" as unset
            resp = await tc.post(
                "/collections",
                json={"name": "c2", "index_type": "flat", "metric": ""},
            )
            assert resp.status == 200

        http(go)

    def test_cors_preflight_and_error_headers(self):
        async def go(tc):
            resp = await tc.options("/collections/c/search/text")
            assert resp.status == 204
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
            # CORS headers must also ride error responses
            resp = await tc.get("/collections/missing")
            assert resp.status == 404
            assert resp.headers["Access-Control-Allow-Origin"] == "*"

        http(go)

    def test_add_texts_metadata_length_mismatch(self):
        import pytest

        from vectorlite_tpu import IndexType

        client = make_client()
        client.create_collection("c", IndexType.FLAT)
        with pytest.raises(ValueError):
            client.add_texts_to_collection("c", ["a", "b"], [{"m": 1}])
        # no partial inserts
        assert client.get_collection_info("c").count == 0


class TestBatchedEndpoints:
    def test_add_and_search_texts(self):
        from vectorlite_tpu import MockEmbeddingFunction, VectorLiteClient

        # hash-based mock: distinct texts get distinct embeddings
        client = VectorLiteClient(MockEmbeddingFunction(dimension=16))

        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/texts",
                json={
                    "texts": ["a", "b", "c"],
                    "metadatas": [{"i": 0}, None, None],
                },
            )
            assert resp.status == 200
            assert (await resp.json())["ids"] == [0, 1, 2]
            resp = await tc.post(
                "/collections/c/search/texts",
                json={"queries": ["a", "c"], "k": 1},
            )
            assert resp.status == 200
            results = (await resp.json())["results"]
            assert len(results) == 2
            assert results[0][0]["id"] == 0
            assert results[1][0]["id"] == 2

        http(go, client=client)

    def test_batch_validation(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/texts", json={"texts": "not a list"}
            )
            assert resp.status == 400
            resp = await tc.post(
                "/collections/c/texts",
                json={"texts": ["a", "b"], "metadatas": [1]},
            )
            assert resp.status == 400
            resp = await tc.post(
                "/collections/c/search/texts",
                json={"queries": [1, 2]},
            )
            assert resp.status == 400

        http(go)


class TestRawVectorEndpoints:
    """Raw-vector extension routes: bulk precomputed-embedding insert +
    search-by-vector. Uses the module factory so test_server_mesh can
    route the whole class through the 8-device sharded client."""

    def test_add_and_search_roundtrip(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "r", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/r/vectors",
                json={
                    "vectors": [
                        {"values": [1.0, 0.0, 0.0], "text": "a",
                         "metadata": {"i": 0}},
                        {"values": [0.0, 1.0, 0.0], "text": "b"},
                        {"values": [0.0, 0.0, 1.0]},
                    ]
                },
            )
            assert resp.status == 200
            assert (await resp.json())["ids"] == [0, 1, 2]
            resp = await tc.post(
                "/collections/r/search/vector",
                json={"vector": [0.0, 1.0, 0.0], "k": 1},
            )
            assert resp.status == 200
            hit = (await resp.json())["results"][0]
            assert hit["id"] == 1 and hit["text"] == "b"
            resp = await tc.post(
                "/collections/r/search/vectors",
                json={"vectors": [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]],
                      "k": 1},
            )
            assert resp.status == 200
            rows = (await resp.json())["results"]
            assert [row[0]["id"] for row in rows] == [2, 0]
            # where filter rides the same path
            resp = await tc.post(
                "/collections/r/search/vector",
                json={"vector": [0.0, 1.0, 0.0], "k": 3,
                      "where": {"i": 0}},
            )
            assert [h["id"] for h in (await resp.json())["results"]] == [0]

        http(go)

    def test_explicit_ids_and_conflicts(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "r", "index_type": "flat"}
            )
            body = {"vectors": [{"values": [0.5, 0.5, 0.0], "id": 77}]}
            resp = await tc.post("/collections/r/vectors", json=body)
            assert resp.status == 200
            assert (await resp.json())["ids"] == [77]
            resp = await tc.post("/collections/r/vectors", json=body)
            assert resp.status == 409
            # auto ids continue past the explicit max
            resp = await tc.post(
                "/collections/r/vectors",
                json={"vectors": [{"values": [0.0, 1.0, 0.0]}]},
            )
            assert (await resp.json())["ids"] == [78]
            resp = await tc.get("/collections/r/vectors/77")
            assert resp.status == 200
            got = (await resp.json())["vector"]
            assert got["values"] == [0.5, 0.5, 0.0]

        http(go)

    def test_validation_statuses(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "r", "index_type": "flat"}
            )
            for body in (
                {"vectors": "nope"},
                {"vectors": [{"text": "no values"}]},
                {"vectors": [{"values": [1, "x", 3]}]},
                {"vectors": [{"values": [1, 2, 3], "id": 1},
                             {"values": [1, 2, 3]}]},  # mixed ids
                {"vectors": [{"values": [1, 2]}, {"values": [1, 2, 3]}]},
            ):
                resp = await tc.post("/collections/r/vectors", json=body)
                assert resp.status == 400, body
                assert "message" in (await resp.json())
            resp = await tc.post(
                "/collections/r/search/vector", json={"vector": []}
            )
            assert resp.status == 400
            resp = await tc.post(
                "/collections/nope/search/vectors",
                json={"vectors": [[1.0, 2.0, 3.0]]},
            )
            assert resp.status == 404

        http(go)


def test_body_size_limit_is_canonical_413(monkeypatch):
    """Over-size bodies must be a 413 with the {"message": ...} shape,
    not a misleading 400 "Invalid JSON body"; VECTORLITE_MAX_BODY_MB
    configures the cap (default 256 MiB — bulk routes carry multi-MB
    JSON)."""
    monkeypatch.setenv("VECTORLITE_MAX_BODY_MB", "0.001")

    async def go(tc):
        resp = await tc.post(
            "/collections/c/texts", json={"texts": ["x" * 10000]}
        )
        assert resp.status == 413
        assert "too large" in (await resp.json())["message"]

    http(go)


def test_body_size_limit_invalid_env_falls_back(monkeypatch):
    """aiohttp treats client_max_size=0 as *unlimited* and a negative
    cap 413s every request with a body; neither is a sane reading of
    VECTORLITE_MAX_BODY_MB=0/-1, so non-positive values fall back to
    the 256 MiB default (loudly, via a warning log)."""
    for bad in ("0", "-1"):
        monkeypatch.setenv("VECTORLITE_MAX_BODY_MB", bad)

        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/texts", json={"texts": ["x" * 10000]}
            )
            assert resp.status == 200  # normal body accepted

        http(go)


def test_flat_with_metric_allowed():
    # reference: metric is optional and unused for Flat collections
    async def go(tc):
        resp = await tc.post(
            "/collections",
            json={"name": "fm", "index_type": "flat", "metric": "euclidean"},
        )
        assert resp.status == 200
        # searches may still use any metric
        await tc.post("/collections/fm/text", json={"text": "x"})
        resp = await tc.post(
            "/collections/fm/search/text",
            json={"query": "x", "similarity_metric": "manhattan"},
        )
        assert resp.status == 200

    http(go)


class TestCompactRoute:
    def test_compact(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "cp", "index_type": "flat"}
            )
            for t in ("a", "b", "c"):
                await tc.post("/collections/cp/text", json={"text": t})
            r = await tc.post("/collections/cp/compact")
            assert r.status == 200
            assert (await r.json())["reclaimed"] == 0
            await tc.delete("/collections/cp/vectors/0")
            await tc.delete("/collections/cp/vectors/1")
            r = await tc.post("/collections/cp/compact")
            assert (await r.json())["reclaimed"] == 2
            r = await tc.post("/collections/nope/compact")
            assert r.status == 404
            body = await r.json()
            assert "not found" in body["message"]

        http(go)


class TestApiKeyAuth:
    """Opt-in bearer-token auth (extension; the reference server is
    unauthenticated). Enabled via create_app(api_key=...) or
    $VECTORLITE_API_KEY; GET /health stays open for healthchecks."""

    def _app(self, key="sekrit"):
        return create_app(make_client(), api_key=key)

    def test_requires_key(self):
        async def runner():
            async with TestClient(TestServer(self._app())) as tc:
                # no credentials -> 401 with the canonical body
                resp = await tc.get("/collections")
                assert resp.status == 401
                assert (await resp.json())["message"] == (
                    "Invalid or missing API key"
                )
                # wrong key -> 401
                resp = await tc.get(
                    "/collections",
                    headers={"Authorization": "Bearer nope"},
                )
                assert resp.status == 401
                # 401s still carry CORS headers (error middleware wraps)
                assert resp.headers["Access-Control-Allow-Origin"] == "*"
                # bearer works
                resp = await tc.get(
                    "/collections",
                    headers={"Authorization": "Bearer sekrit"},
                )
                assert resp.status == 200
                # X-API-Key alternative works
                resp = await tc.post(
                    "/collections",
                    json={"name": "c", "index_type": "flat"},
                    headers={"X-API-Key": "sekrit"},
                )
                assert resp.status == 200
                # writes really went through
                resp = await tc.get(
                    "/collections", headers={"X-API-Key": "sekrit"}
                )
                assert (await resp.json())["collections"] == ["c"]

        asyncio.run(runner())

    def test_health_exempt_and_preflight_open(self):
        async def runner():
            async with TestClient(TestServer(self._app())) as tc:
                resp = await tc.get("/health")
                assert resp.status == 200
                # CORS preflight must not demand credentials
                resp = await tc.options("/collections")
                assert resp.status == 204

        asyncio.run(runner())

    def test_env_var_enables(self, monkeypatch):
        monkeypatch.setenv("VECTORLITE_API_KEY", "envkey")

        async def go(tc):
            resp = await tc.get("/collections")
            assert resp.status == 401
            resp = await tc.get(
                "/collections", headers={"Authorization": "Bearer envkey"}
            )
            assert resp.status == 200

        http(go)

    def test_default_is_open(self):
        # no key set anywhere -> reference behavior (no auth)
        async def go(tc):
            resp = await tc.get("/collections")
            assert resp.status == 200

        http(go)


class TestEfOverride:
    """Per-request HNSW beam width (extension): "ef" in any search
    body. 0 = reference-exact beam (min(k, len),
    reference: src/index/hnsw.rs:437-448); absent = the collection's
    configured ef_search; Flat accepts and ignores it (exact search
    trivially satisfies any recall request)."""

    def _mk(self, tc):
        return tc.post(
            "/collections",
            json={
                "name": "h",
                "index_type": "hnsw",
                "metric": "cosine",
            },
        )

    def test_ef_accepted_on_hnsw_and_flat(self):
        client = make_text_client()

        async def go(tc):
            await self._mk(tc)
            await tc.post(
                "/collections", json={"name": "f", "index_type": "flat"}
            )
            for name in ("h", "f"):
                await tc.post(
                    f"/collections/{name}/texts",
                    json={"texts": [f"doc {i}" for i in range(20)]},
                )
                for ef in (0, 4, 65536):
                    resp = await tc.post(
                        f"/collections/{name}/search/text",
                        json={"query": "doc 3", "k": 3, "ef": ef},
                    )
                    assert resp.status == 200, (name, ef)
                    results = (await resp.json())["results"]
                    assert results and results[0]["text"] == "doc 3"
            # batched + raw-vector routes take it too
            resp = await tc.post(
                "/collections/h/search/texts",
                json={"queries": ["doc 1", "doc 2"], "k": 2, "ef": 8},
            )
            assert resp.status == 200
            assert len((await resp.json())["results"]) == 2

        http(go, client=client)

    def test_ef_validation(self):
        async def go(tc):
            await self._mk(tc)
            for bad in (-1, 65537, True, 1.5, "8", {}):
                resp = await tc.post(
                    "/collections/h/search/text",
                    json={"query": "x", "ef": bad},
                )
                assert resp.status == 400, bad
                assert (await resp.json())["message"] == (
                    "Field ef must be an integer between 0 and 65536"
                )
            # null = absent (serde Option semantics)
            resp = await tc.post(
                "/collections/h/search/text",
                json={"query": "x", "ef": None},
            )
            assert resp.status == 200

        http(go, client=make_text_client())


class TestMinScore:
    """Similarity floor (extension): "min_score" in any search body
    drops hits scoring below it — fewer than k results can return."""

    def test_min_score_filters(self):
        client = make_text_client()

        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post(
                "/collections/c/texts",
                json={"texts": ["alpha", "beta", "gamma"]},
            )
            # self-match scores ~1.0; others score well below
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "alpha", "k": 3, "min_score": 0.999},
            )
            results = (await resp.json())["results"]
            assert [r["text"] for r in results] == ["alpha"]
            # floor above everything -> empty, not an error
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "alpha", "k": 3, "min_score": 1.5},
            )
            assert (await resp.json())["results"] == []
            # negative floors pass everything (cosine can be negative)
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "alpha", "k": 3, "min_score": -10},
            )
            assert len((await resp.json())["results"]) == 3
            # batched route honors it per row
            resp = await tc.post(
                "/collections/c/search/texts",
                json={
                    "queries": ["alpha", "beta"],
                    "k": 3,
                    "min_score": 0.999,
                },
            )
            rows = (await resp.json())["results"]
            assert [[r["text"] for r in row] for row in rows] == [
                ["alpha"],
                ["beta"],
            ]

        http(go, client=client)

    def test_min_score_validation(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            for bad in (True, "0.5", float("nan"), {}, []):
                body = {"query": "x", "min_score": bad}
                # NaN can't ride json.dumps by default; build raw
                import math

                if isinstance(bad, float) and math.isnan(bad):
                    raw = '{"query": "x", "min_score": NaN}'
                    resp = await tc.post(
                        "/collections/c/search/text",
                        data=raw,
                        headers={"content-type": "application/json"},
                    )
                else:
                    resp = await tc.post(
                        "/collections/c/search/text", json=body
                    )
                assert resp.status == 400, bad
                assert (await resp.json())["message"] == (
                    "Field min_score must be a finite number"
                )
            # null = absent
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "x", "min_score": None},
            )
            assert resp.status == 200

        http(go, client=make_text_client())


class TestBulkGetByIds:
    """ids= on the listing route (extension): explicit-id bulk get,
    requested order, missing ids skipped, where/include_values honored."""

    def test_bulk_get(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post(
                "/collections/c/texts",
                json={
                    "texts": [f"t{i}" for i in range(6)],
                    "metadatas": [{"even": i % 2 == 0} for i in range(6)],
                },
            )
            resp = await tc.get("/collections/c/vectors?ids=4,0,99,2")
            assert resp.status == 200
            body = await resp.json()
            # requested order, missing 99 skipped
            assert [v["id"] for v in body["vectors"]] == [4, 0, 2]
            assert body["total"] == 3
            # values included by default on bulk get? include_values
            # governs it, same as listing
            assert body["vectors"][0]["values"] == []
            resp = await tc.get(
                "/collections/c/vectors?ids=4,0,2&include_values=1"
            )
            body = await resp.json()
            assert len(body["vectors"][0]["values"]) == 3
            # where post-filters
            import urllib.parse

            w = urllib.parse.quote('{"even": true}')
            resp = await tc.get(
                f"/collections/c/vectors?ids=4,3,2,1&where={w}"
            )
            body = await resp.json()
            assert [v["id"] for v in body["vectors"]] == [4, 2]

        http(go)

    def test_bulk_get_validation(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            for bad in ("", "1,-2", "1,x", "1, 2", "1_0", "2**70",
                        str(1 << 64)):
                resp = await tc.get(f"/collections/c/vectors?ids={bad}")
                assert resp.status == 400, bad
                assert "comma-separated" in (await resp.json())["message"]
            resp = await tc.get(
                "/collections/c/vectors?ids=" + ",".join(["1"] * 1001)
            )
            assert resp.status == 400
            resp = await tc.get("/collections/missing/vectors?ids=1")
            assert resp.status == 404

        http(go)
