"""The full HTTP surface against a mesh-sharded client (VECTORLITE_MESH=8).

Re-runs every route suite from test_server.py with Flat collections
row-sharded over the 8 virtual CPU devices, then checks sharded-vs-single
result equality through the HTTP layer. The reference has no distributed
analogue (SURVEY §2); this validates the TPU-native scale-out end to end.
"""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

import test_server
from vectorlite_tpu import VectorLiteClient
from vectorlite_tpu.api.server import create_app
from vectorlite_tpu.config import VectorLiteConfig
from vectorlite_tpu.embed.mock import (
    ConstantEmbeddingFunction,
    MockEmbeddingFunction,
)


def make_mesh_client(embedder=None):
    cfg = VectorLiteConfig.profile("default")
    cfg.mesh_devices = 8
    return VectorLiteClient(
        embedder or ConstantEmbeddingFunction([1.0, 2.0, 3.0]), config=cfg
    )


@pytest.fixture(autouse=True)
def _route_suite_through_mesh(monkeypatch):
    monkeypatch.setattr(test_server, "make_client", make_mesh_client)
    monkeypatch.setattr(
        test_server,
        "make_text_client",
        lambda dim=16: make_mesh_client(MockEmbeddingFunction(dim)),
    )


# Inherit the entire single-chip suite; the autouse fixture swaps the
# client factory so every request exercises the sharded serving path.
class TestHealthAndCollectionsMesh(test_server.TestHealthAndCollections):
    pass


class TestVectorOpsMesh(test_server.TestVectorOps):
    pass


class TestPersistenceApiMesh(test_server.TestPersistenceApi):
    pass


class TestBatchedEndpointsMesh(test_server.TestBatchedEndpoints):
    pass


class TestRawVectorEndpointsMesh(test_server.TestRawVectorEndpoints):
    pass


def test_mesh_env_var_wires_through(monkeypatch):
    monkeypatch.setenv("VECTORLITE_MESH", "8")
    cfg = VectorLiteConfig.from_env()
    assert cfg.mesh_devices == 8
    client = VectorLiteClient(
        ConstantEmbeddingFunction([1.0, 0.0, 0.0]), config=cfg
    )
    assert "mesh" in client.flat_index_kwargs()


def test_sharded_matches_single_through_http():
    """Same corpus, same queries: byte-identical ranked results whether the
    collection is served from one device or sharded over eight."""

    texts = [f"document number {i} about topic {i % 13}" for i in range(97)]
    queries = ["topic 4 document", "number 55", "unrelated query text"]

    def run(client):
        async def go():
            app = create_app(client)
            async with TestClient(TestServer(app)) as tc:
                r = await tc.post(
                    "/collections",
                    json={"name": "c", "index_type": "flat"},
                )
                assert r.status == 200
                r = await tc.post(
                    "/collections/c/texts", json={"texts": texts}
                )
                assert r.status == 200
                out = []
                for q in queries:
                    r = await tc.post(
                        "/collections/c/search/text",
                        json={"query": q, "k": 7},
                    )
                    assert r.status == 200
                    out.append((await r.json())["results"])
                return out

        return asyncio.run(go())

    embedder = MockEmbeddingFunction(dimension=24)
    single = run(VectorLiteClient(embedder))
    sharded = run(make_mesh_client(embedder))
    assert len(single) == len(sharded) == len(queries)
    for s_row, m_row in zip(single, sharded):
        assert [h["id"] for h in s_row] == [h["id"] for h in m_row]
        for s_hit, m_hit in zip(s_row, m_row):
            assert abs(s_hit["score"] - m_hit["score"]) < 1e-6


def test_filtered_routes_on_mesh():
    """Round-3 extensions (where filters, PATCH metadata, paged listing)
    served from a mesh-sharded collection behave identically to the
    single-chip suite's expectations."""

    def go():
        async def run():
            app = create_app(make_mesh_client(MockEmbeddingFunction(24)))
            async with TestClient(TestServer(app)) as tc:
                await tc.post(
                    "/collections", json={"name": "c", "index_type": "flat"}
                )
                await tc.post(
                    "/collections/c/texts",
                    json={
                        "texts": [f"doc {i}" for i in range(12)],
                        "metadatas": [{"p": i % 3} for i in range(12)],
                    },
                )
                r = await tc.post(
                    "/collections/c/search/text",
                    json={"query": "doc 4", "k": 12, "where": {"p": 1}},
                )
                hits = (await r.json())["results"]
                assert r.status == 200
                assert {h["id"] for h in hits} == {1, 4, 7, 10}
                r = await tc.patch(
                    "/collections/c/vectors/1", json={"metadata": {"p": 9}}
                )
                assert r.status == 200
                r = await tc.post(
                    "/collections/c/search/text",
                    json={"query": "doc 4", "k": 12, "where": {"p": 1}},
                )
                assert {
                    h["id"] for h in (await r.json())["results"]
                } == {4, 7, 10}
                r = await tc.get(
                    '/collections/c/vectors?where={"p":9}'
                )
                body = await r.json()
                assert body["total"] == 1
                assert body["vectors"][0]["id"] == 1
                # PUT replacement re-embeds on the mesh collection
                r = await tc.put(
                    "/collections/c/vectors/2",
                    json={"text": "doc replaced", "metadata": {"p": 7}},
                )
                assert r.status == 200
                r = await tc.post(
                    "/collections/c/search/text",
                    json={"query": "doc replaced", "k": 1},
                )
                hit = (await r.json())["results"][0]
                assert hit["id"] == 2 and hit["metadata"] == {"p": 7}
                # bulk delete-by-filter updates the sharded validity mask
                r = await tc.delete(
                    '/collections/c/vectors?where={"p":{"$in":[0,2]}}'
                )
                assert r.status == 200
                assert (await r.json())["deleted"] == 7
                r = await tc.post(
                    "/collections/c/search/text",
                    json={"query": "doc 4", "k": 12},
                )
                ids = {h["id"] for h in (await r.json())["results"]}
                assert ids == {1, 2, 4, 7, 10}

        asyncio.run(run())

    go()


def test_pq_profile_on_mesh_through_http(monkeypatch):
    """The product-quantization serving rung on a mesh-sharded
    collection, driven through HTTP: ingest past the PQ gate, search
    (per-shard streaming ADC + all-gather merge + exact rescore),
    delete, search again. Locks the surface the sharded-PQ path serves
    (dist/sharding.py sharded_search_pq)."""
    monkeypatch.setenv("VECTORLITE_PQ_MIN_ROWS", "1024")  # floor
    monkeypatch.setenv("VECTORLITE_PQ_TRAIN_SAMPLE", "512")
    monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")
    cfg = VectorLiteConfig.profile("pq")
    cfg.mesh_devices = 8
    client = VectorLiteClient(MockEmbeddingFunction(24), config=cfg)

    async def run():
        app = create_app(client)
        async with TestClient(TestServer(app)) as tc:
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            r = await tc.post(
                "/collections/c/texts",
                json={"texts": [f"doc number {i}" for i in range(1200)]},
            )
            assert r.status == 200
            r = await tc.post(
                "/collections/c/search/text",
                json={"query": "doc number 123", "k": 1},
            )
            hit = (await r.json())["results"][0]
            assert hit["id"] == 123 and hit["score"] > 0.999
            # confirm the PQ cache (not the f32 fallback) served that
            idx = client.get_collection("c")._index
            assert idx._pq and idx._pq_active and idx._mesh is not None
            r = await tc.delete("/collections/c/vectors/123")
            assert r.status == 200
            r = await tc.post(
                "/collections/c/search/text",
                json={"query": "doc number 123", "k": 1},
            )
            assert (await r.json())["results"][0]["id"] != 123

    asyncio.run(run())
