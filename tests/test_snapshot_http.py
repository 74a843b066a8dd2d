"""Snapshot-over-HTTP extension routes: GET/POST
/collections/{name}/snapshot — streaming .vlc download + restore
upload (the HTTP twin of the reference's file-path save/load,
reference: src/server.rs:329-359)."""

import asyncio
import io
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vectorlite_tpu import VectorLiteClient
from vectorlite_tpu.api.server import create_app
from vectorlite_tpu.embed.mock import MockEmbeddingFunction
from vectorlite_tpu.persist.vlc import load_collection_from_bytes


def make_client(dim=8):
    return VectorLiteClient(MockEmbeddingFunction(dim))


def http(coro_fn, client=None):
    async def runner():
        app = create_app(client or make_client())
        async with TestClient(TestServer(app)) as tc:
            return await coro_fn(tc)

    return asyncio.run(runner())


def _fill(tc):
    async def go():
        await tc.post(
            "/collections", json={"name": "snap", "index_type": "flat"}
        )
        await tc.post(
            "/collections/snap/texts",
            json={
                "texts": [f"doc {i}" for i in range(20)],
                "metadatas": [{"i": i} for i in range(20)],
            },
        )

    return go()


class TestSnapshotDownload:
    def test_download_parses_as_vlc(self):
        async def go(tc):
            await _fill(tc)
            resp = await tc.get("/collections/snap/snapshot")
            assert resp.status == 200
            cd = resp.headers["Content-Disposition"]
            assert "snap.vlc" in cd
            raw = await resp.read()
            loaded = load_collection_from_bytes(raw)
            assert loaded.name == "snap"
            assert loaded.get_info().count == 20
            doc = json.loads(raw.decode("utf-8"))
            assert doc["header"]["format"] == "vectorlite-collection"
            assert doc["metadata"]["vector_count"] == 20

        http(go)

    def test_download_matches_file_save(self, tmp_path):
        """The streamed bytes equal save_to_file's output modulo the
        created_at timestamps (same emitter, same payload)."""

        async def go(tc):
            await _fill(tc)
            resp = await tc.get("/collections/snap/snapshot")
            raw = (await resp.read()).decode("utf-8")
            await tc.post(
                "/collections/snap/save",
                json={"file_path": str(tmp_path / "snap.vlc")},
            )
            disk = (tmp_path / "snap.vlc").read_text()

            def strip_ts(s):
                return [
                    line
                    for line in s.splitlines()
                    if '"created_at"' not in line
                ]

            assert strip_ts(raw) == strip_ts(disk)

        http(go)

    def test_download_missing_404(self):
        async def go(tc):
            resp = await tc.get("/collections/nope/snapshot")
            assert resp.status == 404
            assert "not found" in (await resp.json())["message"]

        http(go)


class TestSnapshotRestore:
    def test_roundtrip(self):
        async def go(tc):
            await _fill(tc)
            raw = await (await tc.get("/collections/snap/snapshot")).read()
            resp = await tc.post(
                "/collections/snap2/snapshot", data=raw
            )
            assert resp.status == 200
            body = await resp.json()
            assert body == {"collection_name": "snap2", "vector_count": 20}
            # restored collection serves searches + vector reads
            resp = await tc.post(
                "/collections/snap2/search/text",
                json={"query": "doc 3", "k": 3},
            )
            assert resp.status == 200
            results = (await resp.json())["results"]
            assert results[0]["text"] == "doc 3"
            resp = await tc.get("/collections/snap2/vectors/0")
            assert resp.status == 200
            assert (await resp.json())["vector"]["metadata"] == {"i": 0}

        http(go)

    def test_restore_conflict_409(self):
        async def go(tc):
            await _fill(tc)
            raw = await (await tc.get("/collections/snap/snapshot")).read()
            resp = await tc.post("/collections/snap/snapshot", data=raw)
            assert resp.status == 409

        http(go)

    def test_restore_garbage_rejected(self):
        async def go(tc):
            resp = await tc.post(
                "/collections/bad/snapshot", data=b"{not json"
            )
            assert resp.status == 500
            assert "Serialization error" in (await resp.json())["message"]
            # nothing was created
            resp = await tc.get("/collections/bad")
            assert resp.status == 404

        http(go)

    def test_restore_url_name_wins(self):
        """Restore-as: the URL name overrides the document's embedded
        metadata name."""

        async def go(tc):
            await _fill(tc)
            raw = await (await tc.get("/collections/snap/snapshot")).read()
            await tc.post("/collections/other/snapshot", data=raw)
            resp = await tc.get("/collections/other")
            assert resp.status == 200
            assert (await resp.json())["info"]["name"] == "other"

        http(go)


class TestSnapshotLimits:
    def _render_vlc(self, n_docs=60):
        """A .vlc document rendered locally (no HTTP fill, so the tiny
        body caps below never apply to the setup traffic)."""
        from vectorlite_tpu.persist.vlc import collection_to_json, dumps_pretty

        vc = make_client()
        vc.create_collection("big", "flat")
        vc.add_texts_to_collection(
            "big", [f"document number {i}" for i in range(n_docs)]
        )
        return dumps_pretty(
            collection_to_json(vc.get_collection("big"))
        ).encode("utf-8")

    def test_restore_streams_past_general_body_cap(self, monkeypatch):
        """The restore route streams to disk, so --max-body-mb (sized
        for JSON DTOs) does not bounce multi-MB snapshots: a body far
        over the general cap still restores."""
        raw = self._render_vlc()
        monkeypatch.setenv("VECTORLITE_MAX_BODY_MB", "0.002")  # ~2 KB
        assert len(raw) > 4096

        async def go(tc):
            resp = await tc.post("/collections/big/snapshot", data=raw)
            assert resp.status == 200
            assert (await resp.json())["vector_count"] == 60
            # the general cap still applies to ordinary JSON routes
            resp = await tc.post(
                "/collections/big/texts",
                json={"texts": ["x" * 8192]},
            )
            assert resp.status == 413

        http(go)

    def test_restore_snapshot_cap_413(self, monkeypatch):
        raw = self._render_vlc()
        monkeypatch.setenv(
            "VECTORLITE_MAX_SNAPSHOT_MB", str(1 / 1024)
        )  # 1 KiB
        assert len(raw) > 1024

        async def go(tc):
            resp = await tc.post("/collections/big/snapshot", data=raw)
            assert resp.status == 413
            assert "VECTORLITE_MAX_SNAPSHOT_MB" in (
                await resp.json()
            )["message"]
            # nothing was created
            assert (await tc.get("/collections/big")).status == 404

        http(go)


# RemoteClient.download_snapshot / restore_snapshot are covered in
# tests/test_remote.py (TestRemoteSnapshot) on the shared socket-server
# fixture — urllib needs a real socket, which the in-process TestClient
# here does not provide.
