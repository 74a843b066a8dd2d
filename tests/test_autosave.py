"""Autosave daemon tests (extension; SURVEY §5 checkpoint/resume).

The reference has no autosave — persistence is manual
(reference: src/server.rs:300-359). These tests cover the crash-resume
subsystem: dirty tracking via the mutation counter, atomic snapshot
files, stale-snapshot pruning, startup restore, and the live thread.
"""

import time

import pytest

from vectorlite_tpu import (
    IndexType,
    MockEmbeddingFunction,
    SimilarityMetric,
    VectorLiteClient,
)
from vectorlite_tpu.store.autosave import (
    AutosaveDaemon,
    restore_into,
    snapshot_path,
)


@pytest.fixture
def client():
    return VectorLiteClient(MockEmbeddingFunction(dimension=8))


def make_daemon(client, tmp_path, **kw):
    # not started: flush() is driven explicitly for determinism
    return AutosaveDaemon(client, tmp_path, **kw)


class TestFlush:
    def test_first_flush_saves_even_empty_collection(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        d = make_daemon(client, tmp_path)
        assert d.flush() == ["a"]
        assert snapshot_path(tmp_path, "a").exists()

    def test_clean_collection_skipped(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        client.add_text_to_collection("a", "hello")
        d = make_daemon(client, tmp_path)
        assert d.flush() == ["a"]
        assert d.flush() == []  # no mutation since last snapshot
        assert d.stats()["saves"] == 1

    def test_mutation_marks_dirty(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        d = make_daemon(client, tmp_path)
        d.flush()
        client.add_text_to_collection("a", "hello")
        assert d.flush() == ["a"]
        vid = client.add_texts_to_collection("a", ["x", "y"])[0]
        assert d.flush() == ["a"]
        client.delete_from_collection("a", vid)
        assert d.flush() == ["a"]

    def test_missing_file_resaved_despite_clean_counter(
        self, client, tmp_path
    ):
        client.create_collection("a", IndexType.FLAT)
        d = make_daemon(client, tmp_path)
        d.flush()
        snapshot_path(tmp_path, "a").unlink()
        assert d.flush() == ["a"]

    def test_snapshot_loadable_and_search_identical(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        client.add_texts_to_collection("a", ["alpha", "beta", "gamma"])
        want = client.search_text_in_collection("a", "alpha", 2)
        make_daemon(client, tmp_path).flush()

        fresh = VectorLiteClient(MockEmbeddingFunction(dimension=8))
        assert restore_into(fresh, tmp_path) == ["a"]
        got = fresh.search_text_in_collection("a", "alpha", 2)
        assert [(r.id, r.score, r.text) for r in got] == [
            (r.id, r.score, r.text) for r in want
        ]

    def test_hnsw_collection_autosaves(self, client, tmp_path):
        client.create_collection(
            "h", IndexType.HNSW, SimilarityMetric.COSINE
        )
        client.add_texts_to_collection("h", ["one", "two"])
        make_daemon(client, tmp_path).flush()
        fresh = VectorLiteClient(MockEmbeddingFunction(dimension=8))
        assert restore_into(fresh, tmp_path) == ["h"]
        assert fresh.get_collection_info("h").count == 2


class TestPrune:
    def test_deleted_collection_snapshot_pruned(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        client.create_collection("b", IndexType.FLAT)
        d = make_daemon(client, tmp_path)
        d.flush()
        client.delete_collection("a")
        d.flush()
        assert not snapshot_path(tmp_path, "a").exists()
        assert snapshot_path(tmp_path, "b").exists()
        assert d.stats()["pruned"] == 1

    def test_foreign_files_left_alone(self, client, tmp_path):
        # a manually-saved .vlc whose stem isn't our percent-encoding
        foreign = tmp_path / "My Backup.vlc"
        foreign.write_text("{}")
        other = tmp_path / "notes.txt"
        other.write_text("keep")
        make_daemon(client, tmp_path).flush()
        assert foreign.exists()
        assert other.exists()

    def test_prune_disabled(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        d = make_daemon(client, tmp_path, prune=False)
        d.flush()
        client.delete_collection("a")
        d.flush()
        assert snapshot_path(tmp_path, "a").exists()


class TestRestore:
    def test_restore_missing_dir_is_noop(self, client, tmp_path):
        assert restore_into(client, tmp_path / "nope") == []

    def test_corrupt_snapshot_skipped(self, client, tmp_path):
        client.create_collection("good", IndexType.FLAT)
        make_daemon(client, tmp_path).flush()
        (tmp_path / "bad.vlc").write_text("{not json")
        fresh = VectorLiteClient(MockEmbeddingFunction(dimension=8))
        assert restore_into(fresh, tmp_path) == ["good"]

    def test_existing_collection_wins_over_snapshot(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        client.add_text_to_collection("a", "snapshot copy")
        make_daemon(client, tmp_path).flush()
        fresh = VectorLiteClient(MockEmbeddingFunction(dimension=8))
        fresh.create_collection("a", IndexType.FLAT)  # e.g. --filepath load
        assert restore_into(fresh, tmp_path) == []
        assert fresh.get_collection_info("a").count == 0

    def test_weird_collection_names_round_trip(self, client, tmp_path):
        name = "reports/2026 α%β"
        client.create_collection(name, IndexType.FLAT)
        client.add_text_to_collection(name, "data")
        d = make_daemon(client, tmp_path)
        assert d.flush() == [name]
        p = snapshot_path(tmp_path, name)
        assert p.parent == tmp_path  # slash did not escape the dir
        fresh = VectorLiteClient(MockEmbeddingFunction(dimension=8))
        assert restore_into(fresh, tmp_path) == [name]
        # prune recognizes its own encoding for the weird name too
        client.delete_collection(name)
        d.flush()
        assert not p.exists()


class TestDaemonThread:
    def test_live_tick_and_stop_flush(self, client, tmp_path):
        client.create_collection("a", IndexType.FLAT)
        d = AutosaveDaemon(client, tmp_path, interval_s=0.05).start()
        try:
            deadline = time.time() + 5.0
            while not snapshot_path(tmp_path, "a").exists():
                assert time.time() < deadline, "autosave tick never fired"
                time.sleep(0.01)
            # a mutation landing right before stop() is captured by the
            # shutdown flush even if no tick runs
            client.add_text_to_collection("a", "last write")
        finally:
            d.stop(flush=True)
        fresh = VectorLiteClient(MockEmbeddingFunction(dimension=8))
        restore_into(fresh, tmp_path)
        assert fresh.get_collection_info("a").count == 1

    def test_bad_interval_rejected(self, client, tmp_path):
        with pytest.raises(ValueError):
            AutosaveDaemon(client, tmp_path, interval_s=0)


class TestServerIntegration:
    def test_stats_exposes_autosave(self, client, tmp_path):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from vectorlite_tpu.api.server import create_app

        d = AutosaveDaemon(client, tmp_path, interval_s=60.0).start()
        app = create_app(client, autosave=d)

        async def run():
            async with TestClient(TestServer(app)) as tc:
                resp = await tc.get("/stats")
                return await resp.json()

        body = asyncio.run(run())
        assert body["autosave"]["directory"] == str(tmp_path)
        assert body["autosave"]["interval_s"] == 60.0
        # on_cleanup ran d.stop(flush=True): thread is gone
        assert d._thread is None
