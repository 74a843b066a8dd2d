"""Write-ahead oplog (store/wal.py): durability of acknowledged writes
between snapshots (extension; the reference persists only on explicit
save, reference: src/server.rs:300-320)."""

import json

import numpy as np
import pytest

from vectorlite_tpu import IndexType, SimilarityMetric, VectorLiteClient
from vectorlite_tpu.embed.mock import MockEmbeddingFunction
from vectorlite_tpu.store import wal as wal_mod
from vectorlite_tpu.store.autosave import AutosaveDaemon, restore_into
from vectorlite_tpu.store.wal import (
    CollectionWAL,
    WalManager,
    read_entries,
    recover_into,
    wal_path,
)

DIM = 8


def make_client():
    return VectorLiteClient(MockEmbeddingFunction(DIM))


def wal_client(tmp_path, sub="wal"):
    client = make_client()
    manager = WalManager(tmp_path / sub)
    client.set_collection_observer(manager)
    return client, manager


def state(client, name):
    """Comparable logical state: sorted (id, text, metadata, values)."""
    col = client.get_collection(name)
    vectors = col.get_vectors(
        [v.id for v in col.list_vectors(0, 10_000)[0]]
    )
    return sorted(
        (v.id, v.text, json.dumps(v.metadata, sort_keys=True),
         tuple(np.round(np.asarray(v.values, dtype=np.float64), 9)))
        for v in vectors
    )


class TestCollectionWAL:
    def test_append_seq_and_resume(self, tmp_path):
        p = tmp_path / "c.wal"
        w = CollectionWAL(p)
        assert w.seq() == 0
        assert w.append({"op": "del", "id": 1}) == 1
        assert w.append({"op": "del", "id": 2}) == 2
        w.close()
        # a fresh handle resumes after the highest intact seq
        w2 = CollectionWAL(p)
        assert w2.seq() == 2
        assert w2.append({"op": "del", "id": 3}) == 3
        entries = read_entries(p)
        assert [e["s"] for e in entries] == [1, 2, 3]
        assert all(e["op"] == "del" for e in entries)

    def test_checkpoint_drops_covered_prefix(self, tmp_path):
        w = CollectionWAL(tmp_path / "c.wal")
        for i in range(5):
            w.append({"op": "del", "id": i})
        w.checkpoint(3)
        entries = read_entries(tmp_path / "c.wal")
        assert [e["s"] for e in entries] == [4, 5]
        # appends continue above the old sequence
        assert w.append({"op": "del", "id": 9}) == 6
        w.checkpoint(None)  # no-op
        assert [e["s"] for e in read_entries(tmp_path / "c.wal")] == [4, 5, 6]

    def test_torn_tail_stops_scan(self, tmp_path):
        p = tmp_path / "c.wal"
        w = CollectionWAL(p)
        w.append({"op": "del", "id": 1})
        w.append({"op": "del", "id": 2})
        w.close()
        with open(p, "a", encoding="utf-8") as f:
            f.write('{"s":3,"op":"del","i')  # crash mid-append
        assert [e["s"] for e in read_entries(p)] == [1, 2]
        # resumed seq counts only intact entries
        assert CollectionWAL(p).seq() == 2

    def test_resume_truncates_torn_tail_before_appending(self, tmp_path):
        """Appending onto a torn tail would weld two records into one
        garbage line and silently drop every later write at the next
        recovery — resume must truncate the partial line first."""
        p = tmp_path / "c.wal"
        w = CollectionWAL(p)
        w.append({"op": "del", "id": 1})
        w.close()
        with open(p, "a", encoding="utf-8") as f:
            f.write('{"s":2,"op":"del","i')  # crash mid-append
        w2 = CollectionWAL(p)
        assert w2.append({"op": "del", "id": 7}) == 2
        assert [(e["s"], e["id"]) for e in read_entries(p)] == [
            (1, 1), (2, 7),
        ]

    def test_render_rejects_unserializable(self, tmp_path):
        w = CollectionWAL(tmp_path / "c.wal")
        with pytest.raises((TypeError, ValueError)):
            w.render({"op": "delw", "where": {"$in": {1, 2}}})  # a set
        with pytest.raises(ValueError):
            w.render({"op": "add", "rows": [[1, [float("nan")], "", None]]})
        assert w.seq() == 0 and read_entries(w._path) == []


class TestCollectionHooks:
    def test_every_mutation_is_logged(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        p = wal_path(manager.directory, "c")
        client.add_text_to_collection("c", "one", {"k": 1})
        client.add_texts_to_collection("c", ["two", "three"])
        client.add_vectors_to_collection(
            "c", np.ones((1, DIM)), ids=[100]
        )
        client.update_metadata_in_collection("c", 0, {"k": 2})
        client.update_text_in_collection("c", 1, "two rewritten")
        client.delete_from_collection("c", 2)
        client.delete_where_in_collection("c", {"k": {"$eq": 2}})
        ops = [e["op"] for e in read_entries(p)]
        assert ops == [
            "create", "add", "add", "add", "meta", "put", "del", "delw",
        ]
        create = read_entries(p)[0]
        assert create["index_type"] == "Flat" and create["dim"] == DIM

    def test_failed_mutation_logs_nothing(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        p = wal_path(manager.directory, "c")
        client.add_vectors_to_collection("c", np.ones((1, DIM)), ids=[7])
        with pytest.raises(Exception):
            client.add_vectors_to_collection(
                "c", np.ones((1, DIM)), ids=[7]  # duplicate id
            )
        with pytest.raises(Exception):
            client.update_text_in_collection("c", 999, "missing")
        # no-match delete_where applies nothing and logs nothing
        assert client.delete_where_in_collection("c", {"x": {"$eq": 1}}) == 0
        assert [e["op"] for e in read_entries(p)] == ["create", "add"]

    def test_unserializable_where_rejected_before_apply(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_text_to_collection("c", "keep me", {"k": 1})
        with pytest.raises((TypeError, ValueError)):
            client.delete_where_in_collection("c", {"k": {"$in": {1, 2}}})
        assert client.get_collection_info("c").count == 1

    def test_delete_collection_removes_log(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        p = wal_path(manager.directory, "c")
        assert p.exists()
        client.delete_collection("c")
        assert not p.exists()

    def test_wal_append_failure_still_marks_dirty(self, tmp_path):
        """A failed log append surfaces to the caller, but the applied
        mutation must still bump the dirty counter so autosave
        re-snapshots the divergent state."""
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        col = client.get_collection("c")
        before = col.mutation_count()

        def boom(*a, **k):
            raise OSError("disk full")

        col._wal.append = boom
        with pytest.raises(OSError):
            client.add_text_to_collection("c", "applied but unlogged")
        assert col.mutation_count() == before + 1
        assert client.get_collection_info("c").count == 1


class TestRecovery:
    def _churn(self, client, name):
        client.add_texts_to_collection(
            name, [f"doc {i}" for i in range(6)],
            metadatas=[{"i": i} for i in range(6)],
        )
        client.update_text_in_collection(name, 2, "doc two rewritten")
        client.update_metadata_in_collection(name, 3, {"i": 30})
        client.delete_from_collection(name, 4)
        client.delete_where_in_collection(name, {"i": {"$eq": 5}})

    def test_wal_only_recovery_flat(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        self._churn(client, "c")
        want = state(client, "c")
        manager.close()
        # fresh process, no snapshot at all: create header + full replay
        client2 = make_client()
        recovered = recover_into(client2, manager.directory)
        assert recovered["c"] > 0
        assert state(client2, "c") == want
        # id counter recovered past the replayed ids
        nid = client2.add_text_to_collection("c", "post-recovery")
        assert nid == 6

    def test_wal_only_recovery_hnsw(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("h", IndexType.HNSW, SimilarityMetric.COSINE)
        self._churn(client, "h")
        want = state(client, "h")
        manager.close()
        client2 = make_client()
        recover_into(client2, manager.directory)
        assert state(client2, "h") == want
        col = client2.get_collection("h")
        assert col._index.index_type == "HNSW"
        assert col._index.metric() is SimilarityMetric.COSINE
        # recovered graph serves searches
        hits = client2.search_text_in_collection(
            "h", "doc 0", 3, SimilarityMetric.COSINE
        )
        assert hits and hits[0].text == "doc 0"

    def test_snapshot_plus_tail_replay_is_idempotent(self, tmp_path):
        snap_dir = tmp_path / "snaps"
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        daemon = AutosaveDaemon(client, snap_dir, interval_s=9999)
        client.add_texts_to_collection("c", ["a", "b", "c"])
        daemon.flush()  # snapshot + checkpoint
        p = wal_path(manager.directory, "c")
        assert read_entries(p) == []  # fully covered by the snapshot
        # post-snapshot tail
        client.add_text_to_collection("c", "d")
        client.delete_from_collection("c", 0)
        want = state(client, "c")
        manager.close()
        # crash-resume: snapshot rewinds, WAL replays forward
        client2 = make_client()
        restore_into(client2, snap_dir)
        assert client2.get_collection_info("c").count == 3  # rewound
        recover_into(client2, manager.directory)
        assert state(client2, "c") == want

    def test_conservative_checkpoint_overlap_is_safe(self, tmp_path):
        """Entries the snapshot already covers replay as no-ops (the
        add-skip / del-missing idempotency contract)."""
        snap_dir = tmp_path / "snaps"
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_texts_to_collection("c", ["a", "b"])
        client.delete_from_collection("c", 1)
        client.get_collection("c").save_to_file(snap_dir / "c.vlc")
        want = state(client, "c")
        manager.close()
        # NO checkpoint: the full log overlaps the snapshot entirely
        client2 = make_client()
        restore_into(client2, snap_dir)
        recover_into(client2, manager.directory)
        assert state(client2, "c") == want
        # and replaying a second time changes nothing either
        recover_into(client2, manager.directory)
        assert state(client2, "c") == want

    def test_recovery_resnapshots_and_rotates(self, tmp_path):
        snap_dir = tmp_path / "snaps"
        snap_dir.mkdir()
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_texts_to_collection("c", ["a", "b"])
        want = state(client, "c")
        manager.close()
        p = wal_path(manager.directory, "c")
        assert len(read_entries(p)) == 2  # create + add
        client2 = make_client()
        recover_into(client2, manager.directory, snapshot_dir=snap_dir)
        assert state(client2, "c") == want
        # re-snapshotted into the recovery dir + log rotated
        assert (snap_dir / "c.vlc").exists()
        assert read_entries(p) == []
        # a third crash right away still recovers to the same state
        client3 = make_client()
        restore_into(client3, snap_dir)
        recover_into(client3, manager.directory, snapshot_dir=snap_dir)
        assert state(client3, "c") == want

    def test_torn_tail_recovers_prefix(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_text_to_collection("c", "intact")
        manager.close()
        p = wal_path(manager.directory, "c")
        with open(p, "a", encoding="utf-8") as f:
            f.write('{"s":99,"op":"add","rows":[[5,[0.1')  # torn append
        client2 = make_client()
        recover_into(client2, manager.directory)
        assert [v.id for v in client2.get_collection("c")
                .list_vectors(0, 100)[0]] == [0]

    def test_hybrid_sidecar_rebuilds_after_replay(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_texts_to_collection("c", ["alpha beta", "gamma delta"])
        manager.close()
        client2 = make_client()
        recover_into(client2, manager.directory)
        hits = client2.search_hybrid_in_collection("c", "gamma", 2, alpha=0.0)
        assert hits and hits[0].id == 1


class TestRegistrationBase:
    def _loaded_collection(self, tmp_path):
        """A data-bearing collection arriving via add_collection (the
        /collections/load → snapshot-restore → --filepath pattern)."""
        src = make_client()
        src.create_collection("c", IndexType.FLAT)
        src.add_texts_to_collection("c", ["a", "b", "c"])
        path = tmp_path / "c.vlc"
        src.get_collection("c").save_to_file(path)
        from vectorlite_tpu.persist.vlc import load_collection_from_file

        return load_collection_from_file(path)

    def test_data_bearing_registration_without_snapshot_dir(self, tmp_path):
        """No autosave dir: the registration contents are logged as add
        ops, so WAL-only recovery does not produce an empty collection."""
        client, manager = wal_client(tmp_path)
        client.add_collection(self._loaded_collection(tmp_path))
        client.add_text_to_collection("c", "post-load write")
        want = state(client, "c")
        manager.close()
        client2 = make_client()
        recover_into(client2, manager.directory)
        assert state(client2, "c") == want
        assert client2.get_collection_info("c").count == 4

    def test_data_bearing_registration_with_snapshot_dir(self, tmp_path):
        """With an autosave dir the manager snapshots the arriving data
        immediately instead of logging it."""
        snap_dir = tmp_path / "snaps"
        client = make_client()
        manager = WalManager(tmp_path / "wal", snapshot_dir=snap_dir)
        client.set_collection_observer(manager)
        client.add_collection(self._loaded_collection(tmp_path))
        assert (snap_dir / "c.vlc").exists()
        # log holds only the header; the snapshot is the base
        p = wal_path(manager.directory, "c")
        assert [e["op"] for e in read_entries(p)] == ["create"]
        client.add_text_to_collection("c", "post-load write")
        want = state(client, "c")
        manager.close()
        client2 = make_client()
        restore_into(client2, snap_dir)
        recover_into(client2, manager.directory, snapshot_dir=snap_dir)
        assert state(client2, "c") == want


class TestDropTombstone:
    def test_delete_prunes_snapshot_immediately(self, tmp_path):
        snap_dir = tmp_path / "snaps"
        client = make_client()
        manager = WalManager(tmp_path / "wal", snapshot_dir=snap_dir)
        client.set_collection_observer(manager)
        client.create_collection("c", IndexType.FLAT)
        client.add_text_to_collection("c", "x")
        AutosaveDaemon(client, snap_dir, interval_s=9999).flush()
        assert (snap_dir / "c.vlc").exists()
        client.delete_collection("c")
        # both the log and the covering snapshot are gone at ack time
        assert not (snap_dir / "c.vlc").exists()
        assert not wal_path(manager.directory, "c").exists()

    def test_crash_before_unlink_does_not_resurrect(self, tmp_path):
        """Simulated crash state: drop tombstone appended but the file
        unlinks never happened (stale snapshot + log both on disk)."""
        snap_dir = tmp_path / "snaps"
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_text_to_collection("c", "doomed")
        snap_dir.mkdir()
        client.get_collection("c").save_to_file(snap_dir / "c.vlc")
        col_wal = client.get_collection("c")._wal
        col_wal.append({"op": "drop"})
        manager.close()
        client2 = make_client()
        restore_into(client2, snap_dir)
        assert client2.has_collection("c")  # stale snapshot restored it
        recovered = recover_into(
            client2, manager.directory, snapshot_dir=snap_dir
        )
        assert recovered["c"] == 0
        assert not client2.has_collection("c")
        assert not (snap_dir / "c.vlc").exists()
        assert not wal_path(manager.directory, "c").exists()

    def test_recreation_after_drop_replays_only_new_lineage(self, tmp_path):
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_text_to_collection("c", "old lineage")
        col_wal = client.get_collection("c")._wal
        col_wal.append({"op": "drop"})  # crash-before-unlink delete
        # recreate under the same name: same (resumed) log file
        col_wal.append(
            {"op": "create", "index_type": "Flat", "dim": DIM,
             "metric": None}
        )
        col_wal.append(
            {"op": "add", "rows": [[0, [0.5] * DIM, "new lineage", None]]}
        )
        manager.close()
        client2 = make_client()
        recover_into(client2, manager.directory)
        vectors, total = client2.get_collection("c").list_vectors(0, 10)
        assert total == 1 and vectors[0].text == "new lineage"


class TestWalConcurrency:
    def test_hammer_with_concurrent_checkpoints(self, tmp_path):
        """Writers race the autosave checkpointer; whatever the final
        acknowledged state is, snapshot+log recovery must reproduce it
        exactly (the log rotates mid-traffic several times)."""
        import threading

        snap_dir = tmp_path / "snaps"
        client = make_client()
        manager = WalManager(tmp_path / "wal", snapshot_dir=snap_dir)
        client.set_collection_observer(manager)
        client.create_collection("h", IndexType.FLAT)
        daemon = AutosaveDaemon(client, snap_dir, interval_s=9999)
        stop = threading.Event()
        errors: list = []

        def writer(tid):
            try:
                for i in range(40):
                    vid = client.add_text_to_collection(
                        "h", f"w{tid} doc {i}", {"t": tid}
                    )
                    if i % 7 == 3:
                        client.delete_from_collection("h", vid)
                    elif i % 11 == 5:
                        client.update_metadata_in_collection(
                            "h", vid, {"t": tid, "u": i}
                        )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        def checkpointer():
            while not stop.is_set():
                try:
                    daemon.flush()
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

        threads = [
            threading.Thread(target=writer, args=(t,)) for t in range(4)
        ]
        cp = threading.Thread(target=checkpointer)
        cp.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stop.set()
        cp.join()
        assert not errors
        daemon.flush()  # final snapshot; log should rotate small
        want = state(client, "h")
        manager.close()
        client2 = make_client()
        restore_into(client2, snap_dir)
        recover_into(client2, manager.directory)
        assert state(client2, "h") == want
        # and a no-snapshot recovery (log alone, wherever the last
        # checkpoint left it) must also replay idempotently on top
        client3 = make_client()
        restore_into(client3, snap_dir)
        recover_into(client3, manager.directory)
        assert state(client3, "h") == want


class TestWalHttp:
    def test_stats_and_metrics_expose_wal(self, tmp_path):
        import asyncio

        from aiohttp.test_utils import TestClient as TC, TestServer

        from vectorlite_tpu.api.server import create_app

        async def go():
            client = make_client()
            manager = WalManager(tmp_path / "wal")
            client.set_collection_observer(manager)
            app = create_app(client, wal=manager)
            async with TC(TestServer(app)) as tc:
                await tc.post(
                    "/collections", json={"name": "w", "index_type": "flat"}
                )
                await tc.post("/collections/w/text", json={"text": "x"})
                stats = await (await tc.get("/stats")).json()
                assert stats["wal"]["collections"]["w"]["appends"] >= 2
                body = await (await tc.get("/metrics")).text()
                assert (
                    'vectorlite_wal_appends_total{collection="w"}' in body
                )

        asyncio.run(go())


class TestObserverAndStats:
    def test_observer_announces_existing(self, tmp_path):
        client = make_client()
        client.create_collection("pre", IndexType.FLAT)
        manager = WalManager(tmp_path / "wal")
        client.set_collection_observer(manager)
        assert wal_path(manager.directory, "pre").exists()
        assert client.get_collection("pre")._wal is not None
        stats = manager.stats()
        assert "pre" in stats["collections"]
        assert stats["fsync"] == "batch"

    def test_no_wal_without_observer(self, tmp_path):
        client = make_client()
        client.create_collection("c", IndexType.FLAT)
        client.add_text_to_collection("c", "x")  # must not touch disk
        assert client.get_collection("c")._wal is None

    def test_fsync_always_policy(self, tmp_path, monkeypatch):
        monkeypatch.setenv("VECTORLITE_WAL_FSYNC", "always")
        client, manager = wal_client(tmp_path)
        client.create_collection("c", IndexType.FLAT)
        client.add_text_to_collection("c", "durable")
        assert manager.stats()["fsync"] == "always"
        assert len(read_entries(wal_path(manager.directory, "c"))) == 2

    def test_bad_policy_falls_back(self, tmp_path, monkeypatch):
        monkeypatch.setenv("VECTORLITE_WAL_FSYNC", "sometimes")
        assert wal_mod._fsync_policy() == "batch"
