"""Persistence tests (mirrors reference: src/persistence.rs:178-352) plus a
golden-format check against the exact reference serde layout."""

import json

import numpy as np
import pytest

from vectorlite_tpu import (
    Collection,
    FlatIndex,
    HNSWIndex,
    SimilarityMetric,
    Vector,
    load_collection_from_file,
    save_collection_to_file,
)
from vectorlite_tpu.embed.mock import ConstantEmbeddingFunction
from vectorlite_tpu.errors import (
    FileNotFound,
    InvalidFormat,
    SerializationError,
    VersionMismatch,
)
from vectorlite_tpu.persist.vlc import collection_to_json


def make_flat_collection():
    vectors = [
        Vector(id=0, values=[1.0, 2.0, 3.0], text="test"),
        Vector(id=1, values=[4.0, 5.0, 6.0], text="test"),
    ]
    return Collection("test_collection", FlatIndex(3, vectors))


class TestCollectionData:
    def test_payload_shape(self):
        payload = collection_to_json(make_flat_collection())
        assert payload["header"]["version"] == "1.0.0"
        assert payload["header"]["format"] == "vectorlite-collection"
        assert payload["header"]["created_at"].endswith("Z")
        meta = payload["metadata"]
        assert meta["name"] == "test_collection"
        assert meta["vector_count"] == 2
        assert meta["dimension"] == 3
        assert meta["index_type"] == "Flat"
        flat = payload["index"]["Flat"]
        assert flat["dim"] == 3
        row = flat["data"][0]
        # values is an f64 ndarray (streamed by the native emitter);
        # field order must match reference serde (src/lib.rs:163-174)
        assert list(row) == ["id", "values", "text", "metadata"]
        assert row["id"] == 0
        assert list(row["values"]) == [1.0, 2.0, 3.0]
        assert row["text"] == "test"
        assert row["metadata"] is None

    def test_save_load_roundtrip(self, tmp_path):
        path = tmp_path / "test_collection.vlc"
        original = make_flat_collection()
        save_collection_to_file(original, path)
        assert path.exists()
        loaded = load_collection_from_file(path)
        assert loaded.name == original.name
        assert loaded.next_id() == original.next_id() == 2
        with loaded.index_read() as index:
            assert len(index) == 2
            results = index.search(
                [1.1, 2.1, 3.1], 1, SimilarityMetric.COSINE
            )
            assert results[0].id == 0

    def test_save_load_hnsw(self, tmp_path):
        path = tmp_path / "test_hnsw.vlc"
        index = HNSWIndex(3, SimilarityMetric.EUCLIDEAN)
        collection = Collection("test_hnsw_collection", index)
        embedder = ConstantEmbeddingFunction([1.0, 1.0, 1.0])
        collection.add_text("test1", embedder)
        embedder2 = ConstantEmbeddingFunction([2.0, 2.0, 2.0])
        collection.add_text("test2", embedder2)
        save_collection_to_file(collection, path)
        loaded = load_collection_from_file(path)
        assert loaded.name == "test_hnsw_collection"
        with loaded.index_read() as idx:
            assert len(idx) == 2
            assert idx.dimension == 3
            assert idx.metric() is SimilarityMetric.EUCLIDEAN
            results = idx.search(
                [1.0, 1.0, 1.0], 1, SimilarityMetric.EUCLIDEAN
            )
            assert results[0].text == "test1"

    def test_values_roundtrip_exact_f64(self, tmp_path):
        # host f64 staging preserves exact values through save/load
        path = tmp_path / "exact.vlc"
        values = [0.1, 1e-17, 123456789.123456789]
        collection = Collection(
            "c", FlatIndex(3, [Vector(id=0, values=values, text="t")])
        )
        save_collection_to_file(collection, path)
        loaded = load_collection_from_file(path)
        with loaded.index_read() as idx:
            assert idx.get_vector(0).values == values

    def test_invalid_json(self, tmp_path):
        path = tmp_path / "invalid.vlc"
        path.write_text("invalid json")
        with pytest.raises(SerializationError):
            load_collection_from_file(path)

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFound):
            load_collection_from_file(tmp_path / "nope.vlc")

    def test_pathological_nesting_rejected(self, tmp_path):
        """Pathological inputs must surface as TYPED errors — never
        RecursionError/AttributeError escaping to a 500 (serde_json's
        default recursion limit rejects the deep ones at parse time
        too). Found by parser fuzzing."""
        from vectorlite_tpu.errors import VectorLiteError

        path = tmp_path / "deep.vlc"
        cases = [
            # beyond the interpreter stack: parse-time rejection
            (b"[" * 10000 + b"]" * 10000, SerializationError),
            # beyond the NATIVE parser's C++ stack: before the depth cap
            # in vlc_emit.cpp:parse_value this SIGSEGV'd the process
            # instead of raising (found by round-3 self-review)
            (b"[" * 2_000_000 + b"1" + b"]" * 2_000_000, SerializationError),
            # parses fine, but it's not a collection object
            (b'{"a":' * 5000 + b"1" + b"}" * 5000, VersionMismatch),
            (b"[1, 2, 3]", InvalidFormat),
            (b'{"header": "not a dict"}', VersionMismatch),
            (
                b'{"header": {"version": "1.0.0", '
                b'"format": "vectorlite-collection"}, "index": 7}',
                InvalidFormat,
            ),
            (
                b'{"header": {"version": "1.0.0", '
                b'"format": "vectorlite-collection"}}',
                InvalidFormat,
            ),
        ]
        for raw, exc in cases:
            path.write_bytes(raw)
            with pytest.raises(exc):
                load_collection_from_file(path)
            assert issubclass(exc, VectorLiteError)

    def test_mangled_index_payload_is_typed(self):
        """Structured fuzzing invariant: ANY malformed index payload
        raises a VectorLiteError (SerializationError for untyped
        failures inside deserialization), never a raw
        TypeError/AttributeError that would 500 with a Python message."""
        import copy
        import random

        from vectorlite_tpu.errors import VectorLiteError
        from vectorlite_tpu.index.hnsw import HNSWIndex
        from vectorlite_tpu.core.metrics import SimilarityMetric
        from vectorlite_tpu.persist.vlc import collection_from_json

        rng = random.Random(5)
        h = HNSWIndex(3, SimilarityMetric.COSINE)
        h.add_batch_arrays(
            list(range(12)),
            np.random.default_rng(0).normal(size=(12, 3)),
            texts=[f"t{i}" for i in range(12)],
        )
        payload = json.loads(
            json.dumps(
                h.index_to_json(),
                default=lambda o: o.tolist()
                if isinstance(o, np.ndarray)
                else o,
            )
        )
        junk = [None, 7, "junk", [], {}, [None], True, [[1], [2, 3]]]
        for _ in range(250):
            m = copy.deepcopy(payload)
            node, path = m, []
            while (
                isinstance(node, (dict, list))
                and node
                and rng.random() < 0.8
            ):
                key = (
                    rng.choice(list(node))
                    if isinstance(node, dict)
                    else rng.randrange(len(node))
                )
                path.append((node, key))
                node = node[key]
            if not path:
                continue
            parent, key = path[-1]
            parent[key] = rng.choice(junk)
            doc = {
                "header": {
                    "version": "1.0.0",
                    "format": "vectorlite-collection",
                    "created_at": "x",
                },
                "metadata": {"name": "z"},
                "index": {"HNSW": m},
            }
            try:
                col = collection_from_json(doc)
                with col.index_read() as ix:
                    ix.search([1.0, 0, 0], 3, SimilarityMetric.COSINE)
            except VectorLiteError:
                pass  # typed rejection is the contract

    def test_version_mismatch(self, tmp_path):
        path = tmp_path / "v2.vlc"
        payload = collection_to_json(make_flat_collection())
        payload["header"]["version"] = "2.0.0"
        from vectorlite_tpu.persist.vlc import dumps_pretty

        path.write_text(dumps_pretty(payload))
        with pytest.raises(VersionMismatch):
            load_collection_from_file(path)

    def test_invalid_format(self, tmp_path):
        from vectorlite_tpu.errors import InvalidFormat

        path = tmp_path / "fmt.vlc"
        payload = collection_to_json(make_flat_collection())
        payload["header"]["format"] = "something-else"
        from vectorlite_tpu.persist.vlc import dumps_pretty

        path.write_text(dumps_pretty(payload))
        with pytest.raises(InvalidFormat):
            load_collection_from_file(path)

    def test_creates_parent_dirs(self, tmp_path):
        path = tmp_path / "nested" / "dirs" / "c.vlc"
        save_collection_to_file(make_flat_collection(), path)
        assert path.exists()


class TestReferenceFormatCompat:
    """Read a hand-written file in the exact reference serde layout
    (reference: src/persistence.rs:63-96, src/index/hnsw.rs:197-213)."""

    def test_load_reference_flat_file(self, tmp_path):
        payload = {
            "header": {
                "version": "1.0.0",
                "format": "vectorlite-collection",
                "created_at": "2025-01-21T10:00:00.000000Z",
            },
            "metadata": {
                "name": "ref_flat",
                "created_at": "2025-01-21T10:00:00.000000Z",
                "vector_count": 2,
                "dimension": 2,
                "index_type": "Flat",
            },
            "index": {
                "Flat": {
                    "dim": 2,
                    "data": [
                        {
                            "id": 3,
                            "values": [1.0, 0.0],
                            "text": "a",
                            "metadata": {"tag": "x"},
                        },
                        {
                            "id": 7,
                            "values": [0.0, 1.0],
                            "text": "b",
                            "metadata": None,
                        },
                    ],
                }
            },
        }
        path = tmp_path / "ref.vlc"
        path.write_text(json.dumps(payload))
        loaded = load_collection_from_file(path)
        assert loaded.name == "ref_flat"
        assert loaded.next_id() == 8  # max_id + 1
        with loaded.index_read() as idx:
            v = idx.get_vector(3)
            assert v.metadata == {"tag": "x"}

    def test_load_reference_hnsw_file(self, tmp_path):
        # includes id_to_index/index_to_id which loaders must ignore
        payload = {
            "header": {
                "version": "1.0.0",
                "format": "vectorlite-collection",
                "created_at": "2025-01-21T10:00:00.000000Z",
            },
            "metadata": {
                "name": "ref_hnsw",
                "created_at": "2025-01-21T10:00:00.000000Z",
                "vector_count": 2,
                "dimension": 2,
                "index_type": "HNSW",
            },
            "index": {
                "HNSW": {
                    "dim": 2,
                    "metric": "Cosine",
                    "id_to_index": {"1": 0, "2": 1},
                    "index_to_id": {"0": 1, "1": 2},
                    "metadata": {
                        "1": {"text": "hello", "metadata": None},
                        "2": {"text": "world", "metadata": {"n": 2}},
                    },
                    "vector_values": {
                        "1": [1.0, 0.0],
                        "2": [0.0, 1.0],
                    },
                }
            },
        }
        path = tmp_path / "ref_hnsw.vlc"
        path.write_text(json.dumps(payload))
        loaded = load_collection_from_file(path)
        with loaded.index_read() as idx:
            assert len(idx) == 2
            assert idx.metric() is SimilarityMetric.COSINE
            results = idx.search([1.0, 0.05], 1, SimilarityMetric.COSINE)
            assert results[0].id == 1
            assert results[0].text == "hello"

    def test_written_hnsw_payload_has_reference_fields(self):
        idx = HNSWIndex(2, SimilarityMetric.DOT_PRODUCT)
        idx.add(Vector(id=4, values=[1.0, 2.0], text="t"))
        collection = Collection("c", idx)
        payload = collection_to_json(collection)["index"]["HNSW"]
        # all serde-visible fields present (reference: src/index/hnsw.rs:197-213)
        # plus the optional "graph" CSR extension (ignored by serde readers)
        assert set(payload) >= {
            "dim",
            "metric",
            "id_to_index",
            "index_to_id",
            "metadata",
            "vector_values",
        }
        assert set(payload) - {"graph"} == {
            "dim",
            "metric",
            "id_to_index",
            "index_to_id",
            "metadata",
            "vector_values",
        }
        assert payload["metric"] == "DotProduct"
        from vectorlite_tpu.persist.vlc import dumps_pretty

        assert json.loads(dumps_pretty(payload["vector_values"])) == {
            "4": [1.0, 2.0]
        }


class TestGraphDumpExtension:
    """The .vlc "graph" CSR extension: our loader skips rebuild-on-load;
    the payload stays loadable by readers that ignore unknown fields."""

    def _build(self, n=120, d=12, seed=4):
        import numpy as np

        from vectorlite_tpu import HNSWIndex

        rng = np.random.default_rng(seed)
        data = rng.normal(size=(n, d))
        idx = HNSWIndex(d, SimilarityMetric.EUCLIDEAN, seed=9)
        idx.add_batch(
            [
                Vector(id=i * 3, values=list(data[i]), text=f"t{i}")
                for i in range(n)
            ]
        )
        return idx, data

    def test_dump_present_and_restores_without_rebuild(self):
        import numpy as np

        from vectorlite_tpu import HNSWIndex

        idx, data = self._build()
        payload = idx.index_to_json()
        g = payload["graph"]
        assert g["format"] == "vectorlite-tpu-csr-v1"
        assert g["num_nodes"] == 120
        restored = HNSWIndex.index_from_json(payload)
        # identical graph, not a re-inserted one
        assert restored._entry == idx._entry
        assert np.array_equal(
            restored._adj[0][:120], idx._adj[0][:120]
        )
        res = restored.search(
            list(data[7]), 3, SimilarityMetric.EUCLIDEAN, use_device=False
        )
        assert res[0].id == 21
        assert res[0].text == "t7"
        # post-restore inserts keep working
        restored.add(Vector(id=9999, values=list(data[5] * 0.5), text="new"))
        res = restored.search(
            list(data[5] * 0.5), 1, SimilarityMetric.EUCLIDEAN,
            use_device=False,
        )
        assert res[0].id == 9999

    def test_dump_skipped_with_tombstones(self):
        idx, _ = self._build()
        idx.delete(0)
        payload = idx.index_to_json()
        assert "graph" not in payload

    def test_env_disables_dump(self, monkeypatch):
        monkeypatch.setenv("VECTORLITE_VLC_GRAPH", "0")
        idx, _ = self._build()
        assert "graph" not in idx.index_to_json()

    def test_corrupt_dump_falls_back_to_rebuild(self):
        from vectorlite_tpu import HNSWIndex

        idx, data = self._build()
        payload = idx.index_to_json()
        payload["graph"]["entry"] = 10**9  # invalid
        restored = HNSWIndex.index_from_json(payload)
        assert len(restored) == 120
        res = restored.search(
            list(data[7]), 1, SimilarityMetric.EUCLIDEAN, use_device=False
        )
        assert res[0].id == 21

    @pytest.mark.parametrize(
        "mutate",
        [
            # out-of-range level-0 neighbor (>= num_nodes but within capacity)
            lambda g: g["adj0"].__setitem__(0, g["num_nodes"] + 5),
            # negative level
            lambda g: g["levels"].__setitem__(0, -3),
            # out-of-range upper-level neighbor
            lambda g: (
                g["upper"][0].__setitem__(0, g["num_nodes"] + 1)
                if g.get("upper")
                else g["adj0"].__setitem__(1, 10**6)
            ),
        ],
        ids=["adj0-range", "neg-level", "upper-range"],
    )
    def test_corrupt_adjacency_falls_back_to_rebuild(self, mutate):
        # corrupt neighbor indices / levels must not load silently as a
        # broken graph scanning zero-filled rows
        from vectorlite_tpu import HNSWIndex

        idx, data = self._build()
        payload = idx.index_to_json()
        mutate(payload["graph"])
        restored = HNSWIndex.index_from_json(payload)
        assert len(restored) == 120
        res = restored.search(
            list(data[7]), 1, SimilarityMetric.EUCLIDEAN, use_device=False
        )
        assert res[0].id == 21

    def test_vlc_roundtrip_with_graph(self, tmp_path):
        idx, data = self._build()
        collection = Collection("g", idx)
        path = tmp_path / "g.vlc"
        save_collection_to_file(collection, path)
        loaded = load_collection_from_file(path)
        with loaded.index_read() as restored:
            res = restored.search(
                list(data[3]), 1, SimilarityMetric.EUCLIDEAN,
                use_device=False,
            )
            assert res[0].id == 9


def test_concurrent_saves_same_path(tmp_path):
    """Regression: tmp files are unique per thread, so racing saves of the
    same path always publish a complete snapshot."""
    import threading

    collection = make_flat_collection()
    path = tmp_path / "race.vlc"
    errors = []

    def saver():
        try:
            for _ in range(10):
                save_collection_to_file(collection, path)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=saver) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    loaded = load_collection_from_file(path)
    assert loaded.get_info().count == 2
    assert not list(tmp_path.glob("*.tmp"))
