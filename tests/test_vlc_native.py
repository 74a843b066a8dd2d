"""Native .vlc emitter parity (native/vlc_emit.cpp vs persist/vlc.py).

The native array emitter exists purely for speed (the pure-Python ryu
formatter costs ~3.6 us/value); its output must be BYTE-IDENTICAL to
the Python serde_json/ryu formatter that the golden fixtures pin
(reference: src/persistence.rs:137). Covered here:

- single-value f64 formatting over the ryu edge corpus and random
  bit-cast doubles (incl. nan/inf -> null),
- i64 formatting incl. INT64_MIN,
- array element streaming across chunk boundaries,
- whole-snapshot byte equality with the fast path on vs off, for both
  Flat and HNSW (ndarray vector rows, CSR graph int arrays).
"""

from __future__ import annotations

import ctypes
import json
import math

import numpy as np
import pytest

from vectorlite_tpu.core.types import Vector
from vectorlite_tpu.index.flat import FlatIndex
from vectorlite_tpu.index.hnsw import HNSWIndex
from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.native import load_vlc
from vectorlite_tpu.persist import vlc


@pytest.fixture(scope="module")
def lib():
    lib = load_vlc()
    if lib is None:
        pytest.skip("native vlc emitter unavailable")
    return lib


def _native_fmt(lib, x: float) -> str:
    buf = ctypes.create_string_buffer(64)
    n = lib.vlc_fmt_f64(ctypes.c_double(x), buf)
    return buf.raw[:n].decode("ascii")


EDGE_VALUES = [
    0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 1.5, 100.0, 0.1, 2.0 / 3.0,
    math.pi, -math.e,
    # decimal<->scientific boundaries: kk in (-5, 16]
    1e15, 1e16, 1e17, -1e16, 9999999999999998.0, 12345678901234567.0,
    1e-4, 1e-5, -1e-5, 1.2345e-5, 0.0001234,
    # extremes and denormals
    5e-324, -5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
    1e308, -1e308, 4.9e-324,
    # integral values needing zero-padding
    1234567890123456.0, 2e15, -3e10,
    # non-finite -> null
    float("inf"), float("-inf"), float("nan"),
]


class TestScalarParity:

    def test_edge_values(self, lib):
        for x in EDGE_VALUES:
            assert _native_fmt(lib, x) == vlc._emit_f64(x), repr(x)

    def test_random_bitcast_doubles(self, lib):
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2**64, size=20000, dtype=np.uint64)
        vals = bits.view(np.float64)
        for x in vals:
            x = float(x)
            assert _native_fmt(lib, x) == vlc._emit_f64(x), (
                repr(x), np.float64(x).view(np.uint64)
            )

    def test_random_uniform_and_scaled(self, lib):
        rng = np.random.default_rng(11)
        for scale in (1.0, 1e-9, 1e9, 1e300, 1e-300):
            for x in rng.standard_normal(2000) * scale:
                x = float(x)
                assert _native_fmt(lib, x) == vlc._emit_f64(x), repr(x)


def _render(payload) -> str:
    return vlc.dumps_pretty(payload)


_SINK_CLS = vlc._FileSink


def _render_pure(payload, monkeypatch) -> str:
    # force the per-element Python path (scalar formatter included)
    monkeypatch.setattr(vlc, "_emit_ndarray", lambda *a: False)
    monkeypatch.setattr(vlc, "_emit_vector_rows", lambda *a: False)
    monkeypatch.setattr(vlc, "_emit_keyed_arrays", lambda *a: False)
    try:
        return vlc.dumps_pretty(payload)
    finally:
        monkeypatch.undo()


class TestArrayParity:

    def test_float_arrays(self, lib, monkeypatch):
        rng = np.random.default_rng(3)
        for n in (0, 1, 2, 7, 128, 1000):
            arr = rng.standard_normal(n) * 10.0 ** rng.integers(
                -12, 12, size=n
            )
            payload = {"a": arr, "nested": [[arr], {"b": arr}]}
            assert _render(payload) == _render_pure(payload, monkeypatch)

    def test_int_arrays(self, lib, monkeypatch):
        rng = np.random.default_rng(5)
        arr = rng.integers(-(2**62), 2**62, size=777, dtype=np.int64)
        arr[0] = np.iinfo(np.int64).min
        arr[1] = np.iinfo(np.int64).max
        arr[2] = 0
        payload = {"adj": arr, "levels": np.array([], dtype=np.int64)}
        assert _render(payload) == _render_pure(payload, monkeypatch)

    def test_edge_value_array(self, lib, monkeypatch):
        arr = np.array([x for x in EDGE_VALUES], dtype=np.float64)
        payload = [arr]
        s = _render(payload)
        assert s == _render_pure(payload, monkeypatch)
        # nan/inf render as null -> the output must stay parseable JSON
        parsed = json.loads(s)
        assert parsed[0][-1] is None  # nan
        assert parsed[0][0] == 0.0

    def test_chunk_boundaries(self, lib, monkeypatch):
        rng = np.random.default_rng(9)
        arr = rng.standard_normal(23)
        expect = _render_pure([arr], monkeypatch)
        for chunk in (1, 2, 7, 22, 23, 24):
            monkeypatch.setattr(vlc, "_EMIT_CHUNK", chunk)
            try:
                assert vlc.dumps_pretty([arr]) == expect, chunk
            finally:
                monkeypatch.undo()

    def test_2d_and_odd_dtypes_fall_back(self, lib, monkeypatch):
        payload = {
            "m": np.arange(6, dtype=np.float64).reshape(2, 3),
            "b": np.array([True, False]),
            "f32": np.array([0.1, 0.5], dtype=np.float32),
        }
        s = _render(payload)
        assert s == _render_pure(payload, monkeypatch)
        assert json.loads(s)["b"] == [True, False]


def _to_plain(node):
    if isinstance(node, np.ndarray):
        return [
            None if (isinstance(x, float) and x != x) else x
            for x in node.tolist()
        ]
    if isinstance(node, dict):
        return {k: _to_plain(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_to_plain(v) for v in node]
    return node


class TestNativeParse:
    """vlc_parse_doc: bulk arrays -> ndarrays, everything else byte-
    preserved for json.loads; output structurally equal to json.loads."""

    def _save(self, tmp_path, col, name="c.vlc"):
        from vectorlite_tpu.persist.vlc import save_collection_to_file

        p = tmp_path / name
        save_collection_to_file(col, p)
        return p

    def test_flat_tricky_doc(self, lib, tmp_path):
        from vectorlite_tpu.store.collection import Collection

        idx = FlatIndex(
            3,
            [
                Vector(
                    id=0,
                    values=[1.0, -0.0, 5e-324],
                    text='embedded "values": [1,2] trap',
                    metadata={
                        "values": [1, 2],
                        "s": "zwölf 🌍",
                        "null_arr": [None, 1.5],
                        "nested": {"values": [[3.0]]},
                    },
                ),
                Vector(id=1, values=[1e308, 0.5, 2.0 / 3.0], text="b"),
            ],
        )
        p = self._save(tmp_path, Collection("t", idx))
        raw = p.read_bytes()
        obj = vlc._native_parse(raw)
        assert obj is not None
        d = obj["index"]["Flat"]["data"]
        # eligible arrays became ndarrays...
        assert isinstance(d[0]["values"], np.ndarray)
        assert d[0]["values"].tolist() == [1.0, -0.0, 5e-324]
        assert math.copysign(1.0, d[0]["values"][1]) == -1.0
        assert d[1]["values"].tolist() == [1e308, 0.5, 2.0 / 3.0]
        # ...metadata subtrees did not (path-precise eligibility)
        assert d[0]["metadata"]["values"] == [1, 2]
        assert d[0]["metadata"]["null_arr"] == [None, 1.5]
        assert d[0]["metadata"]["nested"] == {"values": [[3.0]]}
        assert d[0]["text"] == 'embedded "values": [1,2] trap'
        # full structural equality with json.loads
        assert _to_plain(obj) == json.loads(raw.decode("utf-8"))

    def test_hnsw_graph_arrays(self, lib, tmp_path):
        from vectorlite_tpu.persist.vlc import load_collection_from_file
        from vectorlite_tpu.store.collection import Collection

        rng = np.random.default_rng(29)
        data = rng.standard_normal((80, 6))
        idx = HNSWIndex(6, SimilarityMetric.COSINE)
        idx.add_batch(
            [Vector(id=i, values=data[i], text=f"v{i}") for i in range(80)]
        )
        p = self._save(tmp_path, Collection("h", idx))
        obj = vlc._native_parse(p.read_bytes())
        g = obj["index"]["HNSW"]["graph"]
        assert isinstance(g["adj0"], np.ndarray)
        assert g["adj0"].dtype == np.int64
        assert isinstance(g["levels"], np.ndarray)
        vv = obj["index"]["HNSW"]["vector_values"]
        assert all(isinstance(a, np.ndarray) for a in vv.values())
        assert _to_plain(obj) == json.loads(p.read_text(encoding="utf-8"))
        # loaded collection restores the graph and searches correctly
        col = load_collection_from_file(p)
        with col.index_read() as i2:
            assert i2._entry == idx._entry
            res = i2.search(
                list(data[9]), 1, SimilarityMetric.COSINE, use_device=False
            )
            assert res[0].id == 9

    def test_null_in_values_falls_back_to_list(self, lib):
        # serde writes null for non-finite f64; such an array must stay
        # exactly what json.loads would produce (a list with None)
        doc = (
            '{"index": {"Flat": {"dim": 2, "data": [{"id": 0, '
            '"values": [1.0, null], "text": "", "metadata": null}]}}}'
        ).encode()
        obj = vlc._native_parse(doc)
        assert obj is not None
        assert obj["index"]["Flat"]["data"][0]["values"] == [1.0, None]

    def test_malformed_error_unchanged(self, lib, tmp_path):
        from vectorlite_tpu.errors import SerializationError
        from vectorlite_tpu.persist.vlc import load_collection_from_file

        p = tmp_path / "bad.vlc"
        p.write_text('{"header": [broken')
        with pytest.raises(SerializationError):
            load_collection_from_file(p)

    def test_load_parity_native_vs_python(self, lib, tmp_path,
                                          monkeypatch):
        from vectorlite_tpu.persist.vlc import load_collection_from_file
        from vectorlite_tpu.store.collection import Collection

        rng = np.random.default_rng(31)
        vals = rng.standard_normal((25, 9))
        idx = FlatIndex(
            9,
            [
                Vector(id=i, values=vals[i], text=f"t{i}",
                       metadata={"a": [i, None, "x"]})
                for i in range(25)
            ],
        )
        p = self._save(tmp_path, Collection("par", idx))
        col_n = load_collection_from_file(p)
        monkeypatch.setenv("VECTORLITE_NO_NATIVE", "1")
        col_p = load_collection_from_file(p)
        with col_n.index_read() as a, col_p.index_read() as b:
            assert len(a) == len(b) == 25
            for i in range(25):
                va, vb = a.get_vector(i), b.get_vector(i)
                assert np.array_equal(
                    np.asarray(va.values, dtype=np.float64),
                    np.asarray(vb.values, dtype=np.float64),
                )
                assert va.text == vb.text and va.metadata == vb.metadata

    def test_numeric_metadata_breaks_contiguity(self, tmp_path,
                                                monkeypatch):
        """Pure-numeric metadata arrays are extracted into the same
        parse buffer as the vector rows, so the rows are no longer one
        contiguous run; the Flat restore must detect that and fall back
        to np.stack without corrupting values or metadata."""
        from vectorlite_tpu.index.flat import _rows_as_matrix
        from vectorlite_tpu.persist.vlc import load_collection_from_file
        from vectorlite_tpu.store.collection import Collection

        rng = np.random.default_rng(77)
        vals = rng.standard_normal((70, 6))
        idx = FlatIndex(
            6,
            [
                Vector(id=i, values=vals[i], text=f"t{i}",
                       metadata={"nums": [1.5 * i, 2.5, -3.0]})
                for i in range(70)
            ],
        )
        p = tmp_path / "meta.vlc"
        from vectorlite_tpu.persist.vlc import save_collection_to_file
        save_collection_to_file(Collection("m", idx), p)

        col_n = load_collection_from_file(p)
        monkeypatch.setenv("VECTORLITE_NO_NATIVE", "1")
        col_p = load_collection_from_file(p)
        with col_n.index_read() as a, col_p.index_read() as b:
            assert len(a) == len(b) == 70
            for i in range(70):
                va, vb = a.get_vector(i), b.get_vector(i)
                assert np.array_equal(
                    np.asarray(va.values, dtype=np.float64),
                    np.asarray(vb.values, dtype=np.float64),
                )
                ma = np.asarray(va.metadata["nums"], dtype=np.float64)
                assert np.array_equal(ma, [1.5 * i, 2.5, -3.0])

    def test_rows_as_matrix_detects_gaps(self):
        from vectorlite_tpu.index.flat import _rows_as_matrix

        base = np.arange(40, dtype=np.float64)
        rows = [base[0:4], base[4:8], base[8:12]]
        mat = _rows_as_matrix(rows, 4)
        assert mat is not None and mat.shape == (3, 4)
        assert np.shares_memory(mat, base)
        assert np.array_equal(mat, np.stack(rows))
        # a gap (skipped run) must defeat the reshape
        assert _rows_as_matrix([base[0:4], base[8:12]], 4) is None
        # rows from different buffers must defeat it too
        other = np.arange(8, dtype=np.float64)
        assert _rows_as_matrix([base[0:4], other[0:4]], 4) is None
        # an owning (non-view) first row must defeat it
        assert _rows_as_matrix([np.arange(4.0), base[4:8]], 4) is None


class TestSnapshotParity:

    def _flat_payload(self):
        rng = np.random.default_rng(13)
        vals = rng.standard_normal((40, 8))
        vals[0, 0] = 5e-324
        vals[1, 1] = 1e308
        vals[2, 2] = -0.0
        vals[3, 3] = 1e16
        vecs = [
            Vector(id=i, values=[float(x) for x in vals[i]],
                   text=f"t{i}", metadata={"i": i} if i % 3 else None)
            for i in range(40)
        ]
        idx = FlatIndex(8, vecs)
        return {"Flat": idx.index_to_json()}

    def test_flat_snapshot_bytes(self, lib, monkeypatch):
        payload = self._flat_payload()
        s = _render(payload)
        assert s == _render_pure(payload, monkeypatch)
        obj = json.loads(s)
        assert len(obj["Flat"]["data"]) == 40

    def test_flat_roundtrip_through_text(self, lib):
        payload = self._flat_payload()
        obj = json.loads(_render(payload))
        restored = FlatIndex.index_from_json(obj["Flat"])
        assert len(restored) == 40
        got = restored.index_to_json()["data"][0]["values"]
        want = payload["Flat"]["data"][0]["values"]
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_streamed_file_equals_dumps_pretty(self, lib, tmp_path,
                                               monkeypatch):
        # save_collection_to_file streams through _FileSink (bounded
        # memory); bytes on disk must equal the one-shot renderer, for
        # every flush-boundary placement
        from vectorlite_tpu.persist.vlc import save_collection_to_file
        from vectorlite_tpu.store.collection import Collection

        rng = np.random.default_rng(23)
        vals = rng.standard_normal((30, 16))
        idx = FlatIndex(
            16,
            [
                Vector(id=i, values=[float(x) for x in vals[i]],
                       text=f"zwölf 🌍 {i}", metadata={"x": [i, None]})
                for i in range(30)
            ],
        )
        col = Collection("stream", idx)
        monkeypatch.setattr(
            vlc, "_now_rfc3339", lambda: "2026-01-01T00:00:00.000000Z"
        )
        expect = vlc.dumps_pretty(vlc.collection_to_json(col))
        import functools

        for limit in (1, 37, 8 << 20):
            monkeypatch.setattr(
                vlc, "_FileSink",
                functools.partial(_SINK_CLS, limit=limit),
            )
            p = tmp_path / f"s{limit}.vlc"
            save_collection_to_file(col, p)
            assert p.read_text(encoding="utf-8") == expect, limit

    def test_hnsw_snapshot_bytes(self, lib, monkeypatch):
        rng = np.random.default_rng(17)
        data = rng.standard_normal((60, 6))
        idx = HNSWIndex(6, SimilarityMetric.EUCLIDEAN)
        idx.add_batch(
            [
                Vector(id=i, values=[float(x) for x in data[i]],
                       text=f"v{i}")
                for i in range(60)
            ]
        )
        payload = {"HNSW": idx.index_to_json()}
        assert "graph" in payload["HNSW"]
        s = _render(payload)
        assert s == _render_pure(payload, monkeypatch)
        restored = HNSWIndex.index_from_json(json.loads(s)["HNSW"])
        assert len(restored) == 60
        res = restored.search(
            list(data[7]), 1, SimilarityMetric.EUCLIDEAN, use_device=False
        )
        assert res[0].id == 7


class TestBulkRowEmitters:
    """The chunked row emitters (vlc_emit_rows / vlc_emit_keyed_arrays)
    engage at >= 64 reference-shaped rows and must stay byte-identical
    to the per-row Python renderer on arbitrary content."""

    def _rows(self, n, d=5):
        rng = np.random.default_rng(41)
        rows = []
        for i in range(n):
            v = rng.standard_normal(d) * 10.0 ** rng.integers(-10, 10)
            if i == 5:
                v[0] = float("nan")
            if i == 6:
                v[1] = float("inf")
            if i == 7:
                v[:5] = [5e-324, 1e308, -0.0, 1e16, 1e-5][:d]
            meta = None
            if i % 7 == 0:
                meta = {"tag": "naïve 日本語", "arr": [1.5, {"x": None}],
                        "b": True, "n": i}
            elif i % 11 == 0:
                meta = {}
            elif i % 13 == 0:
                meta = [i, "s"]
            rows.append({
                "id": i * 37,
                "values": np.asarray(v, dtype=np.float64),
                "text": f'doc {i} ünïcode\t"q"\\b\x01ctl 日本 🌍',
                "metadata": meta,
            })
        return rows

    def test_flat_rows_byte_parity(self, lib, monkeypatch):
        payload = {"dim": 5, "data": self._rows(300)}
        s = _render(payload)
        assert s == _render_pure(payload, monkeypatch)
        obj = json.loads(s)
        assert len(obj["data"]) == 300
        assert obj["data"][5]["values"][0] is None  # NaN -> null

    def test_u64_ids(self, lib, monkeypatch):
        rows = [
            {"id": (1 << 64) - 1 - i, "values": np.zeros(3),
             "text": "", "metadata": None}
            for i in range(70)
        ]
        payload = {"data": rows}
        assert _render(payload) == _render_pure(payload, monkeypatch)
        assert str((1 << 64) - 1) in _render(payload)

    def test_chunk_boundary_rows(self, lib, monkeypatch):
        # chunk_rows = max(64, _EMIT_CHUNK // d): force several chunks
        monkeypatch.setattr(vlc, "_EMIT_CHUNK", 64 * 5)
        payload = {"data": self._rows(300)}
        s = vlc.dumps_pretty(payload)
        monkeypatch.undo()
        assert s == _render_pure(payload, monkeypatch)

    def test_mixed_shapes_fall_back(self, lib, monkeypatch):
        rows = self._rows(70)
        rows[42] = {"id": 42, "values": np.zeros(4), "text": "short",
                    "metadata": None}  # mismatched dim
        payload = {"data": rows}
        assert _render(payload) == _render_pure(payload, monkeypatch)
        rows[42] = {"id": -1, "values": np.zeros(5), "text": "",
                    "metadata": None}  # negative id
        assert _render(payload) == _render_pure(payload, monkeypatch)

    def test_keyed_arrays_byte_parity(self, lib, monkeypatch):
        rng = np.random.default_rng(43)
        vv = {
            str(i * 3): rng.standard_normal(rng.integers(0, 6))
            for i in range(200)
        }
        payload = {"vector_values": vv}
        s = _render(payload)
        assert s == _render_pure(payload, monkeypatch)
        obj = json.loads(s)
        assert len(obj["vector_values"]) == 200

    def test_keyed_arrays_fall_back_on_non_array(self, lib, monkeypatch):
        vv = {str(i): np.zeros(3) for i in range(70)}
        vv["x"] = [1.0, 2.0]  # plain list -> generic path
        payload = {"vector_values": vv}
        assert _render(payload) == _render_pure(payload, monkeypatch)


class TestGrowOneShot:

    def test_bulk_insert_single_grow(self):
        idx = FlatIndex(4)
        rng = np.random.default_rng(5)
        n = 70000
        idx.add_batch_arrays(
            list(range(n)), rng.standard_normal((n, 4)),
        )
        # capacity is the single power-of-2 covering n
        assert idx._capacity == 131072
        assert len(idx) == n
        # grown region stays zero / invalid by invariant
        assert not idx._valid[n:].any()
        assert not idx._values64[n:].any()
