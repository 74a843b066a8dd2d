"""Metadata-filtered search (``where`` clauses) — TPU-native extension.

The reference has no filtered search (metadata is stored but opaque,
reference: src/lib.rs:163-174). Coverage: the clause compiler's
semantics (core/filter.py), FlatIndex host + device + mesh paths (the
mask intersects the kernels' validity input), HNSW brute/beam paths,
cache invalidation across mutations, and the HTTP surface.
"""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vectorlite_tpu import (
    FlatIndex,
    HNSWIndex,
    InvalidFilter,
    SimilarityMetric,
    Vector,
    VectorLiteClient,
)
from vectorlite_tpu.api.server import create_app
from vectorlite_tpu.core.filter import compile_where
from vectorlite_tpu.embed.mock import MockEmbeddingFunction

COS = SimilarityMetric.COSINE


class TestCompileWhere:
    def check(self, where, meta, expect):
        assert compile_where(where)(meta) is expect

    def test_equality_and_missing(self):
        self.check({"tag": "a"}, {"tag": "a"}, True)
        self.check({"tag": "a"}, {"tag": "b"}, False)
        self.check({"tag": "a"}, {"other": 1}, False)
        self.check({"tag": "a"}, None, False)
        self.check({"tag": "a"}, "not-an-object", False)

    def test_implicit_and(self):
        w = {"a": 1, "b": "x"}
        self.check(w, {"a": 1, "b": "x"}, True)
        self.check(w, {"a": 1, "b": "y"}, False)

    def test_strict_json_typing(self):
        # serde_json-style: booleans never equal numbers
        self.check({"flag": True}, {"flag": 1}, False)
        self.check({"flag": 1}, {"flag": True}, False)
        self.check({"n": 1}, {"n": 1.0}, True)  # Mongo-style numerics

    def test_deep_equality(self):
        w = {"cfg": {"a": [1, 2], "b": None}}
        self.check(w, {"cfg": {"a": [1, 2], "b": None}}, True)
        self.check(w, {"cfg": {"a": [1, 2]}}, False)
        self.check(w, {"cfg": {"a": [2, 1], "b": None}}, False)

    def test_operators(self):
        self.check({"y": {"$gte": 2020, "$lt": 2024}}, {"y": 2021}, True)
        self.check({"y": {"$gte": 2020, "$lt": 2024}}, {"y": 2024}, False)
        self.check({"y": {"$gt": 5}}, {"y": "abc"}, False)  # type mismatch
        self.check({"s": {"$gte": "m"}}, {"s": "z"}, True)
        self.check({"t": {"$in": ["a", "b"]}}, {"t": "b"}, True)
        self.check({"t": {"$in": ["a", "b"]}}, {"t": "c"}, False)
        self.check({"t": {"$nin": ["a"]}}, {"t": "b"}, True)
        self.check({"t": {"$nin": ["a"]}}, {}, False)  # missing key
        self.check({"t": {"$ne": "a"}}, {"t": "b"}, True)
        self.check({"t": {"$exists": True}}, {"t": None}, True)
        self.check({"t": {"$exists": False}}, {"other": 1}, True)
        self.check({"t": {"$exists": False}}, None, True)  # no metadata

    def test_logical(self):
        w = {"$or": [{"a": 1}, {"b": 2}]}
        self.check(w, {"a": 1}, True)
        self.check(w, {"b": 2}, True)
        self.check(w, {"a": 2, "b": 3}, False)
        self.check({"$not": {"a": 1}}, {"a": 2}, True)
        self.check(
            {"$and": [{"a": 1}, {"b": {"$gt": 0}}]}, {"a": 1, "b": 5}, True
        )

    def test_empty_matches_all(self):
        self.check({}, None, True)
        self.check({}, {"x": 1}, True)

    def test_malformed(self):
        for bad in (
            "x",
            ["a"],
            {"f": {"$bogus": 1}},
            {"$or": []},
            {"$or": "x"},
            {"$xor": [{}]},
            {"f": {"$in": "abc"}},
            {"f": {"$exists": "yes"}},
        ):
            with pytest.raises(InvalidFilter):
                compile_where(bad)


class TestCompileWhereFuzz:
    """The clause compiler sits on the HTTP surface: random structured
    input must either raise InvalidFilter at compile time or yield a
    predicate that returns a plain bool on ANY metadata value — never a
    TypeError/KeyError escaping to a 500."""

    def _values(self, rng, depth=0):
        kinds = ["int", "float", "str", "bool", "none", "list", "dict"]
        k = kinds[rng.integers(len(kinds) - (2 if depth > 1 else 0))]
        if k == "int":
            return int(rng.integers(-5, 5))
        if k == "float":
            return float(rng.normal())
        if k == "str":
            return "s" + str(rng.integers(3))
        if k == "bool":
            return bool(rng.integers(2))
        if k == "none":
            return None
        if k == "list":
            return [self._values(rng, depth + 1) for _ in range(rng.integers(3))]
        return {
            "k" + str(i): self._values(rng, depth + 1)
            for i in range(rng.integers(3))
        }

    def _clause(self, rng, depth=0):
        ops = [
            "$eq", "$ne", "$in", "$nin", "$gt", "$gte", "$lt", "$lte",
            "$exists", "$bogus",
        ]
        out = {}
        for _ in range(rng.integers(1, 4)):
            roll = rng.integers(10)
            if roll == 0 and depth < 2:
                out["$or"] = [self._clause(rng, depth + 1)]
            elif roll == 1 and depth < 2:
                out["$not"] = self._clause(rng, depth + 1)
            elif roll == 2:
                out["f" + str(rng.integers(4))] = {
                    ops[rng.integers(len(ops))]: self._values(rng)
                }
            else:
                out["f" + str(rng.integers(4))] = self._values(rng)
        return out

    def test_fuzz_never_escapes(self):
        import numpy as np

        from vectorlite_tpu.errors import InvalidFilter

        rng = np.random.default_rng(42)
        metas = [self._values(rng) for _ in range(50)] + [None]
        for _ in range(500):
            clause = self._clause(rng)
            try:
                pred = compile_where(clause)
            except InvalidFilter:
                continue
            for meta in metas:
                out = pred(meta)
                assert out is True or out is False, (clause, meta, out)


def _flat_corpus(n=64, d=8, seed=3):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, d))
    metas = [
        {"tag": "even" if i % 2 == 0 else "odd", "rank": i}
        if i % 5 != 0
        else None  # every 5th row has no metadata at all
        for i in range(n)
    ]
    idx = FlatIndex(d)
    idx.add_batch_arrays(
        np.arange(n, dtype=np.uint64),
        data,
        texts=[f"t{i}" for i in range(n)],
        metadatas=metas,
    )
    return idx, data, metas


def _brute_ids(data, metas, pred, q, k):
    """Ground truth: cosine top-k over pred-matching rows."""
    sims = data @ q / (
        np.linalg.norm(data, axis=1) * np.linalg.norm(q)
    )
    order = np.argsort(-sims, kind="stable")
    out = [i for i in order if pred(metas[i])][:k]
    return out


class TestFlatFiltered:
    def test_host_path_matches_brute_force(self):
        idx, data, metas = _flat_corpus()
        pred = compile_where({"tag": "even"})
        q = data[2] + 1e-3
        res = idx.search_batch([q], 5, COS, where={"tag": "even"})[0]
        assert [r.id for r in res] == _brute_ids(data, metas, pred, q, 5)
        assert all(r.metadata and r.metadata["tag"] == "even" for r in res)

    def test_range_and_or(self):
        idx, data, metas = _flat_corpus()
        where = {"$or": [{"rank": {"$lt": 4}}, {"rank": {"$gte": 60}}]}
        pred = compile_where(where)
        q = data[0]
        res = idx.search_batch([q], 10, COS, where=where)[0]
        assert [r.id for r in res] == _brute_ids(data, metas, pred, q, 10)

    def test_fewer_matches_than_k(self):
        idx, data, metas = _flat_corpus()
        res = idx.search_batch(
            [data[0]], 10, COS, where={"rank": {"$in": [1, 2]}}
        )[0]
        assert sorted(r.id for r in res) == [1, 2]

    def test_zero_matches_and_empty_where(self):
        idx, data, metas = _flat_corpus()
        assert (
            idx.search_batch([data[0]], 3, COS, where={"tag": "nope"})[0]
            == []
        )
        res_all = idx.search_batch([data[0]], 3, COS)[0]
        res_empty = idx.search_batch([data[0]], 3, COS, where={})[0]
        assert [r.id for r in res_all] == [r.id for r in res_empty]

    def test_no_metadata_rows_match_exists_false(self):
        idx, data, metas = _flat_corpus()
        where = {"tag": {"$exists": False}}
        res = idx.search_batch([data[0]], 64, COS, where=where)[0]
        assert sorted(r.id for r in res) == [
            i for i in range(64) if metas[i] is None
        ]

    def test_invalid_where_raises_even_when_empty(self):
        idx = FlatIndex(4)
        with pytest.raises(InvalidFilter):
            idx.search_batch([[0.0] * 4], 3, COS, where={"f": {"$bad": 1}})

    def test_device_path_matches_brute_force(self, monkeypatch):
        # force the device kernels (valid-mask intersection) on CPU jax
        monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")
        idx, data, metas = _flat_corpus(n=128)
        for where in ({"tag": "odd"}, {"rank": {"$gte": 100}}):
            pred = compile_where(where)
            q = data[7] + 1e-3
            res = idx.search_batch([q], 6, COS, where=where)[0]
            assert [r.id for r in res] == _brute_ids(
                data, metas, pred, q, 6
            )

    def test_arrays_path_and_padding(self, monkeypatch):
        monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")
        idx, data, metas = _flat_corpus(n=128)
        where = {"rank": {"$in": [3, 9]}}
        ids, scores = idx.search_batch_arrays(
            data[:4], 5, COS, where=where
        )
        assert ids.shape == (4, 5)
        for row_ids, row_s in zip(ids, scores):
            live = row_ids[np.isfinite(row_s)]
            assert sorted(live.tolist()) == [3, 9]
            assert (row_ids[~np.isfinite(row_s)] == -1).all()

    def test_stream_path_filtered(self, monkeypatch):
        """search_batch_stream with a where clause: every yielded batch
        matches the filter and agrees with the array path."""
        monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")
        idx, data, metas = _flat_corpus(n=128)
        where = {"tag": "odd"}
        batches = [data[:4], data[4:8]]
        got = list(
            idx.search_batch_stream(batches, 5, COS, where=where)
        )
        assert len(got) == 2
        for (ids, scores), q in zip(got, batches):
            ref_ids, ref_scores = idx.search_batch_arrays(
                q, 5, COS, where=where
            )
            assert np.array_equal(ids, ref_ids)
            np.testing.assert_allclose(
                scores[np.isfinite(scores)],
                ref_scores[np.isfinite(ref_scores)],
                rtol=1e-9,
            )

    def test_cache_invalidation_across_mutations(self):
        idx, data, metas = _flat_corpus()
        where = {"tag": "even"}
        r1 = idx.search_batch([data[0]], 64, COS, where=where)[0]
        idx.add(
            Vector(
                id=1000,
                values=list(map(float, data[0])),
                text="",
                metadata={"tag": "even", "rank": 1000},
            )
        )
        r2 = idx.search_batch([data[0]], 65, COS, where=where)[0]
        assert 1000 in {r.id for r in r2}
        assert len(r2) == len(r1) + 1
        idx.delete(1000)
        r3 = idx.search_batch([data[0]], 65, COS, where=where)[0]
        assert 1000 not in {r.id for r in r3}

    def test_filtered_forces_exhaustive_selection(self):
        """Approximate selection engines assume uniformly-spread
        survivors; a where mask clusters them (same-tag rows insert
        together), so filtered searches must resolve to exhaustive
        kernels regardless of the approx flag (round-3 self-review)."""
        idx, _, _ = _flat_corpus()
        for approx in (None, True, False):
            assert (
                idx._resolve_approx(approx, 16, COS, filtered=True)
                is False
            )

    def test_tuple_clause_canonicalizes_like_list(self):
        """json.dumps turns tuples into arrays, so {"a": (1, 2)} and
        {"a": [1, 2]} share a cache key — they must share match
        semantics too or a cached mask would answer for the wrong
        clause (round-3 self-review)."""
        idx, data, _ = _flat_corpus(n=8)
        idx.update_metadata(3, {"a": [1, 2]})
        r_tuple = idx.search_batch(
            [data[3]], 8, COS, where={"a": (1, 2)}
        )[0]
        r_list = idx.search_batch(
            [data[3]], 8, COS, where={"a": [1, 2]}
        )[0]
        assert [r.id for r in r_tuple] == [r.id for r in r_list] == [3]

    def test_append_extends_cached_mask_incrementally(self):
        """Appends must surface in cached masks without a structural
        rebuild (the extension path), including across capacity
        growth."""
        idx, data, metas = _flat_corpus()
        where = {"tag": "even"}
        r1 = {
            r.id
            for r in idx.search_batch([data[0]], 64, COS, where=where)[0]
        }
        rng = np.random.default_rng(99)
        extra = rng.normal(size=(300, 8))  # forces capacity growth
        idx.add_batch_arrays(
            np.arange(2000, 2300, dtype=np.uint64),
            extra,
            metadatas=[{"tag": "even"}] * 300,
        )
        r2 = {
            r.id
            for r in idx.search_batch([data[0]], 400, COS, where=where)[0]
        }
        assert r1 <= r2
        assert set(range(2000, 2300)) <= r2

    def test_deleted_rows_never_match(self):
        idx, data, metas = _flat_corpus()
        idx.delete(2)
        res = idx.search_batch(
            [data[2]], 64, COS, where={"tag": "even"}
        )[0]
        assert 2 not in {r.id for r in res}


class TestHNSWFiltered:
    def _build(self, n=120, d=8, seed=5):
        rng = np.random.default_rng(seed)
        data = rng.normal(size=(n, d)).astype(np.float64)
        metas = [{"g": i % 3} for i in range(n)]
        idx = HNSWIndex(d, COS, seed=11)
        idx.add_batch(
            [
                Vector(
                    id=i,
                    values=[float(x) for x in data[i]],
                    text=f"t{i}",
                    metadata=metas[i],
                )
                for i in range(n)
            ]
        )
        return idx, data, metas

    def test_brute_path_exact(self):
        idx, data, metas = self._build()
        pred = compile_where({"g": 1})
        q = data[4] + 1e-3
        res = idx.search_batch([q], 5, COS, where={"g": 1})[0]
        assert [r.id for r in res] == _brute_ids(data, metas, pred, q, 5)
        assert all(r.metadata["g"] == 1 for r in res)

    def test_beam_path_filters_and_recalls(self, monkeypatch):
        idx, data, metas = self._build(n=400)
        # force the beam+post-filter path: shrink the brute ceiling AND
        # keep ef_try below the match count (the ef_try >= m dominance
        # rule otherwise routes to exact brute force)
        monkeypatch.setattr(HNSWIndex, "_FILTER_BRUTE_MAX", 4)
        pred = compile_where({"g": 0})
        q = data[9] + 1e-3
        m = sum(1 for x in metas if x["g"] == 0)
        res = idx.search_batch([q], 5, COS, where={"g": 0}, ef=8)[0]
        assert m > 64  # beam path really ran (ef_try = 64 < m)
        assert len(res) == 5
        assert all(r.metadata["g"] == 0 for r in res)
        truth = set(_brute_ids(data, metas, pred, q, 5))
        got = {r.id for r in res}
        assert len(got & truth) >= 4  # approximate contract, ef-escalated

    def test_incremental_extension_after_appends(self):
        idx, data, metas = self._build(n=60)
        where = {"g": 1}
        before = {
            r.id
            for r in idx.search_batch([data[1]], 60, COS, where=where)[0]
        }
        idx.add(
            Vector(
                id=500,
                values=[float(x) for x in data[1]],
                text="",
                metadata={"g": 1},
            )
        )
        after = {
            r.id
            for r in idx.search_batch([data[1]], 61, COS, where=where)[0]
        }
        assert after == before | {500}

    def test_zero_matches_and_invalid(self):
        idx, data, metas = self._build(n=30)
        assert idx.search_batch([data[0]], 3, COS, where={"g": 9})[0] == []
        with pytest.raises(InvalidFilter):
            idx.search_batch([data[0]], 3, COS, where={"g": {"$no": 1}})

    def test_delete_invalidates(self):
        idx, data, metas = self._build(n=40)
        where = {"g": 2}
        before = {
            r.id
            for r in idx.search_batch([data[2]], 40, COS, where=where)[0]
        }
        assert 2 in before
        idx.delete(2)
        after = {
            r.id
            for r in idx.search_batch([data[2]], 40, COS, where=where)[0]
        }
        assert after == before - {2}


class TestUpdateMetadata:
    """In-place metadata replacement (extension) — must retarget filters
    immediately (epoch-invalidated mask cache) without touching
    embeddings."""

    def test_flat_update_retargets_filters(self):
        idx, data, metas = _flat_corpus()
        where = {"tag": "retagged"}
        assert idx.search_batch([data[3]], 5, COS, where=where)[0] == []
        idx.update_metadata(3, {"tag": "retagged"})
        res = idx.search_batch([data[3]], 5, COS, where=where)[0]
        assert [r.id for r in res] == [3]
        assert res[0].metadata == {"tag": "retagged"}
        assert idx.get_vector(3).metadata == {"tag": "retagged"}
        idx.update_metadata(3, None)  # clear
        assert idx.search_batch([data[3]], 5, COS, where=where)[0] == []
        assert idx.get_vector(3).metadata is None

    def test_flat_update_missing_raises(self):
        from vectorlite_tpu.errors import VectorNotFound

        idx, _, _ = _flat_corpus(n=8)
        with pytest.raises(VectorNotFound):
            idx.update_metadata(999, {"a": 1})

    def test_hnsw_update_retargets_filters(self):
        from vectorlite_tpu.errors import VectorNotFound

        rng = np.random.default_rng(7)
        data = rng.normal(size=(30, 8))
        idx = HNSWIndex(8, COS, seed=2)
        idx.add_batch(
            [
                Vector(
                    id=i,
                    values=[float(x) for x in data[i]],
                    text="",
                    metadata={"g": 0},
                )
                for i in range(30)
            ]
        )
        idx.update_metadata(5, {"g": 1})
        res = idx.search_batch([data[5]], 5, COS, where={"g": 1})[0]
        assert [r.id for r in res] == [5]
        with pytest.raises(VectorNotFound):
            idx.update_metadata(77, {})
        idx.delete(5)
        with pytest.raises(VectorNotFound):
            idx.update_metadata(5, {})


class TestDeleteWhere:
    """Bulk delete by metadata filter (extension) — one mask evaluation,
    count returned, searches/listings retarget immediately."""

    def test_flat_delete_where(self):
        idx, data, metas = _flat_corpus()
        expect = {i for i, m in enumerate(metas) if m and m["tag"] == "odd"}
        assert idx.delete_where({"tag": "odd"}) == len(expect)
        assert len(idx) == 64 - len(expect)
        for i in expect:
            assert idx.get_vector(i) is None
        # survivors intact, searchable, and the odd filter now matches 0
        assert idx.get_vector(0).text == "t0"
        assert idx.search_batch([data[1]], 5, COS, where={"tag": "odd"})[0] == []
        res = idx.search_batch([data[2]], 5, COS)[0]
        assert all(r.id not in expect for r in res)
        # repeat is a no-op
        assert idx.delete_where({"tag": "odd"}) == 0

    def test_flat_delete_where_match_all_and_invalid(self):
        from vectorlite_tpu.errors import InvalidFilter

        idx, _, _ = _flat_corpus(n=16)
        with pytest.raises(InvalidFilter):
            idx.delete_where({"$bogus": 1})
        assert len(idx) == 16
        assert idx.delete_where({}) == 16  # explicit match-all
        assert idx.is_empty()

    def test_flat_delete_where_triggers_compaction(self):
        n = 4096
        rng = np.random.default_rng(11)
        idx = FlatIndex(4)
        idx.add_batch_arrays(
            np.arange(n, dtype=np.uint64),
            rng.normal(size=(n, 4)),
            metadatas=[{"b": i % 4} for i in range(n)],
        )
        assert idx.delete_where({"b": {"$in": [0, 1, 2]}}) == 3 * n // 4
        assert len(idx) == n // 4
        # majority-dead corpus compacts: slot array shrank to live rows
        assert idx._size == n // 4
        res = idx.search_batch([np.ones(4)], 5, COS)[0]
        assert all(idx.get_vector(r.id).metadata == {"b": 3} for r in res)

    def test_hnsw_delete_where_and_compact(self):
        rng = np.random.default_rng(13)
        data = rng.normal(size=(40, 8))
        idx = HNSWIndex(8, COS, seed=4)
        idx.add_batch(
            [
                Vector(
                    id=i,
                    values=[float(x) for x in data[i]],
                    text=f"t{i}",
                    metadata={"g": i % 4},
                )
                for i in range(40)
            ]
        )
        assert idx.delete_where({"g": {"$gte": 2}}) == 20
        assert len(idx) == 20
        assert idx.search_batch([data[2]], 10, COS, where={"g": 2})[0] == []
        res = idx.search_batch([data[0]], 10, COS)[0]
        assert all(r.id % 4 < 2 for r in res)
        assert idx.delete_where({"g": {"$gte": 2}}) == 0
        # tombstones reclaimed by compact; results unchanged
        assert idx.compact() == 20
        res2 = idx.search_batch([data[0]], 10, COS)[0]
        assert {r.id for r in res2} == {r.id for r in res}

    def test_collection_delete_where_bumps_mutations(self):
        from vectorlite_tpu.store.collection import Collection

        idx, _, _ = _flat_corpus(n=20)
        c = Collection("c", idx)
        before = c.mutation_count()
        assert c.delete_where({"tag": "even"}) > 0
        assert c.mutation_count() > before


class TestMeshFiltered:
    def test_mesh_flat_filtered_matches_unsharded(self):
        import jax

        from vectorlite_tpu.dist.sharding import make_mesh

        mesh = make_mesh(jax.devices()[:8])
        rng = np.random.default_rng(8)
        n, d = 256, 16
        data = rng.normal(size=(n, d))
        metas = [{"p": i % 4} for i in range(n)]
        ids = np.arange(n, dtype=np.uint64)
        a = FlatIndex(d, mesh=mesh)
        b = FlatIndex(d)
        for idx in (a, b):
            idx.add_batch_arrays(ids, data, metadatas=metas)
        q = data[:4] + 1e-3
        where = {"p": {"$in": [1, 3]}}
        ra = a.search_batch(q, 6, COS, where=where)
        rb = b.search_batch(q, 6, COS, where=where)
        for x, y in zip(ra, rb):
            assert [r.id for r in x] == [r.id for r in y]


class TestHTTPFiltered:
    def _go(self, coro_fn):
        async def runner():
            app = create_app(VectorLiteClient(MockEmbeddingFunction(8)))
            async with TestClient(TestServer(app)) as tc:
                return await coro_fn(tc)

        return asyncio.run(runner())

    def test_search_with_where(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            for i, text in enumerate(["apple pie", "banana bread", "cherry"]):
                resp = await tc.post(
                    "/collections/c/text",
                    json={
                        "text": text,
                        "metadata": {"kind": "fruit" if i < 2 else "other"},
                    },
                )
                assert resp.status == 200
            resp = await tc.post(
                "/collections/c/search/text",
                json={
                    "query": "apple pie",
                    "k": 10,
                    "where": {"kind": "fruit"},
                },
            )
            assert resp.status == 200
            results = (await resp.json())["results"]
            assert {r["id"] for r in results} == {0, 1}
            assert all(r["metadata"]["kind"] == "fruit" for r in results)
            # batched route
            resp = await tc.post(
                "/collections/c/search/texts",
                json={
                    "queries": ["apple pie", "cherry"],
                    "where": {"kind": "other"},
                },
            )
            assert resp.status == 200
            batches = (await resp.json())["results"]
            assert [{r["id"] for r in b} for b in batches] == [{2}, {2}]

        self._go(go)

    def test_delete_where_route(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/texts",
                json={
                    "texts": [f"doc {i}" for i in range(6)],
                    "metadatas": [{"p": i % 2} for i in range(6)],
                },
            )
            assert resp.status == 200
            # where is required: a bare DELETE must never wipe
            resp = await tc.delete("/collections/c/vectors")
            assert resp.status == 400
            resp = await tc.delete("/collections/c/vectors?where=[1]")
            assert resp.status == 400
            resp = await tc.delete('/collections/c/vectors?where={"$oops":1}')
            assert resp.status == 400
            resp = await tc.delete('/collections/c/vectors?where={"p":1}')
            assert resp.status == 200
            assert (await resp.json())["deleted"] == 3
            resp = await tc.get("/collections/c/vectors")
            body = await resp.json()
            assert body["total"] == 3
            assert {v["id"] for v in body["vectors"]} == {0, 2, 4}
            # no matches left; unknown collection is a 404
            resp = await tc.delete('/collections/c/vectors?where={"p":1}')
            assert (await resp.json())["deleted"] == 0
            resp = await tc.delete('/collections/zz/vectors?where={"p":1}')
            assert resp.status == 404
            # explicit match-all clears the rest
            resp = await tc.delete("/collections/c/vectors?where={}")
            assert (await resp.json())["deleted"] == 3
            info = await (await tc.get("/collections/c")).json()
            assert info["info"]["count"] == 0

        self._go(go)

    def test_patch_metadata_route(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post(
                "/collections/c/text",
                json={"text": "apple", "metadata": {"kind": "old"}},
            )
            resp = await tc.patch(
                "/collections/c/vectors/0",
                json={"metadata": {"kind": "new"}},
            )
            assert resp.status == 200
            assert (await resp.json())["id"] == 0
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "apple", "where": {"kind": "new"}},
            )
            assert {r["id"] for r in (await resp.json())["results"]} == {0}
            # null clears
            resp = await tc.patch(
                "/collections/c/vectors/0", json={"metadata": None}
            )
            assert resp.status == 200
            resp = await tc.get("/collections/c/vectors/0")
            assert (await resp.json())["vector"]["metadata"] is None
            # missing field -> 400; missing vector/collection -> 404
            resp = await tc.patch("/collections/c/vectors/0", json={})
            assert resp.status == 400
            resp = await tc.patch(
                "/collections/c/vectors/99", json={"metadata": {}}
            )
            assert resp.status == 404
            resp = await tc.patch(
                "/collections/zz/vectors/0", json={"metadata": {}}
            )
            assert resp.status == 404

        self._go(go)

    def test_list_vectors_route(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            for i in range(5):
                await tc.post(
                    "/collections/c/text",
                    json={"text": f"d{i}", "metadata": {"p": i % 2}},
                )
            resp = await tc.get("/collections/c/vectors?limit=2&offset=1")
            body = await resp.json()
            assert resp.status == 200
            assert body["total"] == 5
            assert [v["id"] for v in body["vectors"]] == [1, 2]
            assert body["vectors"][0]["values"] == []  # light by default
            # filtered listing
            resp = await tc.get(
                '/collections/c/vectors?where={"p":1}&include_values=1'
            )
            body = await resp.json()
            assert body["total"] == 2
            assert [v["id"] for v in body["vectors"]] == [1, 3]
            assert len(body["vectors"][0]["values"]) > 0
            # bad where JSON / bad limit
            resp = await tc.get("/collections/c/vectors?where=notjson")
            assert resp.status == 400
            resp = await tc.get("/collections/c/vectors?limit=-1")
            assert resp.status == 400

        self._go(go)

    def test_list_vectors_hnsw_and_index_level(self):
        from vectorlite_tpu.errors import VectorNotFound  # noqa: F401

        rng = np.random.default_rng(3)
        data = rng.normal(size=(10, 8))
        idx = HNSWIndex(8, COS, seed=1)
        idx.add_batch(
            [
                Vector(
                    id=i,
                    values=[float(x) for x in data[i]],
                    text=f"t{i}",
                    metadata={"p": i % 2},
                )
                for i in range(10)
            ]
        )
        idx.delete(4)
        page, total = idx.list_vectors(0, 100, where={"p": 0})
        assert total == 4  # 0,2,6,8 (4 deleted)
        assert [v.id for v in page] == [0, 2, 6, 8]
        page, total = idx.list_vectors(1, 2)
        assert total == 9 and [v.id for v in page] == [1, 2]
        assert page[0].values == []
        page, _ = idx.list_vectors(0, 1, include_values=True)
        assert len(page[0].values) == 8

    def test_filter_stats_exposed(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            await tc.post(
                "/collections/c/text",
                json={"text": "a", "metadata": {"t": 1}},
            )
            for _ in range(2):
                await tc.post(
                    "/collections/c/search/text",
                    json={"query": "a", "where": {"t": 1}},
                )
            stats = await (await tc.get("/stats")).json()
            f = stats["filters"]
            assert f["lookups"] >= 2
            assert f["full_builds"] >= 1
            assert f["cache_hits"] >= 1

        self._go(go)

    def test_where_errors(self):
        async def go(tc):
            await tc.post(
                "/collections", json={"name": "c", "index_type": "flat"}
            )
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "x", "where": "not-an-object"},
            )
            assert resp.status == 400
            assert "Invalid filter" in (await resp.json())["message"]
            resp = await tc.post(
                "/collections/c/search/text",
                json={"query": "x", "where": {"f": {"$bogus": 1}}},
            )
            assert resp.status == 400
            body = await resp.json()
            assert body["message"].startswith("Invalid filter: unknown")

        self._go(go)
