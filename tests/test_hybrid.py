"""Hybrid search extension: BM25 inverted index + reciprocal-rank
fusion with the dense leg (the reference engine is dense-only)."""

import asyncio
import math
from collections import Counter

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vectorlite_tpu import SimilarityMetric, VectorLiteClient
from vectorlite_tpu.api.server import create_app
from vectorlite_tpu.embed.mock import MockEmbeddingFunction
from vectorlite_tpu.text.bm25 import B, K1, BM25Index, tokenize


def brute_bm25(docs: dict, query: str) -> dict:
    """Independent scalar BM25 (Lucene idf) over {id: text}, live docs
    only — the oracle for the vectorized implementation."""
    toks = {i: tokenize(t) for i, t in docs.items()}
    n = len(docs)
    if n == 0:
        return {}
    avgdl = max(sum(len(t) for t in toks.values()) / n, 1e-9)
    out = {}
    for q in set(tokenize(query)):
        df = sum(1 for t in toks.values() if q in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, t in toks.items():
            tf = Counter(t)[q]
            if tf == 0:
                continue
            dl = len(t)
            score = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
            out[i] = out.get(i, 0.0) + score
    return out


class TestBM25Index:
    def test_matches_brute_force(self, rng):
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        docs = {
            i: " ".join(rng.choice(vocab, size=rng.integers(1, 12)))
            for i in range(60)
        }
        idx = BM25Index()
        for i, t in docs.items():
            idx.add(i, t)
        for query in ("alpha beta", "zeta", "gamma gamma eps", "nohit"):
            want = brute_bm25(docs, query)
            got = dict(idx.search(query, 60))
            assert set(got) == {i for i, s in want.items() if s > 0}
            for i, s in got.items():
                assert s == pytest.approx(want[i], rel=1e-9)

    def test_updates_and_deletes_match_brute_force(self, rng):
        docs = {}
        idx = BM25Index()
        for step in range(300):
            op = rng.random()
            if op < 0.6 or not docs:
                i = int(rng.integers(0, 40))
                text = " ".join(
                    rng.choice(["x", "y", "z", "w"], size=rng.integers(1, 6))
                )
                docs[i] = text
                idx.add(i, text)  # re-add = replace
            else:
                i = int(rng.choice(list(docs)))
                del docs[i]
                idx.remove(i)
        assert len(idx) == len(docs)
        want = brute_bm25(docs, "x z")
        got = dict(idx.search("x z", 100))
        assert set(got) == {i for i, s in want.items() if s > 0}
        for i, s in got.items():
            assert s == pytest.approx(want[i], rel=1e-9)
        assert 0.0 <= idx.waste() < 1.0

    def test_ranking_and_ties(self):
        idx = BM25Index()
        idx.add(1, "quick brown fox")
        idx.add(2, "quick quick quick zebra")
        idx.add(3, "lazy dog")
        idx.add(4, "quick brown fox")  # exact duplicate of 1
        hits = idx.search("quick fox", 10)
        ids = [i for i, _ in hits]
        # both fox docs beat the quick-only doc; ties by ascending id
        assert ids[:2] == [1, 4]
        assert 2 in ids and 3 not in ids

    def test_filter_and_k(self):
        idx = BM25Index()
        for i in range(20):
            idx.add(i, "term common" if i % 2 else "other text")
        odd = idx.search("common", 5, lambda i: i % 4 == 1)
        assert len(odd) == 5
        assert all(i % 4 == 1 for i, _ in odd)
        assert idx.search("", 5) == []
        assert idx.search("common", 0) == []

    def test_unicode_casefold(self):
        idx = BM25Index()
        idx.add(1, "Straße zur Hölle")
        assert idx.search("strasse", 5)[0][0] == 1
        assert idx.search("HÖLLE", 5)[0][0] == 1

    def test_unicode_scripts_and_accents(self):
        """Non-Latin scripts tokenize (not the old ASCII-only [a-z0-9])
        and accents fold, so 'cafe' matches 'café'."""
        assert tokenize("Привет мир") == ["привет", "мир"]
        assert tokenize("café") == ["cafe"]
        assert tokenize("naïve approach") == ["naive", "approach"]
        idx = BM25Index()
        idx.add(1, "Привет мир")
        idx.add(2, "café reviews")
        idx.add(3, "plain ascii text")
        assert idx.search("привет", 5)[0][0] == 1
        assert idx.search("ПРИВЕТ", 5)[0][0] == 1
        assert idx.search("cafe", 5)[0][0] == 2
        assert idx.search("café", 5)[0][0] == 2

    def test_waste_and_total_docnums(self):
        idx = BM25Index()
        for i in range(4):
            idx.add(i, f"doc {i}")
        assert idx.total_docnums() == 4 and idx.waste() == 0.0
        idx.add(0, "doc zero again")  # re-index tombstones the old docnum
        idx.remove(1)
        assert idx.total_docnums() == 5
        assert idx.waste() == pytest.approx(2 / 5)
        assert len(idx) == 3


def vec_client(dim=16):
    return VectorLiteClient(MockEmbeddingFunction(dim))


DOCS = [
    "the quick brown fox jumps",  # 0
    "lazy dogs sleep all day",  # 1
    "quick quick zebra runs",  # 2
    "an unrelated document entirely",  # 3
    "fox dens and fox cubs",  # 4
]


class TestCollectionHybrid:
    def _fill(self, client):
        client.create_collection("h", "flat")
        for i, t in enumerate(DOCS):
            client.add_text_to_collection("h", t, {"i": i})

    def test_alpha_extremes(self):
        client = vec_client()
        self._fill(client)
        # alpha=1: dense-only ranking — query identical to a stored
        # text embeds identically, so it must come first
        hits = client.search_hybrid_in_collection(
            "h", DOCS[3], 3, alpha=1.0
        )
        assert hits[0].text == DOCS[3]
        # alpha=0: BM25-only ranking — "fox" docs first (4 has tf=2)
        hits = client.search_hybrid_in_collection("h", "fox", 5, alpha=0.0)
        assert [h.text for h in hits[:2]] == [DOCS[4], DOCS[0]]
        # fused scores are descending and in RRF range
        scores = [h.score for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert all(0 < s <= 2 / 60 + 1e-12 for s in scores)

    def test_keyword_only_doc_surfaces(self):
        """A doc sharing no embedding similarity with the query (mock
        embeddings are text-hash based) still surfaces via its exact
        term match — the point of hybrid."""
        client = vec_client()
        self._fill(client)
        hits = client.search_hybrid_in_collection("h", "zebra", 5)
        assert any(h.text == DOCS[2] for h in hits)

    def test_where_filter_applies_to_both_legs(self):
        client = vec_client()
        self._fill(client)
        hits = client.search_hybrid_in_collection(
            "h", "fox", 5, where={"i": {"$lte": 2}}
        )
        assert {h.text for h in hits} <= set(DOCS[:3])
        assert any(h.text == DOCS[0] for h in hits)

    def test_sidecar_tracks_mutations(self):
        client = vec_client()
        self._fill(client)
        # build the sidecar
        assert client.search_hybrid_in_collection("h", "fox", 5, alpha=0.0)
        col = client.get_collection("h")
        assert col._bm25 is not None and len(col._bm25) == 5
        # adds and deletes keep it live
        vid = client.add_text_to_collection("h", "fresh fox sighting")
        hits = client.search_hybrid_in_collection("h", "fresh", 3, alpha=0.0)
        assert hits and hits[0].id == vid
        client.delete_from_collection("h", vid)
        hits = client.search_hybrid_in_collection("h", "fresh", 3, alpha=0.0)
        assert all(h.id != vid for h in hits)
        # replace re-indexes under the same id
        client.update_text_in_collection("h", 0, "entirely new words")
        hits = client.search_hybrid_in_collection(
            "h", "entirely new words", 3, alpha=0.0
        )
        assert hits[0].id == 0
        # delete_where drops the sidecar; next search rebuilds
        client.delete_where_in_collection("h", {"i": {"$eq": 1}})
        assert col._bm25 is None
        hits = client.search_hybrid_in_collection("h", "lazy dogs", 5, alpha=0.0)
        assert all(h.id != 1 for h in hits)
        assert len(col._bm25) == col.get_info().count

    def test_min_score_and_k_zero(self):
        client = vec_client()
        self._fill(client)
        assert client.search_hybrid_in_collection("h", "fox", 0) == []
        hits = client.search_hybrid_in_collection(
            "h", "fox", 5, min_score=1.0
        )
        assert hits == []  # RRF scores are << 1

    def test_alpha_validation(self):
        client = vec_client()
        self._fill(client)
        with pytest.raises(ValueError):
            client.search_hybrid_in_collection("h", "fox", 3, alpha=1.5)

    def test_hybrid_on_hnsw(self):
        client = vec_client()
        client.create_collection(
            "hh", "hnsw", SimilarityMetric.COSINE
        )
        for i, t in enumerate(DOCS):
            client.add_text_to_collection("hh", t, {"i": i})
        hits = client.search_hybrid_in_collection("hh", "zebra", 3)
        assert any(h.text == DOCS[2] for h in hits)

    def test_sidecar_gc_on_update_churn(self, monkeypatch):
        """Update/delete churn tombstones docnums; past the waste
        threshold the sidecar is dropped (postings can't be compacted
        without the original texts) and the next hybrid search rebuilds
        it at live size."""
        from vectorlite_tpu.store import collection as col_mod

        monkeypatch.setattr(col_mod, "_BM25_DROP_MIN_DOCNUMS", 8)
        client = vec_client()
        self._fill(client)
        assert client.search_hybrid_in_collection("h", "fox", 5, alpha=0.0)
        col = client.get_collection("h")
        assert col._bm25 is not None
        # churn: each update kills one docnum and appends one
        for round_ in range(6):
            client.update_text_in_collection("h", 0, f"churn words {round_}")
            if col._bm25 is None:
                break
        assert col._bm25 is None  # GC fired before unbounded growth
        hits = client.search_hybrid_in_collection("h", "churn", 3, alpha=0.0)
        assert hits and hits[0].id == 0  # rebuilt, serving the live text
        assert col._bm25.total_docnums() == col.get_info().count

    def test_protocol_minimum_index_bulk_get(self):
        """A third-party index implementing only the documented
        protocol minimum get_vector(id) still serves Collection's bulk
        get (Collection detects the missing include_values kwarg by
        signature instead of TypeError-ing)."""
        from vectorlite_tpu.core.types import Vector
        from vectorlite_tpu.store.collection import Collection

        class MinimalIndex:
            def __init__(self):
                self._rows = {
                    i: Vector(id=i, values=[float(i)], text=f"t{i}",
                              metadata={"i": i})
                    for i in range(3)
                }

            def max_id(self):
                return max(self._rows)

            def get_vector(self, id):  # protocol-minimum signature
                return self._rows.get(int(id))

        col = Collection("third-party", MinimalIndex())
        got = col.get_vectors([2, 0, 99], include_values=False)
        assert [v.id for v in got] == [2, 0]
        assert col.get_vectors([1], where={"i": {"$eq": 1}})[0].text == "t1"

    def test_raw_vector_docs_register_empty(self):
        """Raw-vector inserts (no text) register as empty docs so the
        corpus stats stay aligned; they never match keywords."""
        client = vec_client()
        client.create_collection("rv", "flat")
        client.add_text_to_collection("rv", "real words here")
        assert client.search_hybrid_in_collection("rv", "words", 3, alpha=0.0)
        client.add_vectors_to_collection(
            "rv", np.random.default_rng(0).normal(size=(3, 16))
        )
        hits = client.search_hybrid_in_collection("rv", "words", 5, alpha=0.0)
        assert [h.id for h in hits] == [0]


class TestHybridHttp:
    def _serve(self, coro_fn):
        async def runner():
            app = create_app(vec_client())
            async with TestClient(TestServer(app)) as tc:
                await tc.post(
                    "/collections",
                    json={"name": "h", "index_type": "flat"},
                )
                await tc.post(
                    "/collections/h/texts", json={"texts": DOCS}
                )
                return await coro_fn(tc)

        return asyncio.run(runner())

    def test_route_happy_path(self):
        async def go(tc):
            resp = await tc.post(
                "/collections/h/search/hybrid",
                json={"query": "zebra", "k": 3, "alpha": 0.3},
            )
            assert resp.status == 200
            results = (await resp.json())["results"]
            assert any(r["text"] == DOCS[2] for r in results)
            for r in results:
                assert set(r) == {"id", "score", "text", "metadata"}

        self._serve(go)

    def test_route_validation(self):
        async def go(tc):
            for body, frag in (
                ({"query": "x", "alpha": 2}, "alpha"),
                ({"query": "x", "alpha": True}, "alpha"),
                # a ~10^400 JSON int overflows float(): 400, not 500
                ({"query": "x", "alpha": 10 ** 400}, "alpha"),
                ({"query": "x", "pool": 0}, "pool"),
                ({"query": "x", "pool": "big"}, "pool"),
                ({"k": 3}, "query"),
            ):
                resp = await tc.post(
                    "/collections/h/search/hybrid", json=body
                )
                assert resp.status == 400, body
                assert frag in (await resp.json())["message"].lower()
            resp = await tc.post(
                "/collections/nope/search/hybrid", json={"query": "x"}
            )
            assert resp.status == 404

        self._serve(go)
