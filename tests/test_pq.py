"""Product-quantization serving rung (kernels/pq.py + the FlatIndex
"pq" profile): ADC selection correctness, the exact-rescore contract,
and the capacity-ladder integration."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vectorlite_tpu.config import VectorLiteConfig
from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.core.types import Vector
from vectorlite_tpu.index.flat import FlatIndex
from vectorlite_tpu.kernels.pq import (
    encode_rows,
    pack_nibbles,
    pq_search_topk,
    pq_subspaces,
    train_codebooks,
)

M = SimilarityMetric
D = 64


@pytest.fixture(autouse=True)
def pq_env(monkeypatch):
    """Small gates so the rung engages at test scale, and force the
    device path (the host-f64 scan would otherwise serve everything)."""
    monkeypatch.setenv("VECTORLITE_PQ_MIN_ROWS", "1024")
    monkeypatch.setenv("VECTORLITE_PQ_TRAIN_SAMPLE", "2048")
    monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")


def corpus(n, d=D, seed=0):
    """Unit-norm clustered rows (embedding-like)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(32, d))
    rows = centers[rng.integers(0, 32, n)] + 0.6 * rng.normal(size=(n, d))
    return rows / np.linalg.norm(rows, axis=1, keepdims=True)


def exact_scores(rows, q, metric):
    if metric is M.DOT_PRODUCT:
        return rows @ q
    if metric is M.COSINE:
        denom = np.linalg.norm(rows, axis=1) * np.linalg.norm(q)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(denom > 0, (rows @ q) / np.maximum(denom, 1e-300), 0)
        return np.minimum(s, 1.0)
    if metric is M.EUCLIDEAN:
        return 1.0 / (1.0 + np.linalg.norm(rows - q, axis=1))
    return 1.0 / (1.0 + np.abs(rows - q).sum(axis=1))


class TestPQKernel:
    def test_pq_subspaces(self):
        assert pq_subspaces(384, 96) == 96
        assert pq_subspaces(384, 100) == 96  # largest divisor <= request
        assert pq_subspaces(64, 48) == 32
        assert pq_subspaces(10, 4) == 2
        assert pq_subspaces(7, 3) == 1

    def test_adc_equals_reconstruction_dot(self):
        rows = corpus(2048).astype(np.float32)
        cb = train_codebooks(rows, 16, iters=6)
        codes = np.asarray(encode_rows(cb, jnp.asarray(rows)))
        cbn = np.asarray(cb)
        recon = np.concatenate(
            [cbn[i][codes[:, i]] for i in range(16)], axis=1
        )
        q = corpus(4, seed=7).astype(np.float32)
        sq = np.einsum("nd,nd->n", rows, rows).astype(np.float32)
        s, idx = pq_search_topk(
            jnp.asarray(codes), cb, jnp.asarray(sq),
            jnp.asarray(np.ones(2048, bool)), jnp.asarray(q),
            metric=M.DOT_PRODUCT, k=5, chunk=512,
        )
        s, idx = np.asarray(s), np.asarray(idx)
        want = q @ recon.T  # ADC dot == reconstruction dot by definition
        for b in range(4):
            np.testing.assert_allclose(
                s[b], np.sort(want[b])[::-1][:5], rtol=1e-4
            )

    def test_chunking_is_invisible(self):
        """Streamed top-k merge returns the same winners regardless of
        chunk size (incl. a non-dividing chunk that forces padding)."""
        rows = corpus(1000).astype(np.float32)
        cb = train_codebooks(rows, 8, iters=4)
        codes = encode_rows(cb, jnp.asarray(rows))
        sq = jnp.asarray(
            np.einsum("nd,nd->n", rows, rows).astype(np.float32)
        )
        valid = jnp.asarray(np.ones(1000, bool))
        q = jnp.asarray(corpus(3, seed=9).astype(np.float32))
        ref = None
        # 4 < k exercises the chunk>=k clamp (a narrower chunk would
        # silently drop winners clustered in one chunk)
        for chunk in (1000, 256, 192, 64, 4):
            s, idx = pq_search_topk(
                codes, cb, sq, valid, q,
                metric=M.EUCLIDEAN, k=10, chunk=chunk,
            )
            got = (np.asarray(s), np.asarray(idx))
            if ref is None:
                ref = got
            else:
                np.testing.assert_allclose(ref[0], got[0], rtol=1e-5)
                np.testing.assert_array_equal(ref[1], got[1])

    def test_validity_mask_and_padding(self):
        rows = corpus(300).astype(np.float32)
        cb = train_codebooks(rows, 8, iters=4)
        codes = encode_rows(cb, jnp.asarray(rows))
        sq = jnp.asarray(
            np.einsum("nd,nd->n", rows, rows).astype(np.float32)
        )
        valid = np.ones(300, bool)
        valid[::2] = False  # half tombstoned
        s, idx = pq_search_topk(
            codes, cb, sq, jnp.asarray(valid),
            jnp.asarray(rows[:2]), metric=M.COSINE, k=20, chunk=128,
        )
        idx = np.asarray(idx)
        assert (idx % 2 == 1).all()  # only odd (valid) slots return
        assert np.isfinite(np.asarray(s)).all()

    @pytest.mark.parametrize(
        "metric", [M.COSINE, M.DOT_PRODUCT, M.EUCLIDEAN, M.MANHATTAN]
    )
    def test_pool_recall_all_metrics(self, metric):
        """The wide ADC pool captures the true top-k (the contract the
        index's exact rescore builds on)."""
        n, k, pool = 4096, 10, 256
        rows = corpus(n)
        rows32 = rows.astype(np.float32)
        m = pq_subspaces(D, D // 4)
        cb = train_codebooks(rows32[:2048], m, iters=8)
        codes = encode_rows(cb, jnp.asarray(rows32))
        sq = jnp.asarray(
            np.einsum("nd,nd->n", rows32, rows32).astype(np.float32)
        )
        valid = jnp.asarray(np.ones(n, bool))
        rng = np.random.default_rng(3)
        q = rows[rng.integers(0, n, 8)] + 0.02 * rng.normal(size=(8, D))
        q32 = q.astype(np.float32)
        _, idx = pq_search_topk(
            codes, cb, sq, valid, jnp.asarray(q32),
            metric=metric, k=pool, chunk=1024,
        )
        idx = np.asarray(idx)
        recalls = []
        for b in range(8):
            true = np.argsort(-exact_scores(rows, q[b], metric))[:k]
            recalls.append(len(set(true) & set(idx[b])) / k)
        assert np.mean(recalls) >= 0.9, (metric, recalls)


class TestPQPallasParity:
    """The fused Pallas rank kernel (interpret mode on CPU) against the
    XLA one-hot formulation: the LUT permutation, nibble decode, lane
    padding, surrogate, and validity mask must rank identically."""

    def _build(self, n, *, packed, metric, seed=0):
        rows = corpus(n, seed=seed).astype(np.float32)
        m = pq_subspaces(D, D // 2)  # dsub=2 -> M=32, 4-bit geometry
        cb = train_codebooks(rows[: min(n, 2048)], m, kc=16, iters=4)
        codes = encode_rows(cb, jnp.asarray(rows))
        if packed:
            codes = pack_nibbles(codes)
        sq = jnp.asarray(np.einsum("nd,nd->n", rows, rows))
        return rows, cb, codes, sq

    @pytest.mark.parametrize(
        "metric", [M.COSINE, M.DOT_PRODUCT, M.EUCLIDEAN, M.MANHATTAN]
    )
    @pytest.mark.parametrize("packed", [True, False])
    def test_rank_matrix_parity(self, metric, packed):
        """Direct [B, chunk] rank parity (the surgical check: any
        permutation/decode/padding bug shifts whole columns)."""
        from vectorlite_tpu.kernels.pq import (
            NEG_INF,
            _adc_lut,
            _lut_flat_pallas,
            _pallas_chunk_rank,
            _rank_surrogate,
        )

        n, b = 256, 4
        rows, cb, codes, sq = self._build(n, packed=packed, metric=metric)
        q = jnp.asarray(corpus(b, seed=5).astype(np.float32))
        valid = np.ones(n, bool)
        valid[7] = valid[130] = False
        validj = jnp.asarray(valid)

        lut = _adc_lut(q, cb, metric)
        neg = metric is M.MANHATTAN
        lut3 = (-lut if neg else lut).astype(jnp.bfloat16)
        kc = cb.shape[1]
        ms = codes.shape[1]
        ms_pad = -(-ms // 128) * 128
        cc = jnp.pad(codes, ((0, 0), (0, ms_pad - ms)))
        got = _pallas_chunk_rank(
            _lut_flat_pallas(lut3, packed=packed),
            cc, sq, validj,
            metric=metric, kc=kc, packed=packed, tile_n=128,
            interpret=True,
        )

        # XLA formulation (pq_search_topk's select_chunk body)
        from vectorlite_tpu.kernels.pq import _unpack_nibbles

        u = _unpack_nibbles(codes) if packed else codes
        oh = (
            (u[:, :, None] == jnp.arange(kc, dtype=jnp.uint8))
            .astype(jnp.bfloat16)
            .reshape(n, -1)
        )
        adc = jax.lax.dot_general(
            lut3.reshape(b, -1), oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        want = adc if neg else _rank_surrogate(adc, metric, sq)
        want = jnp.where(validj[None, :], want, NEG_INF)

        got, want = np.asarray(got), np.asarray(want)
        assert got.shape == want.shape == (b, n)
        np.testing.assert_array_equal(
            got == -np.inf, want == -np.inf
        )
        fin = want != -np.inf
        np.testing.assert_allclose(
            got[fin], want[fin], rtol=2e-5, atol=2e-5
        )

    def test_search_topk_end_to_end_parity(self):
        """pq_search_topk(pallas=True) returns the same winners as the
        XLA path (deterministic with a fixed seed; the shared exact-f32
        stage re-ranks both pools)."""
        n = 512
        rows, cb, codes, sq = self._build(
            n, packed=True, metric=M.COSINE
        )
        q = jnp.asarray(corpus(6, seed=11).astype(np.float32))
        valid = jnp.asarray(np.ones(n, bool))
        kw = dict(metric=M.COSINE, k=10, chunk=256, packed=True)
        s0, i0 = pq_search_topk(codes, cb, sq, valid, q, **kw)
        s1, i1 = pq_search_topk(
            codes, cb, sq, valid, q,
            pallas=True, tile_n=128, interpret=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-6
        )

    def test_kc256_falls_back_to_xla(self):
        """The 8-bit profile (kc=256) must ignore the pallas flag (the
        expanded operand would blow VMEM); results stay identical."""
        n = 256
        rows = corpus(n).astype(np.float32)
        m = pq_subspaces(D, D // 4)
        cb = train_codebooks(rows, m, kc=256, iters=2)
        codes = encode_rows(cb, jnp.asarray(rows))
        sq = jnp.asarray(np.einsum("nd,nd->n", rows, rows))
        valid = jnp.asarray(np.ones(n, bool))
        q = jnp.asarray(rows[:2])
        kw = dict(metric=M.EUCLIDEAN, k=5, chunk=256)
        s0, i0 = pq_search_topk(codes, cb, sq, valid, q, **kw)
        s1, i1 = pq_search_topk(
            codes, cb, sq, valid, q,
            pallas=True, tile_n=128, interpret=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


class TestFlatIndexPQ:
    def _fill(self, index, n, seed=0):
        rows = corpus(n, seed=seed)
        index.add_batch_arrays(list(range(n)), rows)
        return rows

    def test_below_gate_serves_f32_exact(self):
        index = FlatIndex(D, device_dtype="pq")
        rows = self._fill(index, 512)
        assert not index._pq_active
        got = index.search(rows[5], 3, M.COSINE)
        assert got[0].id == 5 and got[0].score == pytest.approx(1.0)
        assert index._dev_codes is None

    def test_active_pq_scores_are_exact_f64(self):
        """Selection is approximate; returned SCORES must match the
        scalar f64 formulas exactly (the rescore contract)."""
        index = FlatIndex(D, device_dtype="pq")
        rows = self._fill(index, 2048)
        for metric in (M.COSINE, M.EUCLIDEAN, M.DOT_PRODUCT, M.MANHATTAN):
            got = index.search(rows[17], 5, metric)
            assert index._pq_active
            for r in got:
                want = exact_scores(
                    rows[r.id : r.id + 1], rows[17], metric
                )[0]
                assert r.score == pytest.approx(want, abs=1e-12), metric

    def test_recall_vs_exact_index(self):
        index = FlatIndex(D, device_dtype="pq")
        exact = FlatIndex(D)  # auto profile; CPU -> f32 exact
        rows = self._fill(index, 4096)
        exact.add_batch_arrays(list(range(4096)), rows)
        rng = np.random.default_rng(11)
        hits = 0
        for qi in rng.integers(0, 4096, 8):
            q = rows[qi] + 0.02 * rng.normal(size=D)
            got = {r.id for r in index.search(q, 10, M.COSINE)}
            want = {r.id for r in exact.search(q, 10, M.COSINE)}
            hits += len(got & want)
        assert hits / 80 >= 0.85

    def test_appends_after_activation_searchable(self):
        index = FlatIndex(D, device_dtype="pq")
        rows = self._fill(index, 2048)
        assert index.search(rows[0], 1, M.COSINE)  # activates
        assert index._pq_active
        fresh = corpus(8, seed=42)
        index.add_batch_arrays(list(range(5000, 5008)), fresh)
        got = index.search(fresh[3], 1, M.COSINE)
        assert got[0].id == 5003 and got[0].score == pytest.approx(1.0)

    def test_delete_and_filtered_search(self):
        index = FlatIndex(D, device_dtype="pq")
        rows = corpus(2048)
        index.add_batch_arrays(
            list(range(2048)), rows,
            metadatas=[{"par": i % 2} for i in range(2048)],
        )
        index.delete(7)
        got = index.search(rows[7], 3, M.COSINE)
        assert all(r.id != 7 for r in got)
        got = index.search(
            rows[8], 5, M.COSINE, where={"par": {"$eq": 0}}
        )
        assert got and all(r.id % 2 == 0 for r in got)
        assert got[0].id == 8

    def test_capacity_growth_retrains(self):
        index = FlatIndex(D, device_dtype="pq")
        self._fill(index, 2048)
        index.search(corpus(1, seed=1)[0], 1, M.COSINE)
        cb_before = index._dev_codebooks
        assert cb_before is not None
        # force a capacity doubling
        index.add_batch_arrays(
            list(range(10_000, 10_000 + 3000)), corpus(3000, seed=5)
        )
        index.search(corpus(1, seed=2)[0], 1, M.COSINE)
        assert index._dev_codebooks is not cb_before  # retrained

    def test_pool_floor_frozen_at_build(self, monkeypatch):
        """The _selection_k pool floor keys off the LIVE cache's code
        width, frozen at wholesale build: flipping VECTORLITE_PQ_BITS
        afterwards (e.g. a bench harness mutating env) must not shrink
        the 4-bit profile's 256 floor to 8-bit's 128 — measured pool
        recall@10 drops 0.975 -> 0.906 if it does."""
        index = FlatIndex(D, device_dtype="pq")
        self._fill(index, 2048)
        index.search(corpus(1, seed=1)[0], 1, M.COSINE)
        assert index._pq_bits_active == 4
        floor_before = index._selection_k(1, False)
        monkeypatch.setenv("VECTORLITE_PQ_BITS", "8")
        assert index._selection_k(1, False) == floor_before == 256

    def test_rotation_rescues_anisotropic_recall(self, monkeypatch):
        """OPQ-lite: on an eigen-decay (real-embedding-like) corpus the
        default rotation must clearly beat plain PQ (measured 0.76 ->
        1.0 at 384-d; thresholds here are conservative)."""
        rng = np.random.default_rng(0)
        n, d = 4096, 128
        basis, _ = np.linalg.qr(rng.normal(size=(d, d)))
        spec = 1.0 / np.arange(1, d + 1) ** 0.7
        rows = rng.normal(size=(n, d)) @ (basis * spec)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        q = rows[rng.integers(0, n, 8)] + 0.02 * rng.normal(size=(8, d))
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        def recall(rotate):
            monkeypatch.setenv("VECTORLITE_PQ_ROTATE", rotate)
            index = FlatIndex(d, device_dtype="pq")
            index.add_batch_arrays(list(range(n)), rows)
            hits = 0
            for b in range(8):
                got = {r.id for r in index.search(q[b], 10, M.COSINE)}
                true = set(np.argsort(-(rows @ q[b]))[:10])
                hits += len(got & true)
            return hits / 80

        plain, rotated = recall("0"), recall("1")
        assert rotated >= 0.9
        assert rotated >= plain

    def test_manhattan_under_rotation_uses_invariant_proxy(
        self, monkeypatch
    ):
        """With rotation active, manhattan selection rides the
        rotation-invariant euclidean ADC proxy (rotated-L1 ranks a
        different geometry); final scores stay exact L1."""
        monkeypatch.setenv("VECTORLITE_PQ_ROTATE", "1")
        rng = np.random.default_rng(1)
        n, d = 4096, 128
        basis, _ = np.linalg.qr(rng.normal(size=(d, d)))
        spec = 1.0 / np.arange(1, d + 1) ** 0.7
        rows = rng.normal(size=(n, d)) @ (basis * spec)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        index = FlatIndex(d, device_dtype="pq")
        index.add_batch_arrays(list(range(n)), rows)
        q = rows[rng.integers(0, n, 8)] + 0.02 * rng.normal(size=(8, d))
        hits = 0
        for b in range(8):
            got = index.search(q[b], 10, M.MANHATTAN)
            true_l1 = np.abs(rows - q[b]).sum(axis=1)
            true = set(np.argsort(true_l1)[:10])
            hits += len({r.id for r in got} & true)
            # scores are exact L1 similarities regardless of the proxy
            for r in got:
                want = 1.0 / (1.0 + np.abs(rows[r.id] - q[b]).sum())
                assert r.score == pytest.approx(want, abs=1e-12)
        assert hits / 80 >= 0.7

    # mesh + pq parity lives in tests/test_dist.py
    # (TestMeshFlatIndex.test_pq_profile_on_mesh)

    def test_client_pq_profile(self):
        from vectorlite_tpu import VectorLiteClient
        from vectorlite_tpu.embed.mock import MockEmbeddingFunction

        client = VectorLiteClient(
            MockEmbeddingFunction(D),
            config=VectorLiteConfig.profile("pq"),
        )
        client.create_collection("c", "flat")
        col = client.get_collection("c")
        assert col._index._pq
        client.add_texts_to_collection("c", [f"doc {i}" for i in range(8)])
        hits = client.search_text_in_collection(
            "c", "doc 3", 2, M.COSINE
        )
        assert hits[0].text == "doc 3"
