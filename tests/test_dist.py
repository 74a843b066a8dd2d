"""Distributed (mesh-sharded) search tests on the 8-virtual-device CPU mesh.

The reference has no distributed backend (SURVEY §2); this layer is the
TPU-native scale-out: corpus rows sharded over a 1-D mesh, per-shard
top-k, all-gather merge over ICI. Tests verify exactness of the merge
against the single-device kernel.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.core.types import Vector
from vectorlite_tpu.dist.sharding import (
    make_mesh,
    shard_corpus,
    sharded_search_topk,
    update_rows_sharded,
)
from vectorlite_tpu.index.flat import FlatIndex
from vectorlite_tpu.kernels.topk import search_topk


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


@pytest.mark.parametrize(
    "metric",
    [
        SimilarityMetric.COSINE,
        SimilarityMetric.EUCLIDEAN,
        SimilarityMetric.DOT_PRODUCT,
        SimilarityMetric.MANHATTAN,
    ],
)
def test_sharded_matches_single_device(metric, mesh, rng):
    n, d, b, k = 1024, 64, 8, 10
    values = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.asarray(rng.random(n) > 0.1)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

    s_ref, i_ref = search_topk(
        values, sqnorms, valid, queries, metric=metric, k=k
    )
    sv, ss, svd = shard_corpus(mesh, values, sqnorms, valid)
    s_sh, i_sh = sharded_search_topk(
        sv, ss, svd, queries, metric=metric, k=k, mesh=mesh
    )
    assert np.array_equal(np.asarray(i_sh), np.asarray(i_ref))
    np.testing.assert_allclose(
        np.asarray(s_sh), np.asarray(s_ref), rtol=1e-5, atol=1e-6
    )


def test_sharded_tie_break_global_row_order(mesh, rng):
    n, d, b, k = 1024, 32, 8, 4
    base = rng.normal(size=d).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32) * 10
    for row in (5, 400, 900):  # rows on different shards
        data[row] = base
    values = jnp.asarray(data)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(n, dtype=bool)
    queries = jnp.asarray(np.repeat(base[None, :], b, axis=0))
    sv, ss, svd = shard_corpus(mesh, values, sqnorms, valid)
    s, i = sharded_search_topk(
        sv, ss, svd, queries, metric=SimilarityMetric.COSINE, k=k, mesh=mesh
    )
    assert list(np.asarray(i)[0][:3]) == [5, 400, 900]


def test_update_rows_sharded_scatter(mesh, rng):
    # the incremental insert path: a replicated row block lands on the
    # right shards without re-placing the corpus
    cap, d = 64, 8
    base = rng.normal(size=(cap, d)).astype(np.float32)
    buf = jax.device_put(
        base.copy(),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("shard", None)
        ),
    )
    rows = rng.normal(size=(5, d)).astype(np.float32)
    start = 6  # straddles the shard-0/shard-1 boundary (8 rows/shard)
    out = update_rows_sharded(buf, jnp.asarray(rows), start, mesh=mesh)
    expect = base.copy()
    expect[start : start + 5] = rows
    np.testing.assert_array_equal(np.asarray(out), expect)


def _mk_vectors(data, id_step=1):
    return [
        Vector(id=i * id_step, values=list(map(float, row)), text=f"t{i}")
        for i, row in enumerate(data)
    ]


class TestMeshFlatIndex:
    """FlatIndex(mesh=...): full index semantics over a sharded device
    cache — the multi-chip serving path (VERDICT round-1 item 2)."""

    def _pair(self, d, mesh, **kw):
        return FlatIndex(d, mesh=mesh, **kw), FlatIndex(d, **kw)

    def test_parity_with_single_device(self, mesh, rng):
        n, d, k = 500, 32, 5
        data = rng.normal(size=(n, d))
        sharded, single = self._pair(d, mesh)
        for idx in (sharded, single):
            for v in _mk_vectors(data, id_step=7):
                idx.add(v)
        q = rng.normal(size=(9, d))
        for metric in SimilarityMetric:
            ids_s, sc_s = sharded.search_batch_arrays(q, k, metric)
            ids_1, sc_1 = single.search_batch_arrays(q, k, metric)
            assert np.array_equal(ids_s, ids_1), metric
            np.testing.assert_allclose(sc_s, sc_1, rtol=1e-5, atol=1e-6)

    def test_mesh_amk_matches_exact(self, mesh, rng):
        """Mesh speed mode (sharded_search_amk): per-shard ApproxTopK +
        exact-f32 rescore must agree with the per-shard exact kernel on
        CPU, where approx_max_k's fallback is exact selection — any
        divergence is a merge/offset/rescore bug, not approximation."""
        n, d, k = 640, 32, 7
        data = rng.normal(size=(n, d))
        idx = FlatIndex(d, mesh=mesh)
        idx.add_batch_arrays(
            np.arange(n) * 3, data, texts=[f"t{i}" for i in range(n)]
        )
        q = rng.normal(size=(6, d))
        for metric in (
            SimilarityMetric.COSINE,
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.DOT_PRODUCT,
        ):
            ids_a, sc_a = idx.search_batch_arrays(
                q, k, metric, approx=True
            )
            ids_e, sc_e = idx.search_batch_arrays(
                q, k, metric, approx=False
            )
            assert np.array_equal(ids_a, ids_e), metric
            np.testing.assert_allclose(
                sc_a, sc_e, rtol=1e-5, atol=1e-6
            )

    def test_mesh_amk_kernel_parity(self, mesh, rng):
        """Kernel-level: sharded_search_amk vs sharded_search_topk on
        identical sharded buffers, incl. invalid rows."""
        from vectorlite_tpu.dist.sharding import sharded_search_amk

        n, d, b, k = 1024, 48, 8, 10
        values = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        sqnorms = jnp.sum(values * values, axis=-1)
        valid = jnp.asarray(rng.random(n) > 0.15)
        queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        sv, ss, svd = shard_corpus(mesh, values, sqnorms, valid)
        for metric in (
            SimilarityMetric.COSINE,
            SimilarityMetric.DOT_PRODUCT,
        ):
            s_ref, i_ref = sharded_search_topk(
                sv, ss, svd, queries, metric=metric, k=k, mesh=mesh
            )
            s_amk, i_amk = sharded_search_amk(
                sv,
                sv,
                ss,
                svd,
                queries,
                metric=metric,
                k=k,
                k_sel=64,
                recall_target=0.99,
                mesh=mesh,
            )
            assert np.array_equal(np.asarray(i_amk), np.asarray(i_ref))
            np.testing.assert_allclose(
                np.asarray(s_amk), np.asarray(s_ref), rtol=1e-5, atol=1e-6
            )

    def test_mesh_amk_watermark_fast_path(self, mesh, rng):
        """tombstones=False + live_hi: each shard derives its local
        watermark from the replicated global scalar; results must match
        the validity-gather path on a contiguous live prefix."""
        from vectorlite_tpu.dist.sharding import sharded_search_amk

        n, live, d, b, k = 1024, 577, 48, 8, 10
        values = rng.normal(size=(n, d)).astype(np.float32)
        values[live:] = 0.0
        valid = np.zeros(n, bool)
        valid[:live] = True
        values = jnp.asarray(values)
        sqnorms = jnp.sum(values * values, axis=-1)
        queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        sv, ss, svd = shard_corpus(
            mesh, values, sqnorms, jnp.asarray(valid)
        )
        for metric in (
            SimilarityMetric.COSINE,
            SimilarityMetric.EUCLIDEAN,
        ):
            s_ref, i_ref = sharded_search_amk(
                sv, sv, ss, svd, queries,
                metric=metric, k=k, k_sel=64,
                recall_target=0.99, mesh=mesh,
            )
            s_fp, i_fp = sharded_search_amk(
                sv, sv, ss, svd, queries,
                metric=metric, k=k, k_sel=64,
                recall_target=0.99, mesh=mesh,
                tombstones=False, live_hi=jnp.int32(live),
            )
            assert np.array_equal(np.asarray(i_fp), np.asarray(i_ref))
            np.testing.assert_allclose(
                np.asarray(s_fp), np.asarray(s_ref), rtol=1e-5, atol=1e-6
            )

    def test_delete_and_incremental_insert(self, mesh, rng):
        n, d = 300, 16
        data = rng.normal(size=(n, d))
        idx = FlatIndex(d, mesh=mesh)
        for v in _mk_vectors(data[:200]):
            idx.add(v)
        # first search places the corpus; later ops must not re-place
        idx.search_batch_arrays(data[:2], 3, SimilarityMetric.COSINE)
        placed = idx._dev_values
        idx.delete(5)
        idx.delete(999999)  # absent id: succeeds (reference retain)
        for i in range(200, 300):
            idx.add(Vector(id=i, values=list(map(float, data[i])), text=""))
        ids, scores = idx.search_batch_arrays(
            data[250:252], 2, SimilarityMetric.EUCLIDEAN
        )
        assert list(ids[:, 0]) == [250, 251]
        assert idx._dev_values is not placed  # donated/updated, not stale
        ids, _ = idx.search_batch_arrays(
            data[5:6], 1, SimilarityMetric.EUCLIDEAN
        )
        assert ids[0, 0] != 5  # tombstoned row never returned
        assert len(idx) == 299

    def test_growth_across_capacity(self, mesh, rng):
        d = 16
        idx = FlatIndex(d, mesh=mesh)
        data = rng.normal(size=(600, d))
        for i in range(300):
            idx.add(Vector(id=i, values=list(map(float, data[i])), text=""))
        idx.search_batch_arrays(data[:4], 2, SimilarityMetric.COSINE)
        for i in range(300, 600):  # forces a regrow past 512
            idx.add(Vector(id=i, values=list(map(float, data[i])), text=""))
        ids, _ = idx.search_batch_arrays(
            data[590:592], 1, SimilarityMetric.COSINE
        )
        assert list(ids[:, 0]) == [590, 591]
        assert idx._capacity % mesh.devices.size == 0

    def test_quantized_profile_on_mesh(self, mesh, rng):
        n, d, k = 400, 24, 4
        data = rng.normal(size=(n, d))
        sharded = FlatIndex(d, mesh=mesh, device_dtype="int8")
        single = FlatIndex(d, device_dtype="int8")
        for idx in (sharded, single):
            for v in _mk_vectors(data):
                idx.add(v)
        q = rng.normal(size=(3, d))
        ids_s, sc_s = sharded.search_batch_arrays(
            q, k, SimilarityMetric.COSINE
        )
        ids_1, sc_1 = single.search_batch_arrays(
            q, k, SimilarityMetric.COSINE
        )
        # both paths re-score winners in exact f64, so scores agree tightly
        assert np.array_equal(ids_s, ids_1)
        np.testing.assert_allclose(sc_s, sc_1, rtol=1e-9, atol=1e-12)

    def test_pq_profile_on_mesh(self, mesh, rng, monkeypatch):
        """Sharded streaming ADC + all-gather merge must return exactly
        what the single-chip PQ path returns (same codebooks, same
        rotation — both deterministic; ADC scores are shard-independent
        so the merge is order-exact over the candidate union)."""
        monkeypatch.setenv("VECTORLITE_PQ_MIN_ROWS", "1024")
        monkeypatch.setenv("VECTORLITE_PQ_TRAIN_SAMPLE", "1024")
        monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")
        n, d, k = 2048, 32, 5
        data = rng.normal(size=(n, d))
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        sharded = FlatIndex(d, mesh=mesh, device_dtype="pq")
        single = FlatIndex(d, device_dtype="pq")
        for idx in (sharded, single):
            idx.add_batch_arrays(list(range(n)), data)
        q = data[rng.integers(0, n, 3)] + 0.01 * rng.normal(size=(3, d))
        for metric in (
            SimilarityMetric.COSINE,
            SimilarityMetric.MANHATTAN,
        ):
            ids_s, sc_s = sharded.search_batch_arrays(q, k, metric)
            ids_1, sc_1 = single.search_batch_arrays(q, k, metric)
            assert sharded._pq_active and single._pq_active
            assert np.array_equal(ids_s, ids_1), metric
            np.testing.assert_allclose(
                sc_s, sc_1, rtol=1e-9, atol=1e-12
            )
        # mesh appends ride the sharded scatter path
        fresh = rng.normal(size=(4, d))
        fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
        sharded.add_batch_arrays([9000, 9001, 9002, 9003], fresh)
        ids, sc = sharded.search_batch_arrays(
            fresh[2:3], 1, SimilarityMetric.COSINE
        )
        assert ids[0, 0] == 9002 and sc[0, 0] == pytest.approx(1.0)
        # deletes flip the sharded mask
        sharded.delete(9002)
        ids, _ = sharded.search_batch_arrays(
            fresh[2:3], 1, SimilarityMetric.COSINE
        )
        assert ids[0, 0] != 9002

    def test_compaction_on_mesh(self, mesh, rng):
        d = 8
        idx = FlatIndex(d, mesh=mesh)
        data = rng.normal(size=(2000, d))
        for i in range(2000):
            idx.add(Vector(id=i, values=list(map(float, data[i])), text=""))
        idx.search_batch_arrays(data[:1], 1, SimilarityMetric.COSINE)
        for i in range(0, 2000, 2):  # tombstone half -> triggers compaction
            idx.delete(i)
        ids, _ = idx.search_batch_arrays(
            data[1001:1002], 1, SimilarityMetric.EUCLIDEAN
        )
        assert ids[0, 0] == 1001
        assert len(idx) == 1000

    def test_vlc_roundtrip_keeps_mesh(self, mesh, rng, tmp_path):
        from vectorlite_tpu.persist.vlc import (
            load_collection_from_file,
            save_collection_to_file,
        )
        from vectorlite_tpu.store.collection import Collection

        d = 12
        data = rng.normal(size=(50, d))
        idx = FlatIndex(d, mesh=mesh)
        for v in _mk_vectors(data):
            idx.add(v)
        save_collection_to_file(Collection("m", idx), tmp_path / "m.vlc")
        loaded = load_collection_from_file(tmp_path / "m.vlc", mesh=mesh)
        with loaded.index_read() as li:
            assert li._mesh is mesh
            res = li.search(list(map(float, data[3])), 1,
                            SimilarityMetric.COSINE)
            assert res[0].id == 3


class TestMeshHNSW:
    """Replicated-graph query-sharded beam (dist/hnsw_mesh.py): per-query
    results must be IDENTICAL to the single-chip device beam — sharding
    the batch axis cannot change any query's search."""

    def _build(self, rng, mesh=None, n=512, d=32):
        from vectorlite_tpu.index.hnsw import HNSWIndex

        data = rng.normal(size=(n, d)).astype(np.float32)
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        idx = HNSWIndex(
            d, SimilarityMetric.COSINE, mesh=mesh, native=False, seed=7
        )
        idx.add_batch(
            [
                Vector(id=i, values=[float(x) for x in data[i]], text="")
                for i in range(n)
            ]
        )
        return idx, data

    def test_mesh_beam_matches_single_chip(self, mesh, rng):
        idx_mesh, data = self._build(rng, mesh=mesh)
        idx_one, _ = self._build(
            np.random.default_rng(0), mesh=None
        )  # same seed stream for data
        # rebuild both from identical data: use the same rng draw
        rng_a = np.random.default_rng(123)
        idx_mesh, data = self._build(rng_a, mesh=mesh)
        rng_b = np.random.default_rng(123)
        idx_one, _ = self._build(rng_b, mesh=None)

        q = [list(map(float, data[i] + 1e-3)) for i in range(16)]
        res_mesh = idx_mesh.search_batch(
            q, 5, SimilarityMetric.COSINE, ef=32, use_device=True
        )
        res_one = idx_one.search_batch(
            q, 5, SimilarityMetric.COSINE, ef=32, use_device=True
        )
        for rm, ro in zip(res_mesh, res_one):
            assert [r.id for r in rm] == [r.id for r in ro]
            np.testing.assert_allclose(
                [r.score for r in rm], [r.score for r in ro], rtol=1e-6
            )

    def test_non_pow2_mesh_batch_padding(self, rng):
        """make_mesh accepts any device count; batch padding must round
        up to a MULTIPLE of the mesh size, not max() with it (b_pad=4 on
        a 3-device mesh tripped mesh_beam_search's divisibility check —
        round-3 self-review finding)."""
        mesh3 = make_mesh(jax.devices()[:3])
        idx, data = self._build(rng, mesh=mesh3, n=256)
        q = [list(map(float, data[i] + 1e-3)) for i in range(4)]
        res = idx.search_batch(
            q, 5, SimilarityMetric.COSINE, ef=32, use_device=True
        )
        assert len(res) == 4
        assert all(len(r) == 5 for r in res)

    def test_mesh_beam_recall_vs_truth(self, mesh, rng):
        idx, data = self._build(rng, mesh=mesh)
        b, k = 8, 5
        q = data[:b] + 1e-3
        truth = np.argsort(
            -(q @ data.T)
            / (
                np.linalg.norm(q, axis=1, keepdims=True)
                * np.linalg.norm(data, axis=1)[None, :]
            ),
            axis=1,
        )[:, :k]
        res = idx.search_batch(
            [list(map(float, row)) for row in q],
            k,
            SimilarityMetric.COSINE,
            ef=64,
            use_device=True,
        )
        recall = np.mean(
            [
                len({r.id for r in row} & set(truth[i])) / k
                for i, row in enumerate(res)
            ]
        )
        assert recall >= 0.9, recall

    def test_mesh_batch_padding(self, mesh, rng):
        # batch smaller than the mesh pads to mesh size transparently
        idx, data = self._build(rng, mesh=mesh, n=256)
        res = idx.search_batch(
            [list(map(float, data[3] + 1e-3))],
            3,
            SimilarityMetric.COSINE,
            ef=32,
            use_device=True,
        )
        assert res[0][0].id == 3


def test_sharded_ivf_probe(mesh, rng):
    """Sharded-IVF stage (VERDICT r4 item 5): partitions sharded across
    the mesh, per-shard probe + all-gather pool merge + one cross-shard
    exact rescore. Probing every partition (nprobe_per_shard = C/n_dev)
    must recover the exact top-k of the live corpus."""
    from vectorlite_tpu.dist.sharding import sharded_search_ivf
    from vectorlite_tpu.kernels import ivf as ivf_k

    n_dev = 8
    c, d, b, k = 16, 64, 4, 10
    n = 1500  # live rows (rest of the layout is -1 pad)
    rows64 = rng.normal(size=(n, d))
    live = np.arange(n)
    cents = ivf_k.train_centroids(
        rows64.astype(np.float32), c, iters=4, chunk=500
    )
    assign = ivf_k.assign_rows(rows64, live, cents)
    part_slots, extra_slots = ivf_k.build_layout(
        assign, live, c, pad_factor=4.0
    )  # wide pad: no overflow, the probe covers every live row
    assert len(extra_slots) == 0
    p_width = part_slots.shape[1]
    ps = part_slots.reshape(-1)
    rows32 = np.zeros((c * p_width, d), np.float32)
    rows32[ps >= 0] = rows64[ps[ps >= 0]].astype(np.float32)
    cap = 2048
    vals32 = np.zeros((cap, d), np.float32)
    vals32[:n] = rows64.astype(np.float32)

    s, i = sharded_search_ivf(
        jnp.asarray(rows32, jnp.bfloat16),
        jnp.asarray(ps.astype(np.int32)),
        jnp.asarray(np.einsum("nd,nd->n", rows32, rows32)),
        jnp.asarray(ps >= 0),
        cents,
        jnp.sum(cents * cents, axis=1),
        jnp.asarray(vals32),
        jnp.ones(cap, bool),
        jnp.asarray(rows64[:b].astype(np.float32)),
        jnp.int32(n),
        metric=SimilarityMetric.COSINE,
        k=k,
        k_sel=128,
        nprobe_per_shard=c // n_dev,
        p_width=p_width,
        mesh=mesh,
    )
    # exact truth on the live rows
    v = rows64
    q = rows64[:b]
    sc = (q @ v.T) / (
        np.linalg.norm(q, axis=1, keepdims=True)
        * np.linalg.norm(v, axis=1)[None, :]
    )
    truth = np.argsort(-sc, axis=1)[:, :k]
    i_np = np.asarray(i)
    for row in range(b):
        assert set(i_np[row].tolist()) == set(truth[row].tolist())
