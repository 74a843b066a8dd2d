"""IVF partitioned scan (kernels/ivf.py + the FlatIndex auto gate):
layout invariants, Pallas/XLA probe parity, full-probe exactness, and
the index-level serving contract (tail inserts, tombstones, compaction,
exact returned scores)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.core.types import Vector
from vectorlite_tpu.index.flat import FlatIndex
from vectorlite_tpu.kernels import ivf

M = SimilarityMetric
D = 64


@pytest.fixture(autouse=True)
def ivf_env(monkeypatch):
    """Engage the IVF rung at test scale on the CPU backend, and keep
    searches off the host-f64 scan so the device path is exercised."""
    monkeypatch.setenv("VECTORLITE_IVF_FORCE", "1")
    monkeypatch.setenv("VECTORLITE_IVF_MIN_ROWS", "2000")
    monkeypatch.setenv("VECTORLITE_IVF_TRAIN_SAMPLE", "3000")
    monkeypatch.setenv("VECTORLITE_IVF_ITERS", "4")
    monkeypatch.setenv("VECTORLITE_IVF_PART_ROWS", "64")
    monkeypatch.setenv("VECTORLITE_IVF_NPROBE", "8")
    monkeypatch.setenv("VECTORLITE_IVF_TAIL_MAX", "512")
    monkeypatch.setenv("VECTORLITE_HOST_SCAN_ROWS", "0")


def corpus(n, d=D, seed=0, clusters=40):
    rng = np.random.default_rng(seed)
    centers = 3.0 * rng.normal(size=(clusters, d))
    rows = centers[rng.integers(0, clusters, n)] + rng.normal(size=(n, d))
    return rows.astype(np.float64)


def exact_topk(rows, q, k, metric):
    if metric is M.DOT_PRODUCT:
        s = rows @ q
    elif metric is M.COSINE:
        denom = np.linalg.norm(rows, axis=1) * np.linalg.norm(q)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(denom > 0, (rows @ q) / np.maximum(denom, 1e-300), 0)
    else:
        s = 1.0 / (1.0 + np.linalg.norm(rows - q, axis=1))
    order = np.argsort(-s, kind="stable")[:k]
    return order, s[order]


# ------------------------------------------------------------- kernel level


def test_layout_partitions_every_live_slot_once():
    rng = np.random.default_rng(1)
    live = np.sort(rng.choice(5000, 3200, replace=False))
    assign = rng.integers(0, 16, len(live)).astype(np.int32)
    part_slots, extra_slots = ivf.build_layout(assign, live, 16)
    got = np.concatenate([part_slots[part_slots >= 0], extra_slots])
    assert sorted(got.tolist()) == live.tolist()
    # pads are -1 and partition width is a lane multiple
    assert part_slots.shape[1] % 128 == 0


def test_train_centroids_separates_clusters():
    rows = corpus(4000, clusters=8).astype(np.float32)
    cents = ivf.train_centroids(rows, 8, iters=8, chunk=1000)
    a = ivf.assign_rows(rows.astype(np.float64), np.arange(4000), cents)
    # nearly every pair from one natural cluster must agree (k-means at
    # C == clusters recovers well-separated gaussians)
    sizes = np.bincount(a, minlength=8)
    assert (sizes > 0).all()


def test_gather_score_pallas_matches_xla():
    rng = np.random.default_rng(2)
    c, p, d, b, l = 8, 128, D, 4, 3
    rows = jnp.asarray(
        rng.normal(size=(c * p, d)).astype(np.float32), dtype=jnp.bfloat16
    )
    ids = jnp.asarray(rng.integers(0, c, (b, l)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    out_x = ivf.gather_score_xla(rows, ids, q, p_width=p)
    out_p = ivf.gather_score_pallas(
        rows, ids, q, p_width=p, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_p), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("metric", [M.COSINE, M.EUCLIDEAN, M.DOT_PRODUCT])
def test_full_probe_matches_exact(metric):
    """nprobe == C probes everything: ids must match the f64 scan."""
    vals = corpus(3000)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(3000, dtype=np.uint64), vals)
    q = corpus(6, seed=9)[:, :D]
    import os

    os.environ["VECTORLITE_IVF_NPROBE"] = "1000000"
    try:
        res = idx.search_batch(q, k=10, metric=metric)
    finally:
        os.environ["VECTORLITE_IVF_NPROBE"] = "8"
    assert idx._ivf_active
    for i in range(len(q)):
        truth_ids, truth_scores = exact_topk(vals, q[i], 10, metric)
        got_ids = [r.id for r in res[i]]
        assert got_ids == truth_ids.tolist()
        # f32 device exact-rescore (the f32-storage contract):
        # ids exact, scores to f32 precision
        np.testing.assert_allclose(
            [r.score for r in res[i]], truth_scores, rtol=2e-6
        )


def test_index_recall_and_exact_scores():
    vals = corpus(4096)
    idx = FlatIndex(D)
    n = len(vals)
    idx.add_batch_arrays(
        np.arange(n, dtype=np.uint64), vals,
    )
    q = vals[:8] + 0.01  # near-duplicate queries
    res = idx.search_batch(np.asarray(q), k=10, metric=M.COSINE)
    assert idx._ivf_active
    hits = 0
    for i in range(len(q)):
        truth_ids, _ = exact_topk(vals, q[i], 10, M.COSINE)
        got = [r.id for r in res[i]]
        hits += len(set(got) & set(truth_ids.tolist()))
        # scores that ARE returned must be exact formula values (f32 rescore)
        for r in res[i]:
            s = exact_topk(vals[r.id : r.id + 1], q[i], 1, M.COSINE)[1][0]
            assert abs(r.score - s) < 2e-6
    assert hits / (10 * len(q)) >= 0.95


def test_tail_inserts_are_found_immediately():
    vals = corpus(3000)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(3000, dtype=np.uint64), vals)
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)  # build layout
    assert idx._ivf_active
    hi = idx._ivf_hi
    new = 7.0 * np.ones(D)
    idx.add(Vector(id=99999, values=new.tolist(), text=""))
    res = idx.search_batch(new[None, :], k=1, metric=M.COSINE)
    assert idx._ivf_hi == hi  # layout untouched: the row rode the tail
    assert res[0][0].id == 99999


def test_tail_overflow_triggers_rebuild():
    vals = corpus(2500)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(2500, dtype=np.uint64), vals,
    )
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    first_hi = idx._ivf_hi
    more = corpus(600, seed=5)
    idx.add_batch_arrays(
        np.arange(10000, 10600, dtype=np.uint64),
        more,
    )
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    assert idx._ivf_hi > first_hi  # tail outgrew its budget: rebuilt


def test_deletes_and_compaction():
    vals = corpus(3000)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(3000, dtype=np.uint64), vals)
    q = vals[42][None, :]
    res = idx.search_batch(q, k=1, metric=M.COSINE)
    assert res[0][0].id == 42
    idx.delete(42)
    res = idx.search_batch(q, k=5, metric=M.COSINE)
    assert all(r.id != 42 for r in res[0])
    idx.compact()
    res = idx.search_batch(q, k=5, metric=M.COSINE)
    assert all(r.id != 42 for r in res[0])
    truth_ids, _ = exact_topk(
        np.delete(vals, 42, axis=0), q[0], 1, M.COSINE
    )
    # nearest surviving neighbor still found after compaction re-layout
    assert len(res[0]) == 5


def test_ivf_disabled_below_gate(monkeypatch):
    monkeypatch.setenv("VECTORLITE_IVF_MIN_ROWS", "1000000")
    vals = corpus(2500)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(2500, dtype=np.uint64), vals,
    )
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    assert not idx._ivf_active


def test_ivf_skips_oversized_batches():
    """A batch big enough that probes exceed half the corpus must fall
    through to the brute engine (and still answer correctly)."""
    vals = corpus(2100)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(2100, dtype=np.uint64), vals,
    )
    q = np.asarray(corpus(64, seed=3))
    res = idx.search_batch(q, k=5, metric=M.COSINE)
    for i in (0, 63):
        truth_ids, _ = exact_topk(vals, q[i], 5, M.COSINE)
        assert [r.id for r in res[i]] == truth_ids.tolist()


def test_manhattan_bypasses_ivf():
    vals = corpus(2500)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(2500, dtype=np.uint64), vals,
    )
    q = vals[7][None, :]
    res = idx.search_batch(q, k=3, metric=M.MANHATTAN)
    assert res[0][0].id == 7


# ------------------------------------------------------------- recall guard


def test_guard_refuses_iid_highdim():
    """iid gaussian in high-D has no cell locality (measured ~0.23
    cell-recall at default nprobe): the guard must keep IVF OFF and the
    brute engine must keep serving exact results."""
    rng = np.random.default_rng(5)
    d = 128
    vals = rng.standard_normal((4000, d))
    idx = FlatIndex(d)
    idx.add_batch_arrays(np.arange(4000, dtype=np.uint64), vals)
    q = vals[3][None, :]
    res = idx.search_batch(q, k=5, metric=M.COSINE)
    assert not idx._ivf_active
    assert idx._ivf_refused_at == 4000
    truth_ids, _ = exact_topk(vals, q[0], 5, M.COSINE)
    assert [r.id for r in res[0]] == truth_ids.tolist()


def test_guard_refusal_cache_skips_rebuild_until_doubling(monkeypatch):
    rng = np.random.default_rng(6)
    d = 128
    vals = rng.standard_normal((4000, d))
    idx = FlatIndex(d)
    idx.add_batch_arrays(np.arange(4000, dtype=np.uint64), vals)
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    assert idx._ivf_refused_at == 4000
    calls = []
    monkeypatch.setattr(
        idx, "_ivf_build", lambda: calls.append(1)
    )
    # small growth: the refusal cache must short-circuit _ivf_wanted
    idx.add_batch_arrays(
        np.arange(4000, 4100, dtype=np.uint64),
        rng.standard_normal((100, d)),
    )
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    assert not calls
    # doubling re-opens the question
    idx.add_batch_arrays(
        np.arange(4100, 8200, dtype=np.uint64),
        rng.standard_normal((4100, d)),
    )
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    assert calls


def test_guard_passes_clustered_and_disabled_env(monkeypatch):
    """Clustered corpora activate (the fixture's corpora always have);
    VECTORLITE_IVF_GUARD=0 must force-activate even on iid data."""
    vals = corpus(4096)
    idx = FlatIndex(D)
    idx.add_batch_arrays(np.arange(4096, dtype=np.uint64), vals)
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    assert idx._ivf_active and idx._ivf_refused_at == 0

    monkeypatch.setenv("VECTORLITE_IVF_GUARD", "0")
    rng = np.random.default_rng(7)
    iid = rng.standard_normal((4000, 128))
    idx2 = FlatIndex(128)
    idx2.add_batch_arrays(np.arange(4000, dtype=np.uint64), iid)
    idx2.search_batch(iid[:1], k=1, metric=M.COSINE)
    assert idx2._ivf_active


def test_guard_nprobe_floor_raises_serving_width(monkeypatch):
    """When only a wider probe window clears the recall bar, the guard
    must raise the serving nprobe floor rather than refuse."""
    monkeypatch.setenv("VECTORLITE_IVF_NPROBE", "1")
    vals = corpus(4096, clusters=24)
    idx = FlatIndex(D)
    idx.add_batch_arrays(np.arange(4096, dtype=np.uint64), vals)
    q = vals[:8] + 0.01
    res = idx.search_batch(np.asarray(q), k=10, metric=M.COSINE)
    if not idx._ivf_active:
        pytest.skip("guard refused at nprobe ladder top for this seed")
    hits = 0
    for i in range(len(q)):
        truth_ids, _ = exact_topk(vals, q[i], 10, M.COSINE)
        hits += len({r.id for r in res[i]} & set(truth_ids.tolist()))
    # nprobe=1 alone would miss cross-cell neighbors; the floor (or a
    # pass at 1) must keep measured recall near the guard threshold
    assert hits / (10 * len(q)) >= 0.9


def test_risky_estimate_scales_with_competitor_window():
    """The bf16 displacement estimate must scale linearly with the
    competing population (competitor_rows): a near-duplicate corpus
    that is risky against the full corpus is NOT risky against an
    IVF-probe-sized window (round-5 design: _ivf_build re-checks with
    the window instead of inheriting the full-corpus refusal)."""
    from vectorlite_tpu.index.flat import _bf16_selection_risky

    rng = np.random.default_rng(11)
    protos = 10.0 * rng.normal(size=(32, D))
    rows = np.repeat(protos, 128, axis=0) + 0.3 * rng.normal(
        size=(4096, D)
    )
    valid = np.ones(4096, dtype=bool)
    # per-rank gaps within a 128-copy pile are small against the
    # norm-10 score scale: full-corpus density makes the estimate
    # refuse...
    assert _bf16_selection_risky(rows.astype(np.float32), valid, 4096)
    # ...but a probe-window population (a few hundred competitors)
    # brings expected displacement inside the exact-rescore pool
    assert not _bf16_selection_risky(
        rows.astype(np.float32), valid, 4096, competitor_rows=256
    )


def test_risky_corpus_still_activates_ivf():
    """A full-corpus _precision_risky verdict must not veto the IVF
    build — the window-scaled re-check decides (round-5: the clustered
    8M corpus estimated risky at 8M competitors while measuring brute
    recall 1.0000; IVF ranks within ~nprobe*P rows)."""
    vals = corpus(4096)
    idx = FlatIndex(D)
    idx.add_batch_arrays(np.arange(4096, dtype=np.uint64), vals)
    idx.search_batch(vals[:1], k=1, metric=M.COSINE)
    assert idx._ivf_active
    # simulate the full-corpus guard verdict, force a layout rebuild
    idx._ivf_drop()
    idx._precision_risky = True
    res = idx.search_batch(vals[:1], k=10, metric=M.COSINE)
    assert idx._ivf_active and idx._ivf_refused_at == 0
    truth_ids, _ = exact_topk(vals, vals[0], 10, M.COSINE)
    assert {r.id for r in res[0]} == set(truth_ids.tolist())


def test_layout_goes_int8_when_bf16_layout_busts_hbm_budget(monkeypatch):
    """When storage + a bf16 layout would exceed the HBM budget, the
    build must fall back to an int8 layout (+ per-row scales) instead
    of OOMing at 8M scale (round-5 drive: 17.1/15.75 GB). Served
    results stay exact (layout only ranks; rescore reads full rows)."""
    monkeypatch.setenv("VECTORLITE_AUTO_BF16_GB", "0.000001")
    vals = corpus(4096)
    # pin f32 storage: with "auto" the tiny budget would push the
    # dtype ladder itself to int8 and the layout would go int8 via
    # the _quantized path, not the budget branch under test
    idx = FlatIndex(D, device_dtype=jnp.float32)
    idx.add_batch_arrays(np.arange(4096, dtype=np.uint64), vals)
    res = idx.search_batch(vals[:1], k=10, metric=M.COSINE)
    assert idx._ivf_active and not idx._quantized
    assert idx._ivf_rows.dtype == jnp.int8
    assert idx._ivf_scales is not None
    truth_ids, _ = exact_topk(vals, vals[0], 10, M.COSINE)
    assert {r.id for r in res[0]} == set(truth_ids.tolist())


# --------------------------------------------------- int8 rung composition


def test_int8_rung_builds_int8_layout_and_recalls():
    """IVF x int8 (VERDICT r4 item 5): the quantized capacity rung gets
    an int8 partition copy + per-row scales; recall survives the extra
    quantization because selection folds scales back in and the final k
    is host-f64 re-scored (the int8 rung contract)."""
    vals = corpus(4096)
    idx = FlatIndex(D, device_dtype="int8")
    idx.add_batch_arrays(np.arange(4096, dtype=np.uint64), vals)
    q = vals[:8] + 0.01
    res = idx.search_batch(np.asarray(q), k=10, metric=M.COSINE)
    assert idx._ivf_active
    assert idx._ivf_rows.dtype == jnp.int8
    assert idx._ivf_scales is not None
    hits = 0
    for i in range(len(q)):
        truth_ids, _ = exact_topk(vals, q[i], 10, M.COSINE)
        got = [r.id for r in res[i]]
        hits += len(set(got) & set(truth_ids.tolist()))
        # returned scores are exact f64 formula values (host rescore)
        for r in res[i]:
            s = exact_topk(vals[r.id : r.id + 1], q[i], 1, M.COSINE)[1][0]
            assert abs(r.score - s) < 1e-9
    assert hits / (10 * len(q)) >= 0.95


def test_int8_layout_tail_and_deletes():
    """Tail inserts (dequantized via the rung scales) and tombstones
    keep working through the int8 layout."""
    vals = corpus(4096)
    idx = FlatIndex(D, device_dtype="int8")
    idx.add_batch_arrays(np.arange(4096, dtype=np.uint64), vals)
    idx.search_batch(vals[:1], k=3, metric=M.COSINE)  # trigger the build
    assert idx._ivf_active and idx._ivf_rows.dtype == jnp.int8
    probe = corpus(1, seed=33)[0] * 0.5
    idx.add(Vector(id=9000, values=probe.tolist(), text="tail row"))
    res = idx.search_batch(probe[None, :], k=3, metric=M.COSINE)
    assert res[0][0].id == 9000  # tail row found immediately
    idx.delete(9000)
    res = idx.search_batch(probe[None, :], k=3, metric=M.COSINE)
    assert all(r.id != 9000 for r in res[0])


def test_gather_score_pallas_matches_xla_int8():
    rng = np.random.default_rng(5)
    c, p, d, b, l = 8, 128, D, 4, 3
    rows = jnp.asarray(
        rng.integers(-127, 128, (c * p, d)).astype(np.int8)
    )
    ids = jnp.asarray(rng.integers(0, c, (b, l)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    out_x = ivf.gather_score_xla(rows, ids, q, p_width=p)
    out_p = ivf.gather_score_pallas(rows, ids, q, p_width=p, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_p), rtol=0, atol=1e-3
    )
