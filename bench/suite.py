"""Benchmark suite — the five BASELINE.md eval configs.

Run: ``python -m bench.suite [--configs flat10k,flat100k,...] [--full]``

Configs (BASELINE.md):
  1. flat10k   — Flat exact cosine top-5, 10K x 384, single query (p50 latency)
  2. flat100k  — Flat batched queries, L2 + dot, 100K x 384, batch 256 (QPS)
  3. hnsw      — HNSW default profile: native build rate + device/host
                 search QPS + recall@10 vs Flat ground truth, ef sweep
                 (100K rows by default; --full uses 1M)
  4. hnswf16   — memory-optimized profile (bf16 device corpus, M=8/M0=16)
  5. e2e       — embed -> insert -> search pipeline + .vlc round-trip

Results go to bench/report.json (one object per config) and a human
summary to stderr. The reference publishes no numbers (BASELINE.md); CPU
float64 scans measured on this host serve as the reference-analogue
baselines.

Timing: through the TPU relay only host fetches synchronize, so QPS uses
a slope measurement (dispatch m and m+K chains, difference the totals).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)
from pathlib import Path

import numpy as np

D = 384
K = 10
BATCH = 256


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fetch_sync(x):
    np.asarray(x).ravel()[:1]


def slope_time(dispatch_fn, iters=16):
    """Per-call seconds via two chained-dispatch measurements."""

    def chain(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = dispatch_fn()
        fetch_sync(out)
        return time.perf_counter() - t0

    chain(2)
    t_small = min(chain(3) for _ in range(2))
    t_large = min(chain(3 + iters) for _ in range(2))
    return max((t_large - t_small) / iters, 1e-9)


def make_data(n, d=D, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


_CAL_STATE: dict = {}


def calibrate_ms() -> float:
    """Tiny fixed probe kernel (chained [2048,384] matmuls) timed with
    the slope method. The shared-pool chip shows 2-4x run-to-run
    variance in contended windows (BASELINE.md round-2 notes: flat100k
    swung 126K <-> 75K QPS on identical kernels); bracketing each config
    with this probe detects those windows so reports can be flagged and
    re-run instead of silently misleading the next round's tuning."""
    import jax
    import jax.numpy as jnp

    if "x" not in _CAL_STATE:
        rng = np.random.default_rng(7)
        _CAL_STATE["x"] = jnp.asarray(
            rng.normal(size=(2048, 384)).astype(np.float32)
        )

        @jax.jit
        def probe(x):
            y = x
            for _ in range(8):
                y = jnp.tanh(y @ x.T @ x * 1e-3)
            return y

        _CAL_STATE["fn"] = probe
        probe(_CAL_STATE["x"]).block_until_ready()
    x, fn = _CAL_STATE["x"], _CAL_STATE["fn"]
    # The probe is ~51 GFLOP of chained matmuls: a reading below 0.05 ms
    # is not a fast window, it is a failed slope measurement (the relay
    # pipelines every dispatch into the fixed RPC overhead and the
    # chained-dispatch difference collapses to ~0). Left unclamped, a
    # ~0 reading makes the dispersion ratio astronomical and falsely
    # flags a healthy window as UNSTABLE (observed: "probe 0.95 -> 0.00,
    # dispersion 950269"). Re-measure, then floor.
    floor_ms = 0.05
    for _ in range(3):
        t = slope_time(lambda: fn(x), iters=8) * 1e3
        if t >= floor_ms:
            return t
    return floor_ms


def run_stable(name: str, fn, max_tries: int = 2, rel_tol: float = 0.35):
    """Run one bench config bracketed by calibration probes.

    If the probe time moves more than ``rel_tol`` across the config (a
    contended window), the config re-runs once; the report entry carries
    a ``stability`` field either way so no number is trusted blindly.
    """
    tries = []
    for attempt in range(max_tries):
        before = calibrate_ms()
        result = fn()
        after = calibrate_ms()
        dispersion = abs(after - before) / max(min(after, before), 1e-9)
        stable = dispersion <= rel_tol
        tries.append((result, before, after, dispersion, stable))
        if stable:
            break
        log(
            f"[{name}] UNSTABLE window (probe {before:.2f} -> "
            f"{after:.2f} ms, dispersion {dispersion:.2f}); "
            + ("re-running" if attempt + 1 < max_tries else "keeping last")
        )
    result, before, after, dispersion, stable = tries[-1]
    result["stability"] = {
        "calibration_before_ms": round(before, 3),
        "calibration_after_ms": round(after, 3),
        "dispersion": round(dispersion, 3),
        "stable_window": stable,
        "attempts": len(tries),
    }
    return result


def make_embeddings(n, d=D, n_clusters=256, spread=0.35, seed=0):
    """Synthetic embedding-like corpus: clusters on the unit sphere with
    intra-cluster noise, L2-normalized — the structure of real MiniLM
    embeddings (BASELINE.md datasets). Uniform gaussians are the known
    worst case for graph ANN (distance concentration) and are NOT
    representative of the reference's workload; HNSW recall is reported
    on this generator."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    data = centers[assign] + spread * rng.normal(size=(n, d)) / np.sqrt(d)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    return data.astype(np.float32)


def exact_truth(data, queries, metric_name, k):
    from vectorlite_tpu.core.metrics import SimilarityMetric

    metric = SimilarityMetric.parse(metric_name)
    v = data.astype(np.float64)
    q = queries.astype(np.float64)
    if metric is SimilarityMetric.COSINE:
        s = (q @ v.T) / (
            np.linalg.norm(q, axis=1, keepdims=True)
            * np.linalg.norm(v, axis=1)[None, :]
        )
    elif metric is SimilarityMetric.DOT_PRODUCT:
        s = q @ v.T
    else:  # euclidean
        d2 = (
            np.sum(q * q, 1, keepdims=True)
            + np.sum(v * v, 1)[None, :]
            - 2 * q @ v.T
        )
        s = -np.sqrt(np.maximum(d2, 0))
    return np.argsort(-s, axis=1)[:, :k]


# ------------------------------------------------------------------ configs


def bench_flat10k():
    import jax.numpy as jnp

    from vectorlite_tpu import FlatIndex, SimilarityMetric, Vector

    n = 10_000
    data = make_data(n)
    idx = FlatIndex(D, [Vector(id=i, values=list(map(float, data[i])), text=f"t{i}") for i in range(n)])
    q = list(map(float, data[77] + 0.01))
    idx.search(q, 5, SimilarityMetric.COSINE)  # warm
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        r = idx.search(q, 5, SimilarityMetric.COSINE)
        lat.append(time.perf_counter() - t0)
    assert r[0].id == 77
    p50 = float(np.median(lat) * 1e3)
    best = float(np.min(lat) * 1e3)
    log(f"[flat10k] single-query p50 {p50:.3f} ms (incl. host round-trip)")
    return {
        "config": "flat_exact_cosine_top5_10k",
        "p50_ms": round(p50, 3),
        "best_ms": round(best, 3),
        # gate on the same-run floor too: p50 swings 0.89-2.5+ ms with
        # host load, and automated consumers keying on the boolean
        # must not flag window contention as a regression (ADVICE r4)
        "sub_millisecond": min(p50, best) < 1.0,
        "sub_millisecond_p50": p50 < 1.0,
        # this config is a pure-host exact scan on the 1-core shared
        # box: the p50 swings 0.89-2.5+ ms with host load (VERDICT r3
        # item 8c). best_ms is the same-run floor; treat
        # sub_millisecond=false with best_ms < 1.0 as window contention,
        # not a regression.
        "window_note": (
            "host-scan latency; healthy-window range 0.89-0.94 ms "
            "(BASELINE.md), contended windows measure 2.5+ ms"
        ),
    }


def bench_flat100k():
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.kernels.topk import search_topk

    n = 100_000
    data = make_data(n)
    queries = make_data(BATCH, seed=1)
    values = jnp.asarray(data)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(n, dtype=bool)
    qd = jnp.asarray(queries)
    out = {}
    for mname, metric in [
        ("euclidean", SimilarityMetric.EUCLIDEAN),
        ("dotproduct", SimilarityMetric.DOT_PRODUCT),
    ]:
        t = slope_time(
            lambda: search_topk(
                values, sqnorms, valid, qd, metric=metric, k=16
            )[0]
        )
        qps = BATCH / t
        out[mname + "_qps"] = round(qps, 1)
        log(f"[flat100k] {mname}: {t * 1e3:.3f} ms/batch = {qps:,.0f} QPS")
    return {"config": "flat_batched_100k_b256", **out}


def _bench_hnsw(profile_name, n, dtype_label):
    import jax.numpy as jnp

    from vectorlite_tpu import HNSWIndex, SimilarityMetric, Vector
    from vectorlite_tpu.config import VectorLiteConfig

    cfg = VectorLiteConfig.profile(profile_name)
    data = make_embeddings(n)
    vectors = [
        Vector(id=i, values=list(map(float, data[i])), text="")
        for i in range(n)
    ]
    idx = HNSWIndex(
        D,
        SimilarityMetric.COSINE,
        m=cfg.hnsw_m,
        m0=cfg.hnsw_m0,
        store_f64=False,
    )
    t0 = time.perf_counter()
    idx.add_batch(vectors)
    build_s = time.perf_counter() - t0
    log(
        f"[hnsw:{profile_name}] built {n} in {build_s:.1f}s "
        f"({n / build_s:,.0f} inserts/s, native)"
    )

    rng = np.random.default_rng(2)
    queries = data[rng.integers(0, n, BATCH)] + (
        0.05 * rng.normal(size=(BATCH, D)).astype(np.float32) / np.sqrt(D)
    )
    # 128-query recall sample: 32-query means were observed to swing by
    # +/-0.04 at 1M purely from query draw (0.906 vs 0.944 at ef=64)
    n_rq = 128
    truth = exact_truth(data, queries[:n_rq], "cosine", K)
    result = {
        "config": f"hnsw_{profile_name}_{n}",
        "dtype": dtype_label,
        "m": cfg.hnsw_m,
        "m0": cfg.hnsw_m0,
        "build_s": round(build_s, 1),
        "build_inserts_per_s": round(n / build_s, 1),
        "sweep": [],
    }
    qlist = [list(map(float, row)) for row in queries]
    for ef in (16, 64, 128):
        # recall via the SERVING path (native host search —
        # see README "Which path serves"); the demoted device beam's
        # recall is recorded separately (it trails the host ef-search at
        # equal ef: fixed-iteration beam vs unbounded best-first)
        res = idx.search_batch(
            qlist[:n_rq], K, SimilarityMetric.COSINE, ef=ef,
            use_device=False,
        )
        recall = float(
            np.mean(
                [
                    len({r.id for r in row} & set(truth[i])) / K
                    for i, row in enumerate(res)
                ]
            )
        )
        res_dev = idx.search_batch(
            qlist[:n_rq], K, SimilarityMetric.COSINE, ef=ef,
            use_device=True,
        )
        recall_dev = float(
            np.mean(
                [
                    len({r.id for r in row} & set(truth[i])) / K
                    for i, row in enumerate(res_dev)
                ]
            )
        )
        # device QPS (full batch)
        t0 = time.perf_counter()
        idx.search_batch(
            qlist, K, SimilarityMetric.COSINE, ef=ef, use_device=True
        )
        dev_t = time.perf_counter() - t0
        # host (native C++) QPS, single query loop
        t0 = time.perf_counter()
        for i in range(64):
            idx.search(
                qlist[i], K, SimilarityMetric.COSINE, ef=ef,
                use_device=False,
            )
        host_t = (time.perf_counter() - t0) / 64
        entry = {
            "ef": ef,
            "recall_at_10": round(recall, 4),
            "recall_at_10_device_beam": round(recall_dev, 4),
            "device_batch_qps": round(BATCH / dev_t, 1),
            "host_qps": round(1 / host_t, 1),
            "host_p50_ms": round(host_t * 1e3, 3),
        }
        result["sweep"].append(entry)
        log(
            f"[hnsw:{profile_name}] ef={ef}: recall@10={recall:.3f} "
            f"(device beam {recall_dev:.3f}) "
            f"device {BATCH / dev_t:,.0f} QPS, host {1 / host_t:,.0f} QPS "
            f"({host_t * 1e3:.2f} ms p50)"
        )
    return result


def bench_hnsw(full):
    return _bench_hnsw("default", 1_000_000 if full else 100_000, "float32")


def bench_hnswf16(full):
    return _bench_hnsw(
        "memory-optimized", 500_000 if full else 100_000, "bfloat16"
    )


def bench_e2e(tmpdir="/tmp/vlc_bench"):
    from vectorlite_tpu import (
        IndexType,
        SimilarityMetric,
        VectorLiteClient,
        load_collection_from_file,
    )
    from vectorlite_tpu.embed.minilm import MiniLMEmbedder

    embedder = MiniLMEmbedder.random_init(seed=0)
    client = VectorLiteClient(embedder)
    client.create_collection("bench", IndexType.FLAT)
    texts = [f"document number {i} about topic {i % 37}" for i in range(2048)]
    # warm-up: the first forward/search pays the (remote) jit compile,
    # which would otherwise dominate a 2048-doc ingest; steady-state
    # throughput is the serving-relevant number. Cold time reported too.
    t0 = time.perf_counter()
    client.create_collection("warmup", IndexType.FLAT)
    client.add_texts_to_collection("warmup", texts[:256])
    client.search_texts_in_collection("warmup", texts[:256], 5)
    client.delete_collection("warmup")
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for lo in range(0, len(texts), 256):
        client.add_texts_to_collection("bench", texts[lo : lo + 256])
    ingest_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = client.search_texts_in_collection("bench", texts[:256], 5)
    search_s = time.perf_counter() - t0
    # second timed search on the warmed capacity bucket
    t0 = time.perf_counter()
    res = client.search_texts_in_collection("bench", texts[:256], 5)
    search_s = min(search_s, time.perf_counter() - t0)
    hit = float(np.mean([row[0].text == texts[i] for i, row in enumerate(res)]))
    path = Path(tmpdir) / "bench.vlc"
    t0 = time.perf_counter()
    client.get_collection("bench").save_to_file(path)
    save_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    loaded = load_collection_from_file(path)
    load_s = time.perf_counter() - t0
    assert loaded.get_info().count == len(texts)
    log(
        f"[e2e] embed+insert {len(texts) / ingest_s:,.0f} docs/s, "
        f"embed+search {256 / search_s:,.0f} QPS (self-hit {hit:.2f}), "
        f"cold-start {cold_s:.1f}s, "
        f"vlc save {save_s:.2f}s load {load_s:.2f}s"
    )
    return {
        "config": "e2e_embed_insert_search_vlc",
        "ingest_docs_per_s": round(len(texts) / ingest_s, 1),
        "search_qps": round(256 / search_s, 1),
        "self_hit_rate": round(hit, 3),
        "cold_start_s": round(cold_s, 1),
        "vlc_save_s": round(save_s, 2),
        "vlc_load_s": round(load_s, 2),
    }


def bench_flat8m():
    """Capacity-rung scale demo (not in the default set): 8M x 384 on
    ONE chip through the reduced-precision storage rungs, end-to-end
    through FlatIndex (ingest -> auto ladder -> amk selection -> exact
    f64 host rescore via the native flat_rescore_f64 path).

    Rungs measured: int8 (default 6 GB budget picks it at this
    capacity; 3.2 GB device), bf16 (budget override; 6.4 GB device),
    and pq (~0.77 GB codes). f32 would need 12.9 GB for the corpus
    alone plus a scan copy — past the single-chip comfort line, which
    is exactly what the ladder exists for. Recall@10 is against a
    direct f64 numpy scan (64 queries; blocked matmul), so every rung's
    number is against exact ground truth, not against another rung.

    Host RAM: the f64 truth matrix is 24.6 GB (this box has 125 GB;
    VECTORLITE_HOST_TRUTH_DIR memmaps it on smaller hosts)."""
    import os

    import jax

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.index.flat import FlatIndex

    on_tpu = jax.devices()[0].platform == "tpu"
    n = 8_388_608 if on_tpu else 32_768
    nq = 64
    log(f"[flat8m] generating {n}x{D} corpus...")
    rng = np.random.default_rng(0)
    data = rng.normal(size=(n, D))  # f64, the host-truth dtype
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = np.asarray(make_data(BATCH, seed=1), dtype=np.float64)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    log("[flat8m] f64 ground truth (blocked numpy scan)...")
    t0 = time.perf_counter()
    truth_scores = np.empty((nq, n))
    step = 1 << 20
    for lo in range(0, n, step):
        truth_scores[:, lo : lo + step] = queries[:nq] @ data[lo : lo + step].T
    truth_idx = np.argpartition(-truth_scores, K, axis=1)[:, :K]
    truth_ids = [
        set(
            truth_idx[b][
                np.argsort(-truth_scores[b, truth_idx[b]], kind="stable")
            ][:10]
        )
        for b in range(nq)
    ]
    truth_s = time.perf_counter() - t0
    del truth_scores
    log(f"[flat8m] truth in {truth_s:.0f}s")

    ids = np.arange(n, dtype=np.uint64)
    out = {"config": "flat_8m_x384_b256", "n": n}
    # budget overrides pin each rung: at cap 8M the row bytes are
    # 3.22 GB, so x2 (bf16) needs <= budget and x4 (f32) must exceed
    # it; the default 6 GB budget sits exactly ON the bf16 boundary,
    # so int8 needs an explicit 4 GB budget
    for rung, budget_gb in (("int8", 4.0), ("bf16", 8.0), ("pq", None)):
        env = {}
        if budget_gb is not None:
            env["VECTORLITE_AUTO_BF16_GB"] = str(budget_gb)
        if rung == "pq":
            env["VECTORLITE_PQ_TRAIN_SAMPLE"] = "65536"
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            idx = FlatIndex(
                D, device_dtype="pq" if rung == "pq" else "auto"
            )
            t0 = time.perf_counter()
            for lo in range(0, n, step):
                idx.add_batch_arrays(
                    ids[lo : lo + step], data[lo : lo + step]
                )
            ingest_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            got = idx.search_batch_arrays(
                queries, K, SimilarityMetric.COSINE
            )
            first_s = time.perf_counter() - t0  # sync + compile
            if rung != "pq" and on_tpu:
                # (off-TPU the auto ladder intentionally stays f32 —
                # the CPU run only smoke-tests the plumbing)
                dt = idx._dev_values.dtype
                assert str(dt) == (
                    "int8" if rung == "int8" else "bfloat16"
                ), f"{rung} rung did not engage (got {dt})"
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                got = idx.search_batch_arrays(
                    queries, K, SimilarityMetric.COSINE
                )
            t = (time.perf_counter() - t0) / iters
            hits = sum(
                len(set(got[0][b][:10].tolist()) & truth_ids[b])
                for b in range(nq)
            )
            out[rung] = {
                "ingest_s": round(ingest_s, 1),
                "first_search_s": round(first_s, 1),
                "warm_ms": round(t * 1e3, 3),
                "qps": round(BATCH / t, 1),
                "recall_at_10": round(hits / (nq * 10), 4),
            }
            log(
                f"[flat8m] {rung}: ingest {ingest_s:.0f}s, warm "
                f"{t * 1e3:.2f} ms/batch = {BATCH / t:,.0f} QPS, "
                f"recall@10 {out[rung]['recall_at_10']}"
            )
            del idx
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    return out


def bench_flat4m():
    """Scale demo (not in the default set): exact + approx cosine top-k
    over 4M x 384 f32 (6 GB in HBM) on one chip."""
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.kernels.pallas_scan import (
        pallas_search_block_topk,
        pallas_search_topk,
    )

    n = 4_194_304
    rng = np.random.default_rng(0)
    log(f"[flat4m] generating {n}x{D} corpus...")
    data = rng.standard_normal((n, D), dtype=np.float32)
    values = jnp.asarray(data)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(n, dtype=bool)
    queries = jnp.asarray(make_data(BATCH, seed=1))

    t_exact = slope_time(
        lambda: pallas_search_topk(
            values, sqnorms, valid, queries,
            metric=SimilarityMetric.COSINE, k=16, tile_n=2048,
        )[0],
        iters=8,
    )
    log(
        f"[flat4m] exact: {t_exact * 1e3:.2f} ms/batch "
        f"({BATCH / t_exact:,.0f} QPS)"
    )
    t_approx = slope_time(
        lambda: pallas_search_block_topk(
            values, sqnorms, valid, queries,
            metric=SimilarityMetric.COSINE, k=16, tile_n=4096,
        )[0],
        iters=8,
    )
    log(
        f"[flat4m] block-approx: {t_approx * 1e3:.2f} ms/batch "
        f"({BATCH / t_approx:,.0f} QPS)"
    )
    # amk at 4M validates the fused PartialReduce scales past the point
    # where a [B, N] intermediate would be 4 GB
    from vectorlite_tpu.kernels.amk import amk_search_topk_rescored

    scan = values.astype(jnp.bfloat16)
    t_amk = slope_time(
        lambda: amk_search_topk_rescored(
            scan, values, sqnorms, valid, queries,
            metric=SimilarityMetric.COSINE, k=16, k_sel=128,
        )[0],
        iters=8,
    )
    log(
        f"[flat4m] amk rescored: {t_amk * 1e3:.2f} ms/batch "
        f"({BATCH / t_amk:,.0f} QPS)"
    )
    return {
        "config": "flat_4m_x384_b256",
        "exact_qps": round(BATCH / t_exact, 1),
        "approx_qps": round(BATCH / t_approx, 1),
        "amk_qps": round(BATCH / t_amk, 1),
    }


def bench_manhattan1m():
    """The round-3 Pallas L1 kernel at headline scale: exact Manhattan
    top-k at 1M x 384 b=256 with no [B, N] HBM intermediate (VERDICT
    round-2 item 4). VPU-bound by construction (no matmul form), so
    the interesting number is ms/batch vs the chunked XLA path's HBM
    blowup, not FLOP utilization."""
    import jax
    import jax.numpy as jnp

    from vectorlite_tpu.kernels.pallas_l1 import pallas_search_topk_l1

    on_tpu = jax.devices()[0].platform == "tpu"
    # interpret mode on CPU: keep the run (and the allocation) small
    n = 1_048_576 if on_tpu else 8_192
    data = make_data(n)
    queries = make_data(BATCH, seed=1)
    values = jnp.asarray(data)
    valid = jnp.ones(n, dtype=bool)
    qd = jnp.asarray(queries)
    t = slope_time(
        lambda: pallas_search_topk_l1(
            values, valid, qd, k=16, interpret=not on_tpu
        )[0]
    )
    qps = BATCH / t
    log(
        f"[manhattan1m] pallas L1 fused: {t * 1e3:.3f} ms/batch = "
        f"{qps:,.0f} QPS (n={n})"
    )
    return {"config": "manhattan_pallas_1m_b256", "qps": round(qps, 1)}


def bench_filtered1m():
    """Metadata-filtered Flat search at headline scale: the where mask
    intersects the kernels' validity input and forces the EXHAUSTIVE
    kernel (approximate selection's per-shard winner quota can't survive
    clustered masks — see _resolve_approx), so at Pallas scale expect
    filtered QPS ~ the exhaustive kernel's, below the unfiltered
    ApproxTopK speed path. The one-time cost is the O(N) host metadata
    walk, reported as mask_build_ms (cached per clause afterwards,
    appends extend incrementally). 10-way partition tags; 50% and 10%
    selectivity."""
    import jax

    from vectorlite_tpu import FlatIndex
    from vectorlite_tpu.core.metrics import SimilarityMetric

    on_tpu = jax.devices()[0].platform == "tpu"
    n = 1_048_576 if on_tpu else 32_768
    data = make_data(n)
    queries = make_data(BATCH, seed=1).astype(np.float64)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        np.arange(n, dtype=np.uint64),
        data.astype(np.float64),
        metadatas=[{"p": int(i % 10)} for i in range(n)],
    )

    def qps_of(where, warm=2, iters=8):
        for _ in range(warm):
            idx.search_batch_arrays(
                queries, K, SimilarityMetric.COSINE, where=where
            )
        t0 = time.perf_counter()
        for _ in range(iters):
            idx.search_batch_arrays(
                queries, K, SimilarityMetric.COSINE, where=where
            )
        return BATCH * iters / (time.perf_counter() - t0)

    out = {"config": "flat_filtered_1m_b256", "n": n}
    out["unfiltered_qps"] = round(qps_of(None), 1)
    t0 = time.perf_counter()
    idx._where_mask({"p": {"$in": [0, 1, 2, 3, 4]}})
    out["mask_build_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    out["sel50_qps"] = round(
        qps_of({"p": {"$in": [0, 1, 2, 3, 4]}}), 1
    )
    out["sel10_qps"] = round(qps_of({"p": 0}), 1)
    log(
        f"[filtered1m] n={n}: unfiltered {out['unfiltered_qps']:,.0f} / "
        f"50% {out['sel50_qps']:,.0f} / 10% {out['sel10_qps']:,.0f} QPS, "
        f"mask build {out['mask_build_ms']} ms"
    )
    return out


def bench_pq1m():
    """Product-quantization rung at headline scale (kernels/pq.py):
    uint8 codes + learned codebooks, streaming ADC + wide pool + exact
    f64 host rescore. Reports train/encode one-time costs, warm
    ms/batch, QPS, and recall@10 against the exact engine on the same
    corpus. ~16x less HBM than f32 — the number that matters is the
    recall/latency point at 96 bytes/row."""
    import os

    import jax

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.index.flat import FlatIndex

    on_tpu = jax.devices()[0].platform == "tpu"
    n = 1_048_576 if on_tpu else 16_384
    os.environ.setdefault("VECTORLITE_PQ_TRAIN_SAMPLE", "65536")
    # the gate must sit below n or the f32 fallback would silently be
    # benchmarked under the pq label (asserted below)
    os.environ["VECTORLITE_PQ_MIN_ROWS"] = str(min(n, 16384))
    data = make_data(n).astype(np.float64)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = make_data(BATCH, seed=1).astype(np.float64)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact = FlatIndex(D)
    exact.add_batch_arrays(np.arange(n, dtype=np.uint64), data)
    truth = exact.search_batch_arrays(
        queries, K, SimilarityMetric.COSINE, approx=False
    )
    truth_ids = truth[0]
    del exact

    idx = FlatIndex(D, device_dtype="pq")
    idx.add_batch_arrays(np.arange(n, dtype=np.uint64), data)
    t0 = time.perf_counter()
    got = idx.search_batch_arrays(queries, K, SimilarityMetric.COSINE)
    first_s = time.perf_counter() - t0  # train + encode + compile
    assert idx._pq_active, "pq rung did not engage; check PQ_MIN_ROWS"
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        got = idx.search_batch_arrays(queries, K, SimilarityMetric.COSINE)
    t = (time.perf_counter() - t0) / iters
    hits = sum(
        len(set(got[0][b]) & set(truth_ids[b])) for b in range(BATCH)
    )
    out = {
        "config": "flat_pq_1m_x384_b256",
        "n": n,
        "first_s": round(first_s, 2),
        "warm_ms": round(t * 1e3, 3),
        "qps": round(BATCH / t, 1),
        "recall_at_10": round(hits / (BATCH * K), 4),
    }
    log(
        f"[pq1m] n={n}: first {out['first_s']}s, warm {out['warm_ms']} "
        f"ms/batch = {out['qps']:,.0f} QPS, recall@10 "
        f"{out['recall_at_10']}"
    )
    return out


ALL = [
    "flat10k", "flat100k", "hnsw", "hnswf16", "e2e", "manhattan1m",
    "filtered1m", "pq1m",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(ALL))
    ap.add_argument(
        "--full", action="store_true", help="1M-scale HNSW configs"
    )
    ap.add_argument("--out", default="bench/report.json")
    args = ap.parse_args()

    import jax

    log(f"platform: {jax.devices()[0]}")
    fns = {
        "flat10k": bench_flat10k,
        "flat100k": bench_flat100k,
        "hnsw": lambda: bench_hnsw(args.full),
        "hnswf16": lambda: bench_hnswf16(args.full),
        "e2e": bench_e2e,
        "flat4m": bench_flat4m,
        "flat8m": bench_flat8m,
        "manhattan1m": bench_manhattan1m,
        "filtered1m": bench_filtered1m,
        "pq1m": bench_pq1m,
    }
    results = []
    for name in args.configs.split(","):
        name = name.strip()
        if name not in fns:
            raise SystemExit(f"unknown config {name}")
        results.append(run_stable(name, fns[name]))
    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
