"""Same-window A/B: amk default engine vs the Pallas block-W2 kernel.

Motivation (round-3 session 7): after the lane-pack layout fix
(pallas_scan.py) the legacy block kernel measured 3.32 ms/batch vs the
amk default's 3.87 ms in one bench.py window — if its recall holds,
the default dispatch choice is worth revisiting. But the block kernel's
known failure mode (the round-2 ADVICE medium) is clustered ingestion:
winners=2 per 128-row tile-block means a run of >2 consecutively
inserted near-duplicates can never all surface, no matter the pool.
The amk engine closes that case with locality augmentation.

So this probe measures BOTH corpora in ONE window:

* iid:       N(0,1) rows (bench.py's corpus, seed 0)
* clustered: runs of 128 consecutive near-duplicates (sigma=1e-3)
             with queries aimed at cluster centers — true top-10 all
             live inside one 128-row block.

For each engine: warm ms/batch (slope method), recall@10 vs f64 numpy.

Run (chip): python -m bench.probe_block_vs_amk
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)

import numpy as np

D = 384
B = 256
K = 10
N = 1 << 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slope_time(fn, iters=12):
    def chain(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn()
        np.asarray(out[0]).ravel()[:1]
        return time.perf_counter() - t0

    chain(2)
    t_small = min(chain(3) for _ in range(2))
    t_large = min(chain(3 + iters) for _ in range(2))
    return max((t_large - t_small) / iters, 1e-9)


def recall_at_10(i_dev, truth_ids):
    i_np = np.asarray(i_dev)[:, :10]
    hits = sum(
        len(set(i_np[b].tolist()) & truth_ids[b]) for b in range(B)
    )
    return hits / (10 * B)


def score_ratio(i_dev, data, queries, truth_sums):
    """mean(f64 score of returned top-10) / mean(f64 score of true
    top-10) — robust to within-cluster ties (where id-recall is
    meaningless: any 10 of 128 near-identical duplicates are equally
    right), but collapses when an engine returns unrelated junk rows."""
    i_np = np.asarray(i_dev)[:, :10]
    v64 = data.astype(np.float64)
    q64 = queries.astype(np.float64)
    qn = np.linalg.norm(q64, axis=1)
    got = 0.0
    for b in range(B):
        rows = v64[i_np[b]]
        s = rows @ q64[b] / (np.linalg.norm(rows, axis=1) * qn[b])
        got += s.sum()
    return got / truth_sums


def make_clustered(rng, sigma):
    """N/128 clusters x 128 consecutive near-duplicates; queries point
    at random cluster centers (their true top-10 is one insertion run).
    sigma=1e-3: within-cluster scores tie below f32 resolution (judge by
    score_ratio). sigma=1e-2: within-cluster order is f32-resolvable, so
    id-recall directly tests whether selection structurally drops
    consecutive near-duplicates (the round-2 ADVICE scenario)."""
    n_clusters = N // 128
    centers = rng.normal(size=(n_clusters, D)).astype(np.float32)
    reps = np.repeat(centers, 128, axis=0)
    data = reps + rng.normal(scale=sigma, size=(N, D)).astype(np.float32)
    q_centers = rng.integers(0, n_clusters, size=B)
    queries = centers[q_centers] + rng.normal(
        scale=sigma, size=(B, D)
    ).astype(np.float32)
    return data, queries


def truth_top10(data, queries):
    v64 = data.astype(np.float64)
    q64 = queries.astype(np.float64)
    scores = (q64 @ v64.T) / (
        np.linalg.norm(q64, axis=1, keepdims=True)
        * np.linalg.norm(v64, axis=1)[None, :]
    )
    idx = np.argpartition(-scores, 32, axis=1)[:, :32]
    out = []
    top_sum = 0.0
    for b in range(B):
        order = idx[b][np.argsort(-scores[b, idx[b]], kind="stable")]
        out.append(set(order[:10].tolist()))
        top_sum += scores[b, order[:10]].sum()
    return out, top_sum


def main():
    import jax
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.kernels.amk import amk_search_topk_rescored
    from vectorlite_tpu.kernels.pallas_scan import (
        pallas_search_block_topk_rescored,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    log(f"platform: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    report = {}

    for corpus_name in ("iid", "clustered_tied", "clustered_resolved"):
        if corpus_name == "iid":
            data = rng.normal(size=(N, D)).astype(np.float32)
            queries_np = rng.normal(size=(B, D)).astype(np.float32)
        elif corpus_name == "clustered_tied":
            data, queries_np = make_clustered(rng, 1e-3)
        else:
            data, queries_np = make_clustered(rng, 1e-2)
        log(f"[{corpus_name}] f64 truth...")
        truth, truth_sums = truth_top10(data, queries_np)

        values = jnp.asarray(data)
        values_scan = values.astype(jnp.bfloat16)
        sqnorms = jnp.sum(values * values, axis=-1)
        valid = jnp.ones(N, dtype=bool)
        queries = jnp.asarray(queries_np)
        live_hi = jnp.asarray(np.int32(N))

        engines = {
            "amk_pool128_aug": lambda: amk_search_topk_rescored(
                values_scan, values, sqnorms, valid, queries,
                metric=SimilarityMetric.COSINE, k=K, k_sel=128,
                recall_target=0.99, tombstones=False, live_hi=live_hi,
            ),
            "block_w2_ksel32": lambda: pallas_search_block_topk_rescored(
                values_scan, values, sqnorms, valid, queries,
                metric=SimilarityMetric.COSINE, k=K, k_sel=32,
                tile_n=16384, winners=2, interpret=not on_tpu,
            ),
            "block_w2_ksel64": lambda: pallas_search_block_topk_rescored(
                values_scan, values, sqnorms, valid, queries,
                metric=SimilarityMetric.COSINE, k=K, k_sel=64,
                tile_n=16384, winners=2, interpret=not on_tpu,
            ),
        }
        report[corpus_name] = {}
        for name, fn in engines.items():
            s, i = fn()
            rec = recall_at_10(i, truth)
            ratio = score_ratio(i, data, queries_np, truth_sums)
            t = slope_time(fn) if on_tpu else float("nan")
            report[corpus_name][name] = {
                "warm_ms": round(t * 1e3, 3),
                "qps": round(B / t, 1) if t == t else None,
                "recall_at_10": round(rec, 4),
                "score_ratio": round(ratio, 6),
            }
            log(
                f"[{corpus_name}] {name}: {t * 1e3:.3f} ms/batch, "
                f"recall@10 {rec:.4f}, score_ratio {ratio:.6f}"
            )
        del values, values_scan, sqnorms, queries

    out = "bench/report_block_vs_amk.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
