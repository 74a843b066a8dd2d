"""TPU-accelerated bulk HNSW construction.

Classic HNSW insertion runs one graph beam search per vector on the host —
inherently sequential and memory-latency bound (~600-2200 inserts/s at
384-d on this machine). For bulk ingestion, everything except the final
link wiring runs on the TPU:

1. New vector rows are staged host-side; the whole corpus buffer lives on
   the device as one ``[cap, D]`` matrix; per-batch candidate validity is
   an iota comparison.
2. Per query chunk, ONE fused device program computes each new node's
   top-K candidates among all earlier rows (plus the current batch, so
   intra-batch edges form) and converts scores to internal distances —
   one small ([B,K] x2) host fetch per chunk.
3. The native builder (hnsw_bulk_link_heuristic_l0) runs the diversity
   heuristic with on-demand distances (cheap random row reads in C++;
   TPU row-gathers for on-device pairwise matrices measured ~10 s per
   chunk and host-fetching them saturated the relay) and wires forward +
   reverse links.
4. The ~6% of nodes drawing level >= 1 go through the classic native
   insert (they carry the upper-layer routing structure and the entry
   point).

Measured trade-off (clustered 384-d embeddings, recall@10; the 1M row
is the round-3 acceptance run, `bench/report_bulk_1m.json`, with one
NN-descent refine round — `VECTORLITE_BULK_REFINE=1`, the default):

=========  ==============  =============  =================  ==================
scale      classic rate    bulk rate      classic recall     bulk+refine recall
=========  ==============  =============  =================  ==================
100K       2.2K/s          0.7K/s         0.969 (ef=64)      **1.000** (ef=64)
1M         2.1K/s          1.6K/s         0.9305/0.9555      **0.9539/0.9859**
                                          (ef=64/128)        (ef=64/128)
=========  ==============  =============  =================  ==================

Without refine, 1M bulk recall is 0.856 (ef=64): purely-local kNN links
navigate worse than the classic build's incremental ef-search structure
(a known kNN-graph-vs-NSW effect). One NN-descent + diversity re-link
round (`hnsw_refine_l0`) closes it and overshoots: the refined M=16
graph beats even the classic high-accuracy M=32 profile (0.984 at
ef=128) while using half the edge memory. Build rate on this 1-core
host is 0.74x classic (phase split at 1M: device kNN scan 240 s, link
110 s, upper 45 s, refine 207 s — the host-bound link/refine phases
parallelize on real multi-core serving hosts). Bulk stays **opt-in** as
the recall-per-byte choice: ``VECTORLITE_BULK_BUILD=always`` (or
``auto``, which engages it below the 200K quality crossover). Manhattan
has no matmul form and keeps the classic path.
"""

from __future__ import annotations

import ctypes as c
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core.metrics import SimilarityMetric

#: candidates handed to the linking heuristic per node: the nearest
#: NEAR_K plus MID_K mid-range rows strided from ranks [NEAR_K, SCAN_K).
#: Mid-range entries let the diversity heuristic keep shortcut edges —
#: with nearest-only candidates the 1M graph degrades to a hard-to-
#: navigate pure kNN graph (recall@64 0.831 vs classic 0.906).
SCAN_K = 256
NEAR_K = 48
MID_K = 16
CAND_K = NEAR_K + MID_K
#: vectors per insertion batch (defines the candidate horizon)
INSERT_BATCH = 4096
#: query rows per fused device call (one host fetch each)
QUERY_CHUNK = 1024

_INF = float("inf")


@partial(jax.jit, static_argnames=("metric", "k", "use_pallas"))
def _chunk_candidates(
    values,
    sqnorms,
    batch_end,
    queries,
    node_ids,  # [B] int32 global row of each query (for self-removal)
    *,
    metric,
    k,
    use_pallas,
):
    """One fused program: top-k scan over [0, batch_end), similarity ->
    internal distance conversion, self-removal. Returns
    (rows [B,k] int32 with -1 for removed, dists [B,k] f32).
    Candidate-pairwise work happens in native code — TPU row gathers for
    the pairwise matrices measured ~10 s per 1024-query chunk."""
    n = values.shape[0]
    valid_rows = jnp.arange(n) < batch_end
    if use_pallas:
        # ApproxTopK selection (kernels/amk.py): fused matmul +
        # PartialReduce, several-x faster than the round-2 block kernel
        # at k=SCAN_K. Candidate exactness is not the recall limiter
        # (measured: exact vs block-approximate candidates gave
        # identical 1M recall), so the approximate pool is free speed.
        from ..kernels.amk import (
            _exact_rescore_device,
            _matmul,
            _rank_scores,
        )

        dot = _matmul(queries, values)
        rank = jnp.where(
            valid_rows[None, :],
            _rank_scores(dot, metric, sqnorms),
            -jnp.inf,
        )
        _, rows = jax.lax.approx_max_k(rank, k, recall_target=0.95)
        # exact f32 scores for the selected candidates only (the
        # distance conversion below feeds the C++ heuristic); shared
        # with the serving scan so the metric formulas live once —
        # returns descending-by-score, invalid rows at -inf
        # validity is the contiguous prefix [0, batch_end) — the
        # watermark fast path needs no per-candidate validity gather
        scores, rows = _exact_rescore_device(
            rows, values, None, queries, metric, k, batch_end
        )
    else:
        from ..kernels.topk import search_topk

        scores, rows = search_topk(
            values, sqnorms, valid_rows, queries, metric=metric, k=k
        )

    # similarity -> internal HNSW distance (ascending order preserved)
    if metric is SimilarityMetric.COSINE:
        # clamp: f32 rounding can push cosine scores past 1.0, which would
        # make the internal distance slightly negative (same fix as the
        # three search implementations)
        cd = jnp.maximum(1.0 - scores, 0.0)
    elif metric is SimilarityMetric.EUCLIDEAN:
        cd = 1.0 / jnp.maximum(scores, 1e-30) - 1.0
    else:  # dot product
        cd = 1000.0 - jnp.clip(scores, -1000.0, 1000.0)

    ok = (rows != node_ids[:, None]) & jnp.isfinite(scores)
    rows = jnp.where(ok, rows, -1).astype(jnp.int32)
    cd = jnp.where(ok, cd, jnp.inf).astype(jnp.float32)
    # nearest NEAR_K + strided mid-range sample, ascending by distance
    stride = (k - NEAR_K) // MID_K
    sel = jnp.concatenate(
        [
            jnp.arange(NEAR_K),
            NEAR_K + stride * jnp.arange(MID_K),
        ]
    )
    return rows[:, sel], cd[:, sel]


def bulk_build(index, start: int, count: int) -> None:
    """Build graph links for rows [start, start+count) of `index`.

    Preconditions (enforced by HNSWIndex.add_batch): native builder
    present, vector rows already written to the shared buffers, id maps
    populated, metric has a matmul form.
    """
    # engagement marker: benchmarks/tests assert the auto policy
    # actually took this path (bench/bulk_1m.py --mode auto)
    index._bulk_built = True
    import os
    import time

    from .hnsw import _build_threads

    lib = index._nb_lib
    nb = index._nb
    metric = index._metric
    m0 = index.m0
    end_total = start + count
    # host-bound link/refine phases parallelize over the row-lock pool
    # (single-core hosts pass 1 and keep the sequential path)
    threads = _build_threads()
    # VECTORLITE_BULK_PROFILE=1 prints the scan/link/upper phase split
    profile = os.environ.get("VECTORLITE_BULK_PROFILE") == "1"
    t_scan = t_link = t_upper = 0.0

    levels = np.empty(count, np.int32)
    lib.hnsw_draw_levels(
        nb, count, levels.ctypes.data_as(c.POINTER(c.c_int32))
    )

    # one upload of the full (pow2-capacity) corpus buffer
    values = jnp.asarray(index._vecs, dtype=jnp.float32)
    sqnorms = jnp.sum(values * values, axis=-1)
    cap = values.shape[0]
    use_pallas = (
        cap >= (1 << 17)
        and cap % 4096 == 0
        and jax.default_backend() == "tpu"
    )

    for b_lo in range(0, count, INSERT_BATCH):
        b_hi = min(b_lo + INSERT_BATCH, count)
        batch_levels = levels[b_lo:b_hi]
        batch_nodes = np.arange(start + b_lo, start + b_hi, dtype=np.int64)

        # classic insert for upper-level nodes (entry/routing structure)
        t0 = time.perf_counter()
        for off in np.nonzero(batch_levels > 0)[0]:
            lib.hnsw_insert_leveled(
                nb, int(batch_nodes[off]), int(batch_levels[off])
            )
        t_upper += time.perf_counter() - t0
        low_mask_all = batch_levels == 0
        if not low_mask_all.any():
            continue

        batch_end = start + b_hi  # candidate horizon
        t0 = time.perf_counter()
        idx_parts, dist_parts, node_parts = [], [], []
        for q_lo in range(b_lo, b_hi, QUERY_CHUNK):
            q_hi = min(q_lo + QUERY_CHUNK, b_hi)
            n_q = q_hi - q_lo
            q = index._vecs[start + q_lo : start + q_hi].astype(np.float32)
            ids = np.arange(start + q_lo, start + q_hi, dtype=np.int32)
            if n_q < QUERY_CHUNK:
                pad = QUERY_CHUNK - n_q
                q = np.concatenate(
                    [q, np.zeros((pad, q.shape[1]), np.float32)]
                )
                ids = np.concatenate([ids, np.full(pad, -1, np.int32)])
            rows, dists = jax.device_get(
                _chunk_candidates(
                    values,
                    sqnorms,
                    batch_end,
                    jnp.asarray(q),
                    jnp.asarray(ids),
                    metric=metric,
                    k=SCAN_K,
                    use_pallas=use_pallas,
                )
            )
            low = low_mask_all[q_lo - b_lo : q_hi - b_lo]
            if not low.any():
                continue
            idx_parts.append(np.ascontiguousarray(rows[:n_q][low], np.int32))
            dist_parts.append(
                np.ascontiguousarray(dists[:n_q][low], np.float32)
            )
            node_parts.append(
                np.arange(start + q_lo, start + q_hi, dtype=np.int64)[low]
            )

        t_scan += time.perf_counter() - t0
        if not node_parts:
            continue
        t0 = time.perf_counter()
        cand_idx = np.ascontiguousarray(np.concatenate(idx_parts))
        cand_dist = np.ascontiguousarray(np.concatenate(dist_parts))
        low_nodes = np.ascontiguousarray(np.concatenate(node_parts))
        lib.hnsw_bulk_link_heuristic_l0(
            nb,
            low_nodes.ctypes.data_as(c.POINTER(c.c_int64)),
            len(low_nodes),
            CAND_K,
            cand_idx.ctypes.data_as(c.POINTER(c.c_int32)),
            cand_dist.ctypes.data_as(c.POINTER(c.c_float)),
            threads,
        )
        t_link += time.perf_counter() - t0

    # NN-descent refinement (native hnsw_refine_l0): each node re-runs
    # the diversity heuristic over neighbors + neighbors-of-neighbors,
    # letting nodes adopt the better rows their neighbors found.
    # VECTORLITE_BULK_REFINE sets the round count (default 1; 0 off).
    from ..utils import env_number

    rounds = env_number(
        "VECTORLITE_BULK_REFINE", 1, cast=lambda s: int(float(s))
    )
    t0 = time.perf_counter()
    if rounds > 0:
        lib.hnsw_refine_l0(nb, rounds, threads)
    t_refine = time.perf_counter() - t0

    index._num_nodes = end_total
    index._entry = int(lib.hnsw_entry(nb))
    index._top_level = int(lib.hnsw_top_level(nb))
    if profile:
        import sys

        print(
            f"[bulk_build] n={count} scan={t_scan:.1f}s "
            f"link={t_link:.1f}s upper={t_upper:.1f}s "
            f"refine={t_refine:.1f}s (rounds={rounds})",
            file=sys.stderr,
            flush=True,
        )
