"""Kill the ApproxTopK aggregation sort.

HLO dump (bench/probe_headline_profile.py follow-up): at 1M rows /
rt=0.99 / k_sel=128, the PartialReduce emits a [B, 16384] unaggregated
candidate rank matrix, and `aggregate_to_topk=True` finishes with a
full stable SORT of [256,16384] (+ three 16.8 MB layout copies) —
that sort, not the matmul, explains the gap between the fused-call
3.6-3.9 ms and the ~1.1 ms matmul roofline.

Variants (all return a [B, pool] candidate set for the exact rescore):

  agg_sort    — shipped: approx_max_k(..., aggregate_to_topk=True)
  agg_none    — aggregate_to_topk=False (the raw 16384 pool)
  agg_amk2    — agg=False + SECOND approx_max_k over [B, 16384] -> 256
  agg_topk    — agg=False + lax.top_k over [B, 16384] -> 256
  e2e_amk2    — full pipeline: two-stage amk + exact rescore, checked
                for id parity vs the shipped fused call

Run on the TPU:  python -m bench.probe_amk_agg
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)

import numpy as np

N, D, B, K = 1 << 20, 384, 256, 10
REPS = 30


def log(m):
    print(m, file=sys.stderr, flush=True)


def _fetch_leaf(r):
    import jax

    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, reps=REPS):
    _fetch_leaf(fn())

    def run(m):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(m)]
        _fetch_leaf(outs[-1])
        return time.perf_counter() - t0

    m1, m2 = max(4, reps // 4), reps
    return min((run(m2) - run(m1)) / (m2 - m1) for _ in range(3)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.kernels import amk

    rng = np.random.default_rng(0)
    data = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)
    v32 = jax.device_put(jnp.asarray(data))
    vbf = v32.astype(jnp.bfloat16)
    sqn = jnp.sum(v32 * v32, axis=1)
    valid = jnp.ones((N,), bool)
    qd = jax.device_put(jnp.asarray(q))
    live_hi = jnp.asarray(N, jnp.int32)
    jax.block_until_ready((v32, vbf, sqn, valid, qd))
    met = SimilarityMetric.COSINE
    rt = amk.recall_target()
    out = {}

    def _rank(vs, sq, va, qq):
        dot = amk._matmul(qq, vs)
        return jnp.where(
            va[None, :], amk._rank_scores(dot, met, sq), amk.NEG_INF
        )

    @functools.partial(jax.jit, static_argnames=("mode", "pool"))
    def sel(vs, sq, va, qq, mode="sort", pool=256):
        rank = _rank(vs, sq, va, qq)
        if mode == "sort":
            return jax.lax.approx_max_k(rank, 128, recall_target=rt)
        s, i = jax.lax.approx_max_k(
            rank, 128, recall_target=rt, aggregate_to_topk=False
        )
        if mode == "none":
            return s, i
        if mode == "amk2":
            s2, pos = jax.lax.approx_max_k(s, pool, recall_target=0.999)
            return s2, jnp.take_along_axis(i, pos, axis=1)
        if mode == "topk":
            s2, pos = jax.lax.top_k(s, pool)
            return s2, jnp.take_along_axis(i, pos, axis=1)
        raise ValueError(mode)

    out["agg_sort_ms"] = timeit(lambda: sel(vbf, sqn, valid, qd))
    log(f"agg=True (shipped sort):  {out['agg_sort_ms']:.3f} ms")
    out["agg_none_ms"] = timeit(lambda: sel(vbf, sqn, valid, qd, mode="none"))
    log(f"agg=False (raw 16384):    {out['agg_none_ms']:.3f} ms")
    out["agg_amk2_ms"] = timeit(lambda: sel(vbf, sqn, valid, qd, mode="amk2"))
    log(f"two-stage amk -> 256:     {out['agg_amk2_ms']:.3f} ms")
    out["agg_topk_ms"] = timeit(lambda: sel(vbf, sqn, valid, qd, mode="topk"))
    log(f"agg=False + top_k -> 256: {out['agg_topk_ms']:.3f} ms")

    # candidate-set quality: does the two-stage pool contain the shipped
    # pool's top-k ids?
    _, i_ship = sel(vbf, sqn, valid, qd)
    _, i_amk2 = sel(vbf, sqn, valid, qd, mode="amk2")
    i_ship = np.asarray(i_ship)
    i_amk2 = np.asarray(i_amk2)
    cover = np.mean(
        [
            np.isin(i_ship[b, :K], i_amk2[b]).mean()
            for b in range(B)
        ]
    )
    out["amk2_covers_shipped_topk"] = float(cover)
    log(f"amk2 pool covers shipped top-{K}: {cover:.4f}")

    # end-to-end: two-stage amk + the existing exact rescore
    @jax.jit
    def e2e_amk2(vs, ve, sq, va, qq, lh):
        rank = _rank(vs, sq, va, qq)
        s, i = jax.lax.approx_max_k(
            rank, 128, recall_target=rt, aggregate_to_topk=False
        )
        s2, pos = jax.lax.approx_max_k(s, 256, recall_target=0.999)
        i_sel = jnp.take_along_axis(i, pos, axis=1)
        return amk._exact_rescore_device(i_sel, ve, None, qq, met, K, lh)

    out["e2e_amk2_ms"] = timeit(
        lambda: e2e_amk2(vbf, v32, sqn, valid, qd, live_hi)
    )
    log(f"e2e two-stage + rescore:  {out['e2e_amk2_ms']:.3f} ms")

    def shipped():
        return amk.amk_search_topk_rescored(
            vbf, v32, sqn, valid, qd,
            metric=met, k=K, tombstones=False, live_hi=live_hi,
        )

    out["e2e_shipped_ms"] = timeit(shipped)
    log(f"e2e shipped fused:        {out['e2e_shipped_ms']:.3f} ms")

    s_a, i_a = e2e_amk2(vbf, v32, sqn, valid, qd, live_hi)
    s_b, i_b = shipped()
    ids_match = float(np.mean(np.asarray(i_a) == np.asarray(i_b)))
    out["e2e_ids_match_frac"] = ids_match
    log(f"e2e ids match shipped:    {ids_match:.4f}")

    path = os.path.join(os.path.dirname(__file__), "report_amk_agg.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
