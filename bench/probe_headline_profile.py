"""Ablate the fused headline dispatch (amk_search_topk_rescored).

Round-3 session-7 probes put selection at ~1.18 ms and the rescore
pieces (gather 0.54-0.85, top_k 0.14-0.25, einsum ~0.1) at ~1.0-1.2 ms,
yet the shipped fused call measures 3.7-3.9 ms — ~1.3 ms is
unattributed. This probe times the production call against ablations in
ONE process/window so the deltas are trustworthy:

  full          — shipped default (augment=8, tombstones=False)
  sel_only      — matmul + rank + approx_max_k, i_sel returned
  sel_noagg     — same with aggregate_to_topk=False (how much the
                  final aggregation sort costs inside PartialReduce)
  full_aug0     — augment disabled (pool 128 instead of 200)
  rescore_only  — _exact_rescore_device on a precomputed fixed pool
  full_defprec  — einsum at DEFAULT precision (bf16 passes) instead of
                  HIGHEST, to see if the exactness knob is paying rent

Run on the TPU:  python -m bench.probe_headline_profile
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
    """Force a real host round trip (block_until_ready under-reports
    through the axon relay — see bench.py's timing note)."""
    import jax

    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, reps=REPS):
    """Slope timing, same technique as bench.py: total(m) = fixed_sync
    + m * t_exec; one host fetch is the only reliable sync point."""
    _fetch_leaf(fn())  # warm / compile

    def run(m):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(m)]
        _fetch_leaf(outs[-1])
        return time.perf_counter() - t0

    m1, m2 = max(4, reps // 4), reps
    best = min(
        ((run(m2) - run(m1)) / (m2 - m1)) for _ in range(3)
    )
    return best * 1e3


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

    def full():
        return amk.amk_search_topk_rescored(
            vbf, v32, sqn, valid, qd,
            metric=met, k=K, tombstones=False, live_hi=live_hi,
        )

    out["full_ms"] = timeit(full)
    log(f"full (shipped default):      {out['full_ms']:.3f} ms")

    @functools.partial(jax.jit, static_argnames=("agg",))
    def _sel(vs, sq, va, qq, agg=True):
        dot = amk._matmul(qq, vs)
        rank = jnp.where(
            va[None, :], amk._rank_scores(dot, met, sq), amk.NEG_INF
        )
        return jax.lax.approx_max_k(
            rank, amk.K_SEL_MIN, recall_target=rt, aggregate_to_topk=agg
        )

    out["sel_only_ms"] = timeit(lambda: _sel(vbf, sqn, valid, qd))
    log(f"sel_only (agg=True):         {out['sel_only_ms']:.3f} ms")
    out["sel_noagg_ms"] = timeit(lambda: _sel(vbf, sqn, valid, qd, agg=False))
    s, i = _sel(vbf, sqn, valid, qd, agg=False)
    out["noagg_pool_width"] = int(i.shape[1])
    log(
        f"sel_noagg (agg=False):       {out['sel_noagg_ms']:.3f} ms "
        f"(pool width {out['noagg_pool_width']})"
    )

    out["full_aug0_ms"] = timeit(
        lambda: amk.amk_search_topk_rescored(
            vbf, v32, sqn, valid, qd,
            metric=met, k=K, tombstones=False, live_hi=live_hi, augment=0,
        )
    )
    log(f"full augment=0 (pool 128):   {out['full_aug0_ms']:.3f} ms")

    # fixed candidate pool: shipped pool width (k_sel + augment spread)
    pool_w = amk.K_SEL_MIN + 8 * (2 * amk._AUGMENT_RADIUS + 1)
    i_fixed = jnp.asarray(
        rng.integers(0, N, size=(B, pool_w)), jnp.int32
    )

    @jax.jit
    def _resc(i_sel, ve, qq, lh):
        return amk._exact_rescore_device(i_sel, ve, None, qq, met, K, lh)

    out["rescore_only_ms"] = timeit(lambda: _resc(i_fixed, v32, qd, live_hi))
    log(f"rescore_only (pool {pool_w}):   {out['rescore_only_ms']:.3f} ms")

    # einsum precision ablation: clone of the rescore with DEFAULT prec
    @jax.jit
    def _resc_def(i_sel, ve, qq, lh):
        i_sel = jnp.sort(i_sel, axis=1)
        rows = ve[i_sel].astype(jnp.float32)
        qf = qq.astype(jnp.float32)
        dot = jnp.einsum("bkd,bd->bk", rows, qf)
        rowsq = jnp.sum(rows * rows, axis=-1)
        qsq = jnp.sum(qf * qf, axis=-1, keepdims=True)
        denom = jnp.sqrt(qsq) * jnp.sqrt(rowsq)
        exact = jnp.where(
            denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0
        )
        exact = jnp.where(i_sel < lh, exact, amk.NEG_INF)
        s_top, pos = jax.lax.top_k(exact, K)
        return s_top, jnp.take_along_axis(i_sel, pos, axis=1)

    out["rescore_defprec_ms"] = timeit(
        lambda: _resc_def(i_fixed, v32, qd, live_hi)
    )
    log(f"rescore DEFAULT precision:   {out['rescore_defprec_ms']:.3f} ms")

    out["sum_sel_plus_rescore_ms"] = (
        out["sel_only_ms"] + out["rescore_only_ms"]
    )
    out["fusion_overhead_ms"] = out["full_ms"] - out["sum_sel_plus_rescore_ms"]
    log(
        f"sel+rescore sum:             "
        f"{out['sum_sel_plus_rescore_ms']:.3f} ms "
        f"(fused full is {out['fusion_overhead_ms']:+.3f} ms vs sum)"
    )

    path = os.path.join(os.path.dirname(__file__), "report_headline_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
