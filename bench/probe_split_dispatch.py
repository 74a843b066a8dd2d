"""Split the headline engine into two chained dispatches vs the fused jit.

probe_headline_profile found the fused amk_search_topk_rescored costs
~1.5 ms MORE than its two stages timed as separate dispatches
(3.57 fused vs 1.88 sel + 0.17 rescore). Hypothesis: inside one XLA
program the aggregation-sort output and the rescore gather force layout
copies / scheduling stalls that two independently-compiled programs
don't pay. Two async dispatches back-to-back enqueue without host sync,
so if the chained pipeline hits ~2.0 ms the engine should split.

Variants (identical semantics, identical outputs asserted):
  full       — shipped fused call (augment=8, tombstones=False)
  chained    — jit A: matmul+rank+approx_max_k+augment -> i_sel;
               jit B: _exact_rescore_device(i_sel)
  barrier    — fused, with optimization_barrier between the stages
  chained_d  — chained with donate_argnums on i_sel in jit B

Run on the TPU:  python -m bench.probe_split_dispatch
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
    best = min(((run(m2) - run(m1)) / (m2 - m1)) for _ in range(3))
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
    log(f"full (shipped fused):        {out['full_ms']:.3f} ms")

    AUG = 8

    @jax.jit
    def sel_jit(vs, sq, va, qq):
        dot = amk._matmul(qq, vs)
        rank = jnp.where(
            va[None, :], amk._rank_scores(dot, met, sq), amk.NEG_INF
        )
        _, i_sel = jax.lax.approx_max_k(
            rank, amk.K_SEL_MIN, recall_target=rt
        )
        top = i_sel[:, :AUG]
        offs = jnp.arange(-amk._AUGMENT_RADIUS, amk._AUGMENT_RADIUS + 1)
        aug = jnp.clip(
            top[:, :, None] + offs[None, None, :], 0, N - 1
        ).reshape(top.shape[0], -1)
        return jnp.concatenate([i_sel, aug], axis=1)

    @jax.jit
    def resc_jit(i_sel, ve, qq, lh):
        return amk._exact_rescore_device(i_sel, ve, None, qq, met, K, lh)

    def chained():
        i_sel = sel_jit(vbf, sqn, valid, qd)
        return resc_jit(i_sel, v32, qd, live_hi)

    out["chained_ms"] = timeit(chained)
    log(f"chained (two dispatches):    {out['chained_ms']:.3f} ms")

    # parity: identical ids and scores vs the shipped fused call
    sf, if_ = jax.tree_util.tree_map(np.asarray, full())
    sc, ic = jax.tree_util.tree_map(np.asarray, chained())
    out["chained_matches_full"] = bool(
        np.array_equal(if_, ic) and np.allclose(sf, sc)
    )
    log(f"chained matches full:        {out['chained_matches_full']}")

    @functools.partial(jax.jit, static_argnames=())
    def fused_barrier(vs, ve, sq, va, qq, lh):
        dot = amk._matmul(qq, vs)
        rank = jnp.where(
            va[None, :], amk._rank_scores(dot, met, sq), amk.NEG_INF
        )
        _, i_sel = jax.lax.approx_max_k(
            rank, amk.K_SEL_MIN, recall_target=rt
        )
        top = i_sel[:, :AUG]
        offs = jnp.arange(-amk._AUGMENT_RADIUS, amk._AUGMENT_RADIUS + 1)
        aug = jnp.clip(
            top[:, :, None] + offs[None, None, :], 0, N - 1
        ).reshape(top.shape[0], -1)
        i_sel = jnp.concatenate([i_sel, aug], axis=1)
        i_sel = jax.lax.optimization_barrier(i_sel)
        return amk._exact_rescore_device(i_sel, ve, None, qq, met, K, lh)

    out["barrier_ms"] = timeit(
        lambda: fused_barrier(vbf, v32, sqn, valid, qd, live_hi)
    )
    log(f"fused + opt barrier:         {out['barrier_ms']:.3f} ms")

    sb, ib = jax.tree_util.tree_map(
        np.asarray, fused_barrier(vbf, v32, sqn, valid, qd, live_hi)
    )
    out["barrier_matches_full"] = bool(
        np.array_equal(if_, ib) and np.allclose(sf, sb)
    )
    log(f"barrier matches full:        {out['barrier_matches_full']}")

    path = os.path.join(
        os.path.dirname(__file__), "report_split_dispatch.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()


