"""One-process anatomy of the headline dispatch cost.

probe_split_dispatch found chained two-dispatch (3.78 ms) is NOT the
sum of the separately-probed parts (1.88 sel + 0.17 rescore) — but
those parts were measured in a different process/window. This probe
measures everything in ONE process so the arithmetic must close:

  sel_only      — selection jit alone (pool 128, no augment)
  sel_aug       — selection jit with the augment concat (pool 200)
  resc_fixed    — rescore jit on a precomputed pool (no dependency)
  nodep         — BOTH jits per iteration, rescore on the FIXED pool
                  (two dispatches, no data dependency): isolates
                  per-dispatch overhead
  chained       — rescore consumes sel's output (the real pipeline)
  full          — shipped fused single-dispatch call

If nodep ~ sel_aug + resc_fixed, dispatches are free and any chained
excess is the data dependency (device idle / relay round-trip).
If nodep >> sum, per-dispatch overhead dominates and fusing was right.

Run on the TPU:  python -m bench.probe_dispatch_anatomy
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
    def sel_noaug(vs, sq, va, qq):
        dot = amk._matmul(qq, vs)
        rank = jnp.where(
            va[None, :], amk._rank_scores(dot, met, sq), amk.NEG_INF
        )
        _, i_sel = jax.lax.approx_max_k(
            rank, amk.K_SEL_MIN, recall_target=rt
        )
        return i_sel

    @jax.jit
    def resc_jit(i_sel, ve, qq, lh):
        return amk._exact_rescore_device(i_sel, ve, None, qq, met, K, lh)

    pool_w = amk.K_SEL_MIN + AUG * (2 * amk._AUGMENT_RADIUS + 1)
    i_fixed = jax.device_put(
        jnp.asarray(rng.integers(0, N, size=(B, pool_w)), jnp.int32)
    )
    jax.block_until_ready(i_fixed)

    out["sel_only_ms"] = timeit(lambda: sel_noaug(vbf, sqn, valid, qd))
    log(f"sel_only  (pool 128, 1 dispatch): {out['sel_only_ms']:.3f} ms")

    out["sel_aug_ms"] = timeit(lambda: sel_jit(vbf, sqn, valid, qd))
    log(f"sel_aug   (pool 200, 1 dispatch): {out['sel_aug_ms']:.3f} ms")

    out["resc_fixed_ms"] = timeit(lambda: resc_jit(i_fixed, v32, qd, live_hi))
    log(f"resc_fixed(pool 200, 1 dispatch): {out['resc_fixed_ms']:.3f} ms")

    def nodep():
        a = sel_jit(vbf, sqn, valid, qd)
        b = resc_jit(i_fixed, v32, qd, live_hi)
        return a, b

    out["nodep_ms"] = timeit(nodep)
    log(f"nodep     (2 dispatches, indep):  {out['nodep_ms']:.3f} ms")

    def chained():
        i_sel = sel_jit(vbf, sqn, valid, qd)
        return resc_jit(i_sel, v32, qd, live_hi)

    out["chained_ms"] = timeit(chained)
    log(f"chained   (2 dispatches, dep):    {out['chained_ms']:.3f} ms")

    def full():
        return amk.amk_search_topk_rescored(
            vbf, v32, sqn, valid, qd,
            metric=met, k=K, tombstones=False, live_hi=live_hi,
        )

    out["full_ms"] = timeit(full)
    log(f"full      (shipped fused):        {out['full_ms']:.3f} ms")

    out["sum_parts_ms"] = out["sel_aug_ms"] + out["resc_fixed_ms"]
    log(f"sum of parts:                     {out['sum_parts_ms']:.3f} ms")

    path = os.path.join(
        os.path.dirname(__file__), "report_dispatch_anatomy.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
