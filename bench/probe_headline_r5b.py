"""Round-5 headline validation: pick the shipped default with evidence.

probe_headline_r5 found int8-scan compositions far past the 90K bar
(int8 k128 rt.98 noaug: 185K QPS; k64 rt.99: 163K — all recall 1.0 on
one 256-query seed). Before shipping a default this probe validates:

1. **Recall margin on 4x the queries** (1024 queries = 10,240 hits,
   4 independent seeds) for the frontier configs. The shard-collision
   model predicts ~0.29%/query pair-collision at rt.99 (64-row shards)
   and ~0.55% at rt.98 (128-row shards) on iid data — measure where
   the floor really is.
2. **Adversarial ingestion (consecutive near-duplicate runs)**: the
   PartialReduce keeps ONE winner per shard and runs are consecutive
   rows = same shard, so clustered ingestion is exactly where
   augmentation must earn its cost. Corpus: 1M rows where 20% sit in
   runs of 16 near-duplicates; queries target run members.
3. **The fixed tournament-merge kernel** (scratch-ref dynamic slicing
   after the Mosaic value-slice failure) on silicon.

Writes bench/report_headline_r5b.json (incrementally).
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

N = 1_048_576
D = 384
BATCH = 256
K = 16
ITERS = 16
NQ_BATCHES = 4  # 4 x 256 = 1024 validation queries


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import (
        SimilarityMetric,
        quantize_rows_int8,
    )
    from vectorlite_tpu.kernels.amk import amk_search_topk_rescored
    from vectorlite_tpu.kernels.pallas_merge import (
        pallas_search_merge_topk_rescored,
    )

    out = {"n": N, "batch": BATCH, "nq": NQ_BATCHES * BATCH}
    path = os.path.join(
        os.path.dirname(__file__), "report_headline_r5b.json"
    )

    def checkpoint():
        with open(path, "w") as f:
            json.dump(out, f, indent=2)

    def chain_fn(fn, m):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(m)]
        np.asarray(outs[-1][0])
        return time.perf_counter() - t0

    def measure(fn):
        chain_fn(fn, 2)
        t_small = min(chain_fn(fn, 4) for _ in range(2))
        t_large = min(chain_fn(fn, 4 + ITERS) for _ in range(2))
        te = (t_large - t_small) / ITERS
        if te <= 0:
            te = t_large / (4 + ITERS)
        return te

    def run_section(section, values_f32, queries_all, configs):
        """values_f32 [N, D]; queries_all [NQ_BATCHES, B, D]."""
        values = jnp.asarray(values_f32)
        scan_i8, scan_scales = quantize_rows_int8(values)
        scan_bf16 = values.astype(jnp.bfloat16)
        sqnorms = jnp.sum(values * values, axis=-1)
        valid = jnp.ones(N, dtype=bool)
        live_hi = jnp.asarray(np.int32(N))
        scan_i8.block_until_ready()

        # f64 truth per query batch (blocked over rows to bound memory)
        v64 = values_f32.astype(np.float64)
        vnorm = np.linalg.norm(v64, axis=1)
        truths = []
        for qb in queries_all:
            q64 = qb.astype(np.float64)
            s = (q64 @ v64.T) / (
                np.linalg.norm(q64, axis=1, keepdims=True) * vnorm[None, :]
            )
            truths.append(np.argsort(-s, axis=1)[:, :10])
        log(f"[{section}] truth ready")

        sec = {}
        for name, make in configs.items():
            try:
                total_missed = 0
                for bi in range(NQ_BATCHES):
                    fn = make(scan_i8, scan_scales, scan_bf16, values,
                              sqnorms, valid, live_hi,
                              jnp.asarray(queries_all[bi]))
                    _, i = fn()
                    i_np = np.asarray(i)[:, :10]
                    total_missed += sum(
                        10 - len(set(i_np[b]) & set(truths[bi][b]))
                        for b in range(BATCH)
                    )
                fn0 = make(scan_i8, scan_scales, scan_bf16, values,
                           sqnorms, valid, live_hi,
                           jnp.asarray(queries_all[0]))
                te = measure(fn0)
                hits = 10 * BATCH * NQ_BATCHES
                sec[name] = {
                    "ms": round(te * 1e3, 3),
                    "qps": round(BATCH / te, 1),
                    "recall_at_10": round(1 - total_missed / hits, 5),
                    "missed": total_missed,
                    "of_hits": hits,
                }
                log(
                    f"[{section}] {name}: {te * 1e3:.3f} ms = "
                    f"{BATCH / te:,.0f} QPS, missed {total_missed}/{hits}"
                )
            except Exception as e:
                sec[name] = {"error": str(e)[:200]}
                log(f"[{section}] {name}: FAILED {e}")
            out[section] = sec
            checkpoint()
        return sec

    def amk_cfg(*, k_sel, rt, augment, scan="i8"):
        def make(scan_i8, scan_scales, scan_bf16, values, sqnorms,
                 valid, live_hi, queries):
            def run():
                return amk_search_topk_rescored(
                    scan_i8 if scan == "i8" else scan_bf16,
                    values,
                    sqnorms,
                    valid,
                    queries,
                    metric=SimilarityMetric.COSINE,
                    k=K,
                    k_sel=k_sel,
                    recall_target=rt,
                    augment=augment,
                    scan_scales=scan_scales if scan == "i8" else None,
                    tombstones=False,
                    live_hi=live_hi,
                )
            return run
        return make

    def merge_cfg(winners, tile_n):
        def make(scan_i8, scan_scales, scan_bf16, values, sqnorms,
                 valid, live_hi, queries):
            def run():
                return pallas_search_merge_topk_rescored(
                    scan_bf16, values, sqnorms, valid, queries,
                    metric=SimilarityMetric.COSINE,
                    k=K, k_sel=128, tile_n=tile_n, winners=winners,
                    tombstones=False, live_hi=live_hi,
                )
            return run
        return make

    rng = np.random.default_rng(0)
    log("building iid corpus...")
    vals_iid = rng.normal(size=(N, D)).astype(np.float32)
    queries_iid = np.stack([
        np.random.default_rng(100 + s).normal(size=(BATCH, D))
        .astype(np.float32)
        for s in range(NQ_BATCHES)
    ])

    iid_configs = {
        "int8_k64_rt99_noaug": amk_cfg(k_sel=64, rt=0.99, augment=0),
        "int8_k64_rt99_aug8": amk_cfg(k_sel=64, rt=0.99, augment=8),
        "int8_k96_rt99_noaug": amk_cfg(k_sel=96, rt=0.99, augment=0),
        "int8_k128_rt98_noaug": amk_cfg(k_sel=128, rt=0.98, augment=0),
        "int8_k128_rt98_aug8": amk_cfg(k_sel=128, rt=0.98, augment=8),
        "int8_k192_rt98_noaug": amk_cfg(k_sel=192, rt=0.98, augment=0),
        "int8_k128_rt99_noaug": amk_cfg(k_sel=128, rt=0.99, augment=0),
        "merge_w2_t16k": merge_cfg(2, 16384),
        "merge_w3_t16k": merge_cfg(3, 16384),
    }
    run_section("iid", vals_iid, queries_iid, iid_configs)
    del vals_iid

    # adversarial ingestion: 20% of rows in runs of 16 near-duplicates
    log("building near-dup-run corpus...")
    rng2 = np.random.default_rng(7)
    n_runs = N // 5 // 16
    base = rng2.normal(size=(N, D)).astype(np.float32)
    run_starts = rng2.choice(N - 16, n_runs, replace=False)
    for s in run_starts:
        proto = base[s]
        base[s : s + 16] = proto[None, :] + 0.01 * rng2.normal(
            size=(16, D)
        ).astype(np.float32)
    # queries aim at run prototypes: their true top-10 is dominated by
    # the run (all 16 members nearly tied — the shard-quota killer)
    queries_runs = np.stack([
        base[run_starts[s * BATCH : (s + 1) * BATCH]]
        + 0.005 * np.random.default_rng(200 + s).normal(
            size=(BATCH, D)
        ).astype(np.float32)
        for s in range(NQ_BATCHES)
    ])
    run_configs = {
        "int8_k64_rt99_noaug": amk_cfg(k_sel=64, rt=0.99, augment=0),
        "int8_k64_rt99_aug8": amk_cfg(k_sel=64, rt=0.99, augment=8),
        "int8_k128_rt98_noaug": amk_cfg(k_sel=128, rt=0.98, augment=0),
        "int8_k128_rt98_aug8": amk_cfg(k_sel=128, rt=0.98, augment=8),
        "int8_k128_rt99_aug8": amk_cfg(k_sel=128, rt=0.99, augment=8),
        "bf16_k128_rt99_aug8": amk_cfg(
            k_sel=128, rt=0.99, augment=8, scan="bf16"
        ),
    }
    run_section("neardup_runs", base, queries_runs, run_configs)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
