"""Round-5 headline frontier: int8 scan-copy selection composition.

VERDICT r4 item 3 context: the roofline proved the shipped engine's
cost splits ~0.4 matmul / ~1.5 selection+aggregation / ~1.2 rescore /
~0.25 augmentation (ms, 1M x 384 b=256). Round-4's int8 probe measured
the s8 x s8 -> s32 fused selection at 1.96 ms (vs bf16's 2.51) with
candidate recall@10 = 1.0 at k_sel=128 — the scan copy's bytes, not
the MXU rate, bound selection. This probe measures the full
composition frontier so the shipped default can move:

  scan dtype {bf16, int8} x k_sel {64, 96, 112, 128}
  x augmentation {8x r4 (shipped), 4x r2 (lite), off}
  x rt {0.99, 0.98}

each end-to-end (selection + exact-f32 rescore, one dispatch), with
recall@10 vs float64 numpy on the full 256-query batch. Target:
>= 90K QPS (<= 2.844 ms/batch) at measured recall 1.0.

Run AFTER any other chip job: python -m bench.probe_headline_r5
Writes bench/report_headline_r5.json.
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

N = int(os.environ.get("HEADLINE_N", 1_048_576))
D = 384
BATCH = 256
K = 16
ITERS = 16


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

    rng = np.random.default_rng(0)
    log(f"building {N}x{D} corpus...")
    values_f32 = rng.normal(size=(N, D)).astype(np.float32)
    queries_f32 = rng.normal(size=(BATCH, D)).astype(np.float32)

    dev = jax.devices()[0]
    log(f"platform: {dev.platform} {dev}")

    values = jnp.asarray(values_f32)
    scan_bf16 = values.astype(jnp.bfloat16)
    scan_i8, scan_scales = quantize_rows_int8(values)
    scan_i8.block_until_ready()
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(N, dtype=bool)
    queries = jnp.asarray(queries_f32)
    live_hi = jnp.asarray(np.int32(N))

    # float64 ground truth, full batch
    v64 = values_f32.astype(np.float64)
    q64 = queries_f32.astype(np.float64)
    truth_scores = (q64 @ v64.T) / (
        np.linalg.norm(q64, axis=1, keepdims=True)
        * np.linalg.norm(v64, axis=1)[None, :]
    )
    truth = np.argsort(-truth_scores, axis=1)[:, :10]
    log("truth ready")

    def recall_of(i):
        i_np = np.asarray(i)[:, :10]
        misses = sum(
            10 - len(set(i_np[b]) & set(truth[b])) for b in range(BATCH)
        )
        return 1.0 - misses / (10 * BATCH), misses

    def chain_fn(fn, m):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(m)]
        np.asarray(outs[-1][0])
        return time.perf_counter() - t0

    def measure(fn):
        chain_fn(fn, 2)  # warm/compile
        t_small = min(chain_fn(fn, 4) for _ in range(2))
        t_large = min(chain_fn(fn, 4 + ITERS) for _ in range(2))
        te = (t_large - t_small) / ITERS
        if te <= 0:  # window shifted; un-differenced upper bound
            te = t_large / (4 + ITERS)
        return te

    def cfg(scan, scales, *, k_sel, rt, augment, radius):
        def run():
            return amk_search_topk_rescored(
                scan,
                values,
                sqnorms,
                valid,
                queries,
                metric=SimilarityMetric.COSINE,
                k=K,
                k_sel=k_sel,
                recall_target=rt,
                augment=augment,
                augment_radius=radius,
                scan_scales=scales,
                tombstones=False,
                live_hi=live_hi,
            )
        return run

    configs = {
        # shipped anchor
        "bf16_k128_rt99_aug8r4": cfg(
            scan_bf16, None, k_sel=128, rt=0.99, augment=8, radius=4),
        "bf16_k128_rt99_noaug": cfg(
            scan_bf16, None, k_sel=128, rt=0.99, augment=0, radius=4),
        "int8_k128_rt99_aug8r4": cfg(
            scan_i8, scan_scales, k_sel=128, rt=0.99, augment=8, radius=4),
        "int8_k128_rt99_aug4r2": cfg(
            scan_i8, scan_scales, k_sel=128, rt=0.99, augment=4, radius=2),
        "int8_k128_rt99_noaug": cfg(
            scan_i8, scan_scales, k_sel=128, rt=0.99, augment=0, radius=4),
        "int8_k112_rt99_noaug": cfg(
            scan_i8, scan_scales, k_sel=112, rt=0.99, augment=0, radius=4),
        "int8_k96_rt99_noaug": cfg(
            scan_i8, scan_scales, k_sel=96, rt=0.99, augment=0, radius=4),
        "int8_k64_rt99_noaug": cfg(
            scan_i8, scan_scales, k_sel=64, rt=0.99, augment=0, radius=4),
        "int8_k128_rt98_noaug": cfg(
            scan_i8, scan_scales, k_sel=128, rt=0.98, augment=0, radius=4),
        "int8_k96_rt99_aug4r2": cfg(
            scan_i8, scan_scales, k_sel=96, rt=0.99, augment=4, radius=2),
    }

    # the round-5 Pallas tournament-merge selection (VERDICT r4 item 3:
    # per-lane top-W VMEM accumulator across grid steps, no [B,N] ranks,
    # no per-tile HBM winner dump) — measured against the amk frontier
    from vectorlite_tpu.kernels.pallas_merge import (
        pallas_search_merge_topk_rescored,
    )

    def merge_cfg(winners, tile_n):
        def run():
            return pallas_search_merge_topk_rescored(
                scan_bf16,
                values,
                sqnorms,
                valid,
                queries,
                metric=SimilarityMetric.COSINE,
                k=K,
                k_sel=128,
                tile_n=tile_n,
                winners=winners,
                tombstones=False,
                live_hi=live_hi,
            )
        return run

    configs["merge_w2_t16k"] = merge_cfg(2, 16384)
    configs["merge_w3_t16k"] = merge_cfg(3, 16384)
    configs["merge_w2_t32k"] = merge_cfg(2, 32768)

    out = {"n": N, "batch": BATCH}
    for name, fn in configs.items():
        try:
            s, i = fn()
            s.block_until_ready()
            rec, missed = recall_of(i)
            te = measure(fn)
            out[name] = {
                "ms": round(te * 1e3, 3),
                "qps": round(BATCH / te, 1),
                "recall_at_10": round(rec, 5),
                "missed": missed,
            }
            log(
                f"{name}: {te * 1e3:.3f} ms = {BATCH / te:,.0f} QPS, "
                f"recall {rec:.5f} ({missed} missed)"
            )
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
            log(f"{name}: FAILED {e}")
        path = os.path.join(
            os.path.dirname(__file__), "report_headline_r5.json"
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
