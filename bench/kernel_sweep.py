"""Round-3 kernel tuning sweep: tile_n / winners for the speed-mode scan.

Roofline context (VERDICT r2): 6.6 ms/batch at 1M x 384 b=256 is ~15% of
HBM BW and ~16% of bf16 MXU peak. Hypothesis: per-grid-step overhead
(~10 us/step x 256 steps at tile_n=4096) dominates; larger tiles cut the
step count. Run: python -m bench.kernel_sweep [--n 1048576]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)

import numpy as np

D = 384
B = 256
K = 16


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fetch_sync(x):
    np.asarray(x).ravel()[:1]


def slope_time(dispatch_fn, iters=16):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--tiles", default="4096,8192,16384,32768")
    ap.add_argument("--mode", default="rescored")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.kernels.pallas_scan import (
        pallas_search_block_topk,
        pallas_search_block_topk_rescored,
        pallas_search_topk,
    )

    log(f"platform: {jax.devices()[0]}  n={args.n}")
    n = args.n
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, D), dtype=np.float32)
    values = jnp.asarray(data)
    scan = values.astype(jnp.bfloat16)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(n, dtype=bool)
    queries = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    metric = SimilarityMetric.COSINE

    # ground truth from the exhaustive kernel for recall checks
    s_ref, i_ref = pallas_search_topk(
        values, sqnorms, valid, queries, metric=metric, k=K, tile_n=2048
    )
    i_ref = np.asarray(i_ref)

    for tile in [int(t) for t in args.tiles.split(",")]:
        if n % tile:
            log(f"tile={tile}: skipped (n % tile != 0)")
            continue
        for winners in (2,):
            try:
                if args.mode == "rescored":
                    fn = lambda: pallas_search_block_topk_rescored(
                        scan, values, sqnorms, valid, queries,
                        metric=metric, k=K, k_sel=32, tile_n=tile,
                        winners=winners,
                    )[0]
                else:
                    fn = lambda: pallas_search_block_topk(
                        scan, sqnorms, valid, queries,
                        metric=metric, k=32, tile_n=tile,
                        winners=winners,
                    )[0]
                t0 = time.perf_counter()
                fn()
                compile_s = time.perf_counter() - t0
                t = slope_time(fn)
            except Exception as e:
                log(f"tile={tile} w={winners}: FAILED {type(e).__name__}: {e}")
                continue
            if args.mode == "rescored":
                s_got, i_got = pallas_search_block_topk_rescored(
                    scan, values, sqnorms, valid, queries,
                    metric=metric, k=K, k_sel=32, tile_n=tile,
                    winners=winners,
                )
                i_got = np.asarray(i_got)
                recall = np.mean([
                    len(set(i_got[b, :10]) & set(i_ref[b, :10])) / 10
                    for b in range(B)
                ])
            else:
                recall = float("nan")
            gbps = n * D * 2 / t / 1e9
            tflops = 2 * B * n * D / t / 1e12
            log(
                f"tile={tile:6d} w={winners}: {t * 1e3:7.3f} ms/batch "
                f"= {B / t:9,.0f} QPS  bf16-read {gbps:6.1f} GB/s  "
                f"{tflops:5.1f} TF/s  recall@10={recall:.4f} "
                f"(compile {compile_s:.1f}s)"
            )


if __name__ == "__main__":
    main()
