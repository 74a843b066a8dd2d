"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: batched exact cosine top-10 search QPS on a 100K x 384 corpus
(BASELINE.md eval config 2 scale, the serving-path hot loop). The reference
publishes no measured numbers (BASELINE.md); the baseline denominator is a
measured CPU float64 exact scan on this host — the direct analogue of the
reference's single-process linear scan (reference: src/index/flat.rs:98-119),
since the Rust toolchain is not available in this image.

Runs on whatever JAX platform the environment provides (real TPU under the
driver). Secondary numbers go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


N = 100_000
D = 384
BATCH = 256
K = 10
ITERS = 30


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def cpu_baseline_qps(values64: np.ndarray, queries64: np.ndarray) -> float:
    """Float64 exact cosine scan + top-k on host CPU (reference analogue)."""
    v_norm = np.linalg.norm(values64, axis=1)
    v_norm[v_norm == 0] = 1.0
    reps = 2
    start = time.perf_counter()
    for _ in range(reps):
        dots = queries64 @ values64.T
        q_norm = np.linalg.norm(queries64, axis=1, keepdims=True)
        scores = dots / (q_norm * v_norm[None, :])
        # partial top-k like the reference's sort+truncate
        idx = np.argpartition(-scores, K, axis=1)[:, :K]
        np.take_along_axis(scores, idx, axis=1)
    elapsed = time.perf_counter() - start
    return reps * len(queries64) / elapsed


def tpu_qps() -> tuple[float, float]:
    import jax
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.kernels.topk import search_topk

    rng = np.random.default_rng(0)
    values64 = rng.normal(size=(N, D))
    queries64 = rng.normal(size=(BATCH, D))

    log(f"platform: {jax.devices()[0].platform} {jax.devices()[0]}")

    values = jnp.asarray(values64, dtype=jnp.float32)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(N, dtype=bool)
    queries = jnp.asarray(queries64, dtype=jnp.float32)

    def run():
        return search_topk(
            values,
            sqnorms,
            valid,
            queries,
            metric=SimilarityMetric.COSINE,
            k=16,  # k bucket covering K=10
        )

    # warmup / compile
    s, i = run()
    s.block_until_ready()

    # Sustained throughput: dispatch the whole pipeline, then drain every
    # result (blocking only on the last under-reports via async dispatch).
    start = time.perf_counter()
    outs = [run() for _ in range(ITERS)]
    for s, i in outs:
        s.block_until_ready()
        i.block_until_ready()
    elapsed = time.perf_counter() - start
    device_qps = ITERS * BATCH / elapsed
    log(
        f"device search: {elapsed / ITERS * 1e3:.3f} ms/batch "
        f"({device_qps:,.0f} QPS, batch={BATCH}, N={N}, D={D})"
    )

    log("measuring CPU float64 baseline (reference-analogue scan)...")
    baseline = cpu_baseline_qps(values64, queries64)
    log(f"cpu baseline: {baseline:,.1f} QPS")
    return device_qps, baseline


def main() -> None:
    qps, baseline = tpu_qps()
    print(
        json.dumps(
            {
                "metric": "flat_exact_cosine_top10_qps_100k_x384_b256",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
