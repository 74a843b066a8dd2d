"""Locate the sustained-serving plateau: transport or framework?

Round-3 serving runs plateau at ~17-18K QPS (1M x 384, b=256) however
the fetch pattern is arranged (8 threads, depth-4 pipeline, grouped
fetch) while the pure kernel does 43-56K. cProfile shows only ~2.5 ms
of host CPU per batch; the rest of the 14 ms/batch effective is
blocking relay I/O. This probe separates the pipeline's three segments:

  dispatch-only   — device_put(queries) + jitted scan enqueue, results
                    DISCARDED (one final fetch syncs the tail). The
                    ceiling the transport imposes on the dispatch side
                    (query upload = 384 KB/batch).
  fetch-only      — repeated np.asarray of a CACHED device result
                    (32 KB payload): the per-RPC floor of the result
                    side, no new compute.
  full            — the production search_batch_arrays loop (upload +
                    scan + fetch + assembly) for reference.

If dispatch-only sustains well above the serving plateau while
fetch-only shows a fixed ~25 ms RPC floor, the plateau is the relay
transport, not framework host work — on co-located serving hardware
(no tunnel) the framework supports dispatch-rate QPS.

Run on the TPU:  python -m bench.probe_serving_wall
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

D, B, N, K = 384, 256, 1 << 20, 10


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(0)
    data = rng.standard_normal((N, D), dtype=np.float32)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        ids=np.arange(N, dtype=np.uint64),
        values=data.astype(np.float64),
        texts=None,
        metadatas=None,
    )
    q64 = rng.standard_normal((B, D)).astype(np.float64)
    q32 = q64.astype(np.float32)
    for _ in range(3):
        idx.search_batch_arrays(q64, K, SimilarityMetric.COSINE)

    results = {}

    # full production loop
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        idx.search_batch_arrays(q64, K, SimilarityMetric.COSINE)
    wall = time.perf_counter() - t0
    results["full_ms_per_batch"] = round(wall / iters * 1e3, 2)
    results["full_qps"] = round(iters * B / wall)

    # dispatch-only: enqueue scans, discard results, sync once at the end
    devs = []
    t0 = time.perf_counter()
    for _ in range(iters):
        dev, _ = idx._dispatch_arrays(
            q64, q32, K, SimilarityMetric.COSINE, None
        )
        devs.append(dev)
    np.asarray(devs[-1][0])  # drain the queue
    wall = time.perf_counter() - t0
    results["dispatch_only_ms_per_batch"] = round(wall / iters * 1e3, 2)
    results["dispatch_only_qps"] = round(iters * B / wall)
    devs.clear()

    # fetch-only: repeatedly pull one cached [B, k_sel] result pair
    dev, _ = idx._dispatch_arrays(
        q64, q32, K, SimilarityMetric.COSINE, None
    )
    np.asarray(dev[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(dev[0])
        np.asarray(dev[1])
    wall = time.perf_counter() - t0
    results["fetch_only_ms_per_batch"] = round(wall / iters * 1e3, 2)

    log(json.dumps(results, indent=2))
    print(json.dumps(results))
    with open("bench/report_serving_wall.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
