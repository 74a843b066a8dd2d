"""Decompose the PQ rung's end-to-end batch cost at 1M x 384.

Session-6 measured the pq1m config at kernel 33.6 ms but e2e
122 ms/batch — ~88 ms outside the scan. This probe splits one warm
`search_batch_arrays` into its stages so the next optimization targets
the real cost, not a guess:

  t_put      device_put of the [256, 384] query block (relay RPC)
  t_kernel   pq_search_topk dispatch -> block_until_ready
  t_fetch    device_get of the [B, pool] scores + slots
  t_rescore  host exact-f64 rescore of the pool (_exact_rescore,
             native flat_rescore_f64 path)
  t_pack     id mapping + packing
  t_e2e      the full public search_batch_arrays call

Run (chip): python -m bench.probe_pq_e2e
Writes bench/report_pq_e2e.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("VECTORLITE_PQ_TRAIN_SAMPLE", "65536")
os.environ["VECTORLITE_PQ_MIN_ROWS"] = "16384"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectorlite_tpu.core.metrics import SimilarityMetric  # noqa: E402
from vectorlite_tpu.index.flat import FlatIndex  # noqa: E402

B, D, K = 256, 384, 10
REPS = 10


def timeit(fn, reps=REPS):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    n = 1_048_576 if on_tpu else 16_384
    rng = np.random.default_rng(0)
    print(f"[pq_e2e] {n}x{D} corpus, platform={jax.devices()[0]}")
    data = rng.normal(size=(n, D))
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q64 = rng.normal(size=(B, D))
    q64 /= np.linalg.norm(q64, axis=1, keepdims=True)
    q32 = q64.astype(np.float32)

    idx = FlatIndex(D, device_dtype="pq")
    idx.add_batch_arrays(np.arange(n, dtype=np.uint64), data)
    idx.search_batch_arrays(q64, K, SimilarityMetric.COSINE)  # train+compile
    assert idx._pq_active, "pq rung did not engage"

    out = {"n": n, "pool": None}

    # stage: device_put of the query block
    out["t_put_ms"] = timeit(
        lambda: jax.device_put(q32).block_until_ready()
    )

    # stage: kernel only (device handles, then sync)
    def kernel_only():
        dev, _ = idx._dispatch_arrays(q64, q32, K, SimilarityMetric.COSINE, None)
        dev[0].block_until_ready()
        return dev

    out["t_kernel_ms"] = timeit(kernel_only)

    dev = kernel_only()
    out["pool"] = int(dev[0].shape[1])

    # stage: fetch of an ALREADY-COMPUTED result (relay read cost)
    out["t_fetch_ms"] = timeit(lambda: jax.device_get(dev))

    scores, slots = jax.device_get(dev)
    scores, slots = scores[:B], slots[:B]

    # stage: host exact rescore of the pool
    out["t_rescore_ms"] = timeit(
        lambda: idx._exact_rescore(q64, scores, slots, SimilarityMetric.COSINE)
    )

    r_scores, r_slots = idx._exact_rescore(
        q64, scores, slots, SimilarityMetric.COSINE
    )
    out["t_pack_ms"] = timeit(
        lambda: idx._pack_arrays(r_scores[:, :K], r_slots[:, :K], K, K)
    )

    # the real thing
    out["t_e2e_ms"] = timeit(
        lambda: idx.search_batch_arrays(q64, K, SimilarityMetric.COSINE)
    )

    # pipelined stream: device scan of batch i+D overlaps the relay
    # fetch + host f64 rescore of batch i (the production sustained
    # path); fresh query batches so no relay/jit caching flatters it
    qs = [
        (lambda a: a / np.linalg.norm(a, axis=1, keepdims=True))(
            rng.normal(size=(B, D))
        )
        for _ in range(24)
    ]
    for depth in (2, 4):
        t0 = time.perf_counter()
        res = list(
            idx.search_batch_stream(
                iter(qs), K, SimilarityMetric.COSINE, depth=depth
            )
        )
        dt = time.perf_counter() - t0
        assert len(res) == len(qs)
        out[f"t_stream_d{depth}_ms"] = dt / len(qs) * 1e3
        out[f"qps_stream_d{depth}"] = len(qs) * B / dt
    accounted = (
        out["t_kernel_ms"]
        + out["t_fetch_ms"]
        + out["t_rescore_ms"]
        + out["t_pack_ms"]
    )
    out["t_unaccounted_ms"] = round(out["t_e2e_ms"] - accounted, 3)
    out = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in out.items()}
    print(json.dumps(out, indent=2))
    with open("bench/report_pq_e2e.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
