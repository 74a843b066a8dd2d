"""Interleaved A/B of the amk serving scan: scan-copy dtype x augment.

Two questions the round-3 probes raised:

1. What does locality augmentation (+72 rescore rows) really cost on the
   headline cosine config? (probe_augment's un-interleaved numbers swung
   1.1 <-> 4.5 ms between windows.)
2. Does an int8 scan copy (s8 x s8 -> s32 on the MXU, half of bf16's HBM
   reads — probe_int8 measured selection 1.96 vs 2.51 ms) carry through
   to the full rescored kernel, and at what recall?

Arms, all cosine 1M x 384 b=256, exact-f32 rescore from resident rows:
  bf16_aug8   — the shipped default profile
  bf16_aug0
  int8_aug8   — s8 scan copy + per-row scales
  int8_aug0

Each arm is slope-timed (host-fetch sync) in interleaved rotation, three
rotations, min taken — adjacent-in-time measurements so window drift
cancels across arms. Recall@10 vs f64 truth is reported per arm.

Run on the TPU:  python -m bench.probe_scan_dtypes
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.kernels.amk import (
    amk_search_topk_rescored,
    int8_quantize,
)

N, D, B, K = 1_000_000, 384, 256, 10


def chain_ms(fn, m=16):
    t0 = time.perf_counter()
    outs = [fn() for _ in range(m)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / m * 1e3


def main():
    rng = np.random.default_rng(2)
    v = rng.standard_normal((N, D), dtype=np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    q = rng.standard_normal((B, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    dv = jax.device_put(jnp.asarray(v))
    dq = jax.device_put(jnp.asarray(q))
    dv_bf = dv.astype(jnp.bfloat16)
    dv_s8, dscales = int8_quantize(dv)
    sqn = jnp.sum(dv * dv, axis=1)
    valid = jnp.ones((N,), bool)

    live_hi = jnp.asarray(np.int32(N))

    def arm(scan, scales, aug):
        # tombstones=False/live_hi mirrors the shipped fresh-index
        # dispatch (the watermark rescore, post side-gather fix)
        return lambda: amk_search_topk_rescored(
            scan, dv, sqn, valid, dq,
            metric=SimilarityMetric.COSINE, k=K, augment=aug,
            scan_scales=scales, tombstones=False, live_hi=live_hi,
        )

    arms = {
        "bf16_aug8": arm(dv_bf, None, 8),
        "bf16_aug0": arm(dv_bf, None, 0),
        "int8_aug8": arm(dv_s8, dscales, 8),
        "int8_aug0": arm(dv_s8, dscales, 0),
    }

    truth = np.argsort(
        -(q.astype(np.float64) @ v.astype(np.float64).T), axis=1
    )[:, :K]
    results = {}
    for name, fn in arms.items():
        _, ids = fn()  # compile + recall check
        ids = np.asarray(ids)
        hits = sum(len(set(ids[b]) & set(truth[b])) for b in range(B))
        results[f"{name}_recall10"] = round(hits / (B * K), 5)

    for name, fn in arms.items():
        chain_ms(fn, 4)  # settle
    for rot in range(3):
        for name, fn in arms.items():
            ms = chain_ms(fn)
            key = f"{name}_ms"
            results[key] = min(results.get(key, ms), round(ms, 3))

    for name in arms:
        results[f"{name}_qps"] = round(B / results[f"{name}_ms"] * 1e3)
    print(json.dumps(results, indent=2))
    with open("bench/report_scan_dtypes.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
