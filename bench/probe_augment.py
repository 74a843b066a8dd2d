"""Augment-cost probe: what does the locality-augmentation pool cost?

The default amk profile widens the 128-candidate exact-rescore pool with
the row neighborhoods of the top 8 candidates (+72 rows — see
kernels/amk.py ``augment``), closing the consecutive-near-duplicate
shard-collision case from ADVICE round 2. This measures its ms/batch cost
against augment=0 at 1M x 384 b=256, per metric, so the default can be
justified (or demoted) with a number.

Run on the TPU:  python -m bench.probe_augment
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.kernels.amk import amk_search_topk_rescored

N, D, B, K = 1_000_000, 384, 256, 10


def slope_time(fn, reps=(4, 24)):
    """ms per call via a two-point slope. Sync is a HOST FETCH of the
    last result — through the axon relay block_until_ready can return
    before the work drains (bench.py timing note), which is how a
    negative slope can otherwise appear."""
    def chain(m):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(m)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
        return time.perf_counter() - t0

    chain(2)  # warm/compile
    t_small = min(chain(reps[0]) for _ in range(2))
    t_large = min(chain(reps[1]) for _ in range(2))
    return (t_large - t_small) / (reps[1] - reps[0]) * 1e3


def main():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((N, D), dtype=np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    q = rng.standard_normal((B, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    dv_f32 = jax.device_put(jnp.asarray(v))
    dv_bf = dv_f32.astype(jnp.bfloat16)
    dq = jax.device_put(jnp.asarray(q))
    sqn = jnp.sum(dv_f32 * dv_f32, axis=1)
    valid = jnp.ones((N,), bool)

    results = {}
    for metric in (SimilarityMetric.COSINE, SimilarityMetric.EUCLIDEAN,
                   SimilarityMetric.DOT_PRODUCT):
        for aug in (0, 8):
            ms = slope_time(lambda m=metric, a=aug: amk_search_topk_rescored(
                dv_bf, dv_f32, sqn, valid, dq, metric=m, k=K, augment=a))
            results[f"{metric.name.lower()}_aug{aug}_ms"] = round(ms, 3)
    for key in ("cosine", "euclidean", "dot_product"):
        a0 = results[f"{key}_aug0_ms"]
        a8 = results[f"{key}_aug8_ms"]
        results[f"{key}_overhead_pct"] = round((a8 - a0) / a0 * 100, 1)

    print(json.dumps(results, indent=2))
    with open("bench/report_augment_probe.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
