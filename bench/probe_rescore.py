"""Decompose the amk engine's rescore stage at headline scale.

The selection pass is at the roofline (81-89% of bf16 peak / HBM BW,
BASELINE.md round 3); the remaining ~2 ms/batch lives in the exact
stage: sort(i_sel) -> row gather [B, P, D] f32 -> HIGHEST einsum ->
top_k. This probe times cumulative prefixes of that pipeline so the
next optimization targets the real cost, not a guess:

  sel      selection only (fused matmul + approx_max_k)
  sel+gat  ... + sorted candidate row gather (reduced to a checksum
           so XLA cannot drop the gather)
  sel+ein  ... + the HIGHEST einsum (no top_k)
  full128  the shipped engine, augment=0 (pool 128)
  full200  the shipped engine, augment=8 (pool 200, default)
  ein_dp   full128 but the rescore einsum at DEFAULT precision
           (diagnostic only — DEFAULT is bf16 multipliers, which would
           break the exact-score contract; measures what HIGHEST costs)

Run on the chip: python -m bench.probe_rescore
Writes bench/report_rescore_probe.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

N, D, B, K, K_SEL = 1_048_576, 384, 256, 16, 128


def slope(f, iters=12, reps=3):
    f()

    def chain(m):
        t0 = time.perf_counter()
        r = None
        for _ in range(m):
            r = f()
        np.asarray(r[0] if isinstance(r, tuple) else r).ravel()[:1]
        return time.perf_counter() - t0

    out = []
    for _ in range(reps):
        ts = min(chain(2) for _ in range(2))
        tl = min(chain(2 + iters) for _ in range(2))
        out.append((tl - ts) / iters)
    return sorted(out)[reps // 2]


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.kernels import amk

    rng = np.random.default_rng(0)
    host = rng.normal(size=(N, D)).astype(np.float32)
    host /= np.linalg.norm(host, axis=1, keepdims=True)
    values = jnp.asarray(host)
    scan = values.astype(jnp.bfloat16)
    sqnorms = jnp.sum(values.astype(jnp.float32) ** 2, axis=1)
    valid = jnp.ones(N, bool)
    queries = jnp.asarray(
        host[:B] + 0.01 * rng.normal(size=(B, D)).astype(np.float32)
    )
    met = SimilarityMetric.COSINE

    @functools.partial(jax.jit, static_argnames=("stage",))
    def prefix(scan, values, sqnorms, valid, queries, stage="sel"):
        dot = amk._matmul(queries, scan)
        rank = jnp.where(
            valid[None, :],
            amk._rank_scores(dot, met, sqnorms),
            amk.NEG_INF,
        )
        s, i_sel = jax.lax.approx_max_k(rank, K_SEL, recall_target=0.99)
        if stage == "sel":
            return s, i_sel
        i_sorted = jnp.sort(i_sel, axis=1)
        rows = values[i_sorted].astype(jnp.float32)  # [B, P, D]
        if stage == "gat":
            # cheap reduce keeps the gather live without einsum cost
            return jnp.sum(rows, axis=(1, 2)), i_sorted
        prec = (
            jax.lax.Precision.HIGHEST
            if stage != "ein_dp"
            else jax.lax.Precision.DEFAULT
        )
        dot2 = jnp.einsum(
            "bkd,bd->bk", rows, queries.astype(jnp.float32),
            precision=prec,
        )
        if stage == "ein":
            return dot2, i_sorted
        qsq = jnp.sum(queries.astype(jnp.float32) ** 2, 1, keepdims=True)
        denom = jnp.sqrt(qsq) * jnp.sqrt(sqnorms[i_sorted])
        exact = jnp.where(denom > 0, dot2 / jnp.maximum(denom, 1e-30), 0.0)
        exact = jnp.where(valid[i_sorted], exact, amk.NEG_INF)
        s_top, pos = jax.lax.top_k(exact, K)
        return s_top, jnp.take_along_axis(i_sorted, pos, axis=1)

    out = {}
    for stage, label in (
        ("sel", "sel"),
        ("gat", "sel+gather"),
        ("ein", "sel+gather+einsum"),
        ("topk", "sel+gather+einsum+topk (≈full128)"),
        ("ein_dp", "full128 with DEFAULT-precision einsum (diagnostic)"),
    ):
        t = slope(
            lambda stage=stage: prefix(
                scan, values, sqnorms, valid, queries, stage=stage
            )
        )
        out[stage] = round(t * 1e3, 3)
        print(f"{label:50s} {t * 1e3:7.3f} ms/batch", flush=True)

    for augment, key in ((0, "full128_engine"), (8, "full200_engine")):
        t = slope(
            lambda augment=augment: amk.amk_search_topk_rescored(
                scan, values, sqnorms, valid, queries,
                metric=met, k=K, k_sel=K_SEL, augment=augment,
            )
        )
        out[key] = round(t * 1e3, 3)
        print(f"{key:50s} {t * 1e3:7.3f} ms/batch", flush=True)

    Path("bench/report_rescore_probe.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
