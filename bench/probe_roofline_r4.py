"""Round-4 selection/rescore roofline + fold-in-epilogue candidates.

Round-3 proved the *selection* stage at 81-89% of bf16 peak; the
dispatch-anatomy probe (commit ccab447) then showed the shipped
engine's remaining cost sits in selection's aggregation, not the
rescore (rescore incremental ~0.65 ms; the round-3 "fusion overhead"
was cross-window noise). This probe produces the definitive ONE-window
per-stage table plus the two cheapest known attacks on the
shard-collision recall floor:

* stage table: matmul floor (pure HBM read) -> +PartialReduce
  (aggregate_to_topk=False) -> +aggregation -> +rescore, every number
  from the same process with the base engine re-measured alongside
  each candidate (A/B pairing cancels shared-chip drift);
* width ladder: approx_max_k's shard-winner width as a function of
  recall_target (it quantizes; rt boundaries locate the real knob);
* fold-in-epilogue: ONE matmul whose [B, N] rank matrix is group-max
  folded [B, N/F] *inside the fusion* (reshape-max over adjacent or
  strided row groups), then PartialReduce over groups and exact
  rescore of the F-expanded pool. Group members can never hide each
  other (they expand together), so shard-top-1 collisions — the
  measured source of every base-engine miss — need two distinct true-
  winner *groups* per shard. The round-3 fold probe paid 1.4x for F
  separate matmuls; the reshape form keeps one dispatch.

Run on the TPU:  python -m bench.probe_roofline_r4
"""

from __future__ import annotations

import functools
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
RECALL_BATCHES = 4  # 4 x 2560 hits for the finalists


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

    met = SimilarityMetric.COSINE
    rng = np.random.default_rng(0)
    data = rng.standard_normal((N, D), dtype=np.float32)
    qs_np = [
        rng.standard_normal((B, D), dtype=np.float32)
        for _ in range(RECALL_BATCHES)
    ]

    # f64 ground truth FIRST (cached: ~6 min of 1-core f64 matmul) —
    # before any device work, so a hung relay upload can't waste it
    # v1 token: bump when corpus/query generation changes — the cache
    # would otherwise silently serve stale truth for new data
    gt_path = f"/tmp/gt_roofline_v1s0_{N}_{D}_{B}_{RECALL_BATCHES}.npz"
    if os.path.exists(gt_path):
        z = np.load(gt_path)
        truths = [z[f"t{i}"] for i in range(RECALL_BATCHES)]
        log("ground truth loaded from cache")
    else:
        v64 = data.astype(np.float64)
        vn = np.linalg.norm(v64, axis=1)[None, :]
        truths = []
        for qn in qs_np:
            q64 = qn.astype(np.float64)
            ts = (q64 @ v64.T) / (
                np.linalg.norm(q64, axis=1, keepdims=True) * vn
            )
            truths.append(np.argsort(-ts, axis=1)[:, :K])
        np.savez(
            gt_path, **{f"t{i}": t for i, t in enumerate(truths)}
        )
        del v64
        log("ground truth ready")

    log("uploading corpus...")
    t_up = time.perf_counter()
    v32 = jax.device_put(jnp.asarray(data))
    vbf = v32.astype(jnp.bfloat16)
    sqn = jnp.sum(v32 * v32, axis=1)
    valid = jnp.ones((N,), bool)
    live_hi = jnp.asarray(N, jnp.int32)
    qs = [jax.device_put(jnp.asarray(qn)) for qn in qs_np]
    qd = qs[0]
    jax.block_until_ready((v32, vbf, sqn, valid, qd))
    log(f"corpus on device in {time.perf_counter() - t_up:.1f}s")

    def recall(fn, batches=1):
        hits = total = 0
        for q, truth in zip(qs[:batches], truths[:batches]):
            ids = np.asarray(fn(q)[1])[:, :K]
            hits += sum(
                len(set(ids[b]) & set(truth[b])) for b in range(B)
            )
            total += K * B
        return hits / total, total - hits

    out = {"window": {}}

    def base(q, rt=0.99):
        return amk.amk_search_topk_rescored(
            vbf, v32, sqn, valid, q,
            metric=met, k=K, recall_target=rt,
            tombstones=False, live_hi=live_hi,
        )

    # window health anchors: base engine measured repeatedly; every
    # candidate row quotes the nearest anchor so drift is visible
    def anchor(tag):
        ms = timeit(lambda: base(qd))
        out["window"][tag] = ms
        log(f"anchor[{tag}]: base rt=0.99 {ms:.3f} ms")
        return ms

    anchor("t0")

    # ---- stage table ------------------------------------------------
    # NB: big arrays are ARGUMENTS, never closures — a closed-over
    # corpus gets inlined into the HLO and the remote compiler hangs /
    # rejects it (verify-skill gotcha, observed live this round).
    @jax.jit
    def matmul_floor(q, vbf):
        return jnp.max(amk._matmul(q, vbf)), jnp.int32(0)

    out["stage_matmul_floor_ms"] = timeit(lambda: matmul_floor(qd, vbf))
    log(f"matmul floor: {out['stage_matmul_floor_ms']:.3f} ms")

    @functools.partial(jax.jit, static_argnames=("rt", "agg"))
    def sel_only(q, vbf, sqn, valid, rt=0.99, agg=True):
        dot = amk._matmul(q, vbf)
        rank = jnp.where(
            valid[None, :], amk._rank_scores(dot, met, sqn), -np.inf
        )
        s, i = jax.lax.approx_max_k(
            rank, 128, recall_target=rt, aggregate_to_topk=agg
        )
        return jnp.max(s), jnp.min(i)

    out["stage_sel_noagg_rt99_ms"] = timeit(
        lambda: sel_only(qd, vbf, sqn, valid, agg=False)
    )
    out["stage_sel_rt99_ms"] = timeit(lambda: sel_only(qd, vbf, sqn, valid))
    out["stage_sel_rt95_ms"] = timeit(
        lambda: sel_only(qd, vbf, sqn, valid, rt=0.95)
    )
    out["stage_engine_rt99_ms"] = timeit(lambda: base(qd))
    out["stage_engine_rt95_ms"] = timeit(lambda: base(qd, 0.95))
    r99, m99 = recall(lambda q: base(q), RECALL_BATCHES)
    r95, m95 = recall(lambda q: base(q, 0.95), RECALL_BATCHES)
    out["stage_engine_rt99_recall"] = r99
    out["stage_engine_rt99_missed"] = m99
    out["stage_engine_rt95_recall"] = r95
    out["stage_engine_rt95_missed"] = m95
    for k in sorted(out):
        if k.startswith("stage"):
            log(f"{k}: {out[k]}")

    anchor("t1")

    # ---- width ladder -----------------------------------------------
    widths = {}
    x = jnp.zeros((1, N), jnp.float32)
    for rt in (0.90, 0.95, 0.96, 0.97, 0.98, 0.99, 0.995):
        _, i = jax.lax.approx_max_k(
            x, 128, recall_target=rt, aggregate_to_topk=False
        )
        widths[str(rt)] = int(i.shape[1])
    out["width_by_rt"] = widths
    log(f"widths: {widths}")

    # engine at the rt width-boundaries the ladder exposes
    tried = set()
    for rt, w in widths.items():
        if w in tried or float(rt) in (0.95, 0.99):
            continue
        tried.add(w)
        key = f"engine_rt{rt}"
        out[key + "_ms"] = timeit(lambda: base(qd, float(rt)))
        r, m = recall(lambda q: base(q, float(rt)), RECALL_BATCHES)
        out[key + "_recall"], out[key + "_missed"] = r, m
        log(
            f"{key}: {out[key + '_ms']:.3f} ms recall {r:.5f} "
            f"({m} missed) width {w}"
        )

    anchor("t2")

    # ---- fold-in-epilogue candidates ---------------------------------
    @functools.partial(
        jax.jit, static_argnames=("F", "rt", "strided", "k_sel")
    )
    def fold_engine(q, vbf, v32, sqn, valid, F=2, rt=0.99,
                    strided=False, k_sel=128):
        dot = amk._matmul(q, vbf)
        rank = jnp.where(
            valid[None, :], amk._rank_scores(dot, met, sqn), -np.inf
        )
        if strided:
            g = jnp.max(rank.reshape(B, F, N // F), axis=1)
        else:
            g = jnp.max(rank.reshape(B, N // F, F), axis=2)
        _, gi = jax.lax.approx_max_k(g, k_sel, recall_target=rt)
        if strided:
            rows = (
                gi[:, :, None]
                + (N // F) * jnp.arange(F, dtype=gi.dtype)[None, None, :]
            )
        else:
            rows = (
                gi[:, :, None] * F
                + jnp.arange(F, dtype=gi.dtype)[None, None, :]
            )
        rows = rows.reshape(B, -1)
        return amk._exact_rescore_device(
            rows, v32, None, q, met, K, live_hi
        )

    for F, rt, strided in (
        (2, 0.99, False),
        (2, 0.99, True),
        (4, 0.99, False),
        (2, 0.95, False),
        (4, 0.95, False),
    ):
        key = f"fold{F}{'s' if strided else 'a'}_rt{rt}"
        try:
            out[key + "_ms"] = timeit(
                lambda: fold_engine(
                    qd, vbf, v32, sqn, valid, F=F, rt=rt, strided=strided
                )
            )
            r, m = recall(
                lambda q: fold_engine(
                    q, vbf, v32, sqn, valid, F=F, rt=rt, strided=strided
                ),
                RECALL_BATCHES,
            )
            out[key + "_recall"], out[key + "_missed"] = r, m
            log(
                f"{key}: {out[key + '_ms']:.3f} ms recall {r:.5f}"
                f" ({m} missed)"
            )
        except Exception as e:  # noqa: BLE001 — probe must finish
            out[key + "_error"] = repr(e)[:200]
            log(f"{key}: FAILED {e!r}")

    anchor("t3")

    path = os.path.join(
        os.path.dirname(__file__), "report_roofline_r4.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
