"""Round-4 rescore-stage attack: where do the ~1.7 ms past selection go?

probe_roofline_r4 (same day, same window class) measured sel+agg at
rt=0.99 = 1.94 ms but the shipped engine at 3.67 ms. This probe times
engine VARIANTS that each remove one suspect from the rescore stage:

* v_prec   — exact einsum at default precision (HIGHEST runs 6 bf16
             passes; 3-pass f32-equivalent is plenty to order a 200-pool
             whose candidates differ by bf16-displacement magnitudes)
* v_noaug  — augment=0 (pool 128, no neighborhood gather): is the
             augment slice/concat/gather the cost?
* v_aug4   — augment=4 (pool 164)
* v_ksel64 — k_sel=64 + augment 8 (pool 136): cheaper aggregation
* v_rt98   — rt=0.98 frontier point (same 8192 width as 0.97)

Every variant reports ms + recall@10 on 4x256 queries vs cached f64
ground truth (shared with probe_roofline_r4). Arrays are ARGUMENTS to
every jit (the closure-inlining relay hang, see probe_roofline_r4).

Run: python -m bench.probe_rescore_r4
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
RECALL_BATCHES = 4


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

    # v1 token: must stay in lockstep with probe_roofline_r4 (shared
    # cache + identical rng(0) generation order)
    gt_path = f"/tmp/gt_roofline_v1s0_{N}_{D}_{B}_{RECALL_BATCHES}.npz"
    if not os.path.exists(gt_path):
        log("no cached ground truth — run probe_roofline_r4 first")
        sys.exit(1)
    z = np.load(gt_path)
    truths = [z[f"t{i}"] for i in range(RECALL_BATCHES)]
    log("ground truth loaded")

    log("uploading corpus...")
    v32 = jax.device_put(jnp.asarray(data))
    vbf = v32.astype(jnp.bfloat16)
    sqn = jnp.sum(v32 * v32, axis=1)
    valid = jnp.ones((N,), bool)
    live_hi = jnp.asarray(N, jnp.int32)
    qs = [jax.device_put(jnp.asarray(qn)) for qn in qs_np]
    qd = qs[0]
    jax.block_until_ready((v32, vbf, sqn, valid, qd))
    log("corpus on device")

    def recall(fn):
        hits = total = 0
        for q, truth in zip(qs, truths):
            ids = np.asarray(fn(q)[1])[:, :K]
            hits += sum(
                len(set(ids[b]) & set(truth[b])) for b in range(B)
            )
            total += K * B
        return hits / total, total - hits

    # ---- parameterized engine (mirror of amk_search_topk_rescored,
    # with precision/augment/k_sel as knobs) -------------------------
    @functools.partial(
        jax.jit,
        static_argnames=("rt", "k_sel", "augment", "prec"),
    )
    def engine(q, vbf, v32, sqn, valid, live_hi, rt=0.99, k_sel=128,
               augment=8, prec="highest"):
        dot = amk._matmul(q, vbf)
        rank = jnp.where(
            valid[None, :], amk._rank_scores(dot, met, sqn), amk.NEG_INF
        )
        _, i_sel = jax.lax.approx_max_k(rank, k_sel, recall_target=rt)
        if augment > 0:
            top = i_sel[:, :augment]
            offs = jnp.arange(
                -amk._AUGMENT_RADIUS, amk._AUGMENT_RADIUS + 1
            )
            aug = jnp.clip(
                top[:, :, None] + offs[None, None, :], 0, N - 1
            ).reshape(top.shape[0], -1)
            i_sel = jnp.concatenate([i_sel, aug], axis=1)
        # inline rescore with precision knob
        i_sel = jnp.sort(i_sel, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((i_sel.shape[0], 1), bool),
             i_sel[:, 1:] == i_sel[:, :-1]], axis=1)
        rows = v32[i_sel].astype(jnp.float32)
        qf = q.astype(jnp.float32)
        dotx = jnp.einsum(
            "bkd,bd->bk", rows, qf,
            precision=(jax.lax.Precision.HIGHEST if prec == "highest"
                       else jax.lax.Precision.DEFAULT),
        )
        rowsq = jnp.sum(rows * rows, axis=-1)
        qsq = jnp.sum(qf * qf, axis=-1, keepdims=True)
        denom = jnp.sqrt(qsq) * jnp.sqrt(rowsq)
        exact = jnp.where(
            denom > 0.0, dotx / jnp.maximum(denom, 1e-30), 0.0
        )
        ok = i_sel < live_hi
        exact = jnp.where(ok & ~dup, exact, amk.NEG_INF)
        s_top, pos = jax.lax.top_k(exact, K)
        return s_top, jnp.take_along_axis(i_sel, pos, axis=1)

    def shipped(q, rt=0.99):
        return amk.amk_search_topk_rescored(
            vbf, v32, sqn, valid, q, metric=met, k=K,
            recall_target=rt, tombstones=False, live_hi=live_hi,
        )

    out = {}

    def run_variant(tag, make):
        fn2_local = make
        out[tag + "_ms"] = timeit(lambda: fn2_local(qd))
        qps = B / (out[tag + "_ms"] / 1e3)
        r, m = recall(fn2_local)
        out[tag + "_recall"], out[tag + "_missed"] = r, m
        log(f"{tag}: {out[tag + '_ms']:.3f} ms = {qps:,.0f} QPS "
            f"recall {r:.5f} ({m} missed)")

    run_variant("anchor_shipped", lambda q: shipped(q))
    run_variant(
        "v_mirror",
        lambda q: engine(q, vbf, v32, sqn, valid, live_hi),
    )
    run_variant(
        "v_prec",
        lambda q: engine(q, vbf, v32, sqn, valid, live_hi, prec="def"),
    )
    run_variant(
        "v_noaug",
        lambda q: engine(q, vbf, v32, sqn, valid, live_hi, augment=0),
    )
    run_variant(
        "v_noaug_prec",
        lambda q: engine(
            q, vbf, v32, sqn, valid, live_hi, augment=0, prec="def"
        ),
    )
    run_variant(
        "v_aug4",
        lambda q: engine(q, vbf, v32, sqn, valid, live_hi, augment=4),
    )
    run_variant(
        "v_ksel64",
        lambda q: engine(q, vbf, v32, sqn, valid, live_hi, k_sel=64),
    )
    run_variant(
        "v_rt98",
        lambda q: engine(q, vbf, v32, sqn, valid, live_hi, rt=0.98),
    )
    run_variant(
        "v_rt98_prec",
        lambda q: engine(
            q, vbf, v32, sqn, valid, live_hi, rt=0.98, prec="def"
        ),
    )
    run_variant("anchor_shipped2", lambda q: shipped(q))

    path = os.path.join(
        os.path.dirname(__file__), "report_rescore_r4.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
