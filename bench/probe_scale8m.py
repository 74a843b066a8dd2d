"""Round-4 8M-scale frontier: IVF partitioned scan + PQ pool ladder.

Three questions, one process (same-window comparability):

1. **IVF (VERDICT r3 item 2)** — on a *clustered* 8M corpus (the
   geometry IVF exists for; the activation guard refuses iid data by
   design, index/flat.py:_ivf_guard_nprobe), what does the
   nprobe -> (QPS, recall@10) frontier look like end-to-end through
   FlatIndex, vs the brute bf16 anchor on the same index?
   Acceptance: >=15K QPS at recall@10 >= 0.99.
2. **PQ pool ladder (VERDICT r3 item 3)** — on the SAME iid corpus
   round 3 measured 0.9422 on (bench/report_flat8m.json), how much of
   the recall gap do the round-4 levers close: size-scaled pool floor
   (256 -> 512 at 8M), pool sweep 256/512/1024, wider scan chunks,
   longer codebook training? Acceptance: >=0.98 at >=700 QPS, or the
   measured quantizer ceiling.
3. **flat8m re-measure (VERDICT r3 item 8b)** — the round-3 iid bf16
   brute rung quoted from a `stable_window: false` report; re-measure
   in this window alongside a calibration anchor.

Run: python -m bench.probe_scale8m [--skip-ivf] [--skip-pq]
Writes bench/report_scale8m.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)

import numpy as np

N = int(os.environ.get("SCALE8M_N", 8_388_608))  # smoke: set tiny
D = 384
BATCH = 256
NQ = 64
K = 10


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_clustered(n, d, *, n_clusters=8192, seed=0):
    """Mixture-of-gaussians corpus with eigen-decaying within-cluster
    spread — the locality structure real embedding corpora have and
    iid gaussian lacks. Noise base 0.2 against unit centers puts the
    total within-cluster noise variance at ~0.24 (sum of
    0.04/(1+i) ~ 0.04 * H_384), i.e. measured same-cluster cosine
    ~0.82, between ~0 — topical-cluster geometry. The round-4 version
    of this generator scaled noise by a further 3x, which made the
    noise norm (~2.5) swamp the unit centers: same-cluster cosine
    measured 0.093, true neighbors scattered across cells, and the IVF
    cell-recall guard refused the 'clustered' corpus — correctly
    (bench round 5; the guard was validated by the bug)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d), dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # eigen-decay the noise so the data is anisotropic like real
    # embeddings (PCA spectrum ~ 1/sqrt(1+i))
    scale = 0.2 / np.sqrt(1.0 + np.arange(d, dtype=np.float32))
    out = np.empty((n, d), dtype=np.float64)
    step = 1 << 20
    for lo in range(0, n, step):
        m = min(step, n - lo)
        cid = rng.integers(0, n_clusters, m)
        rows = centers[cid] + rng.standard_normal(
            (m, d), dtype=np.float32
        ) * scale[None, :]
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        out[lo : lo + m] = rows
    return out


def make_iid(n, d, *, seed=0):
    rng = np.random.default_rng(seed)
    out = np.empty((n, d), dtype=np.float64)
    step = 1 << 20
    for lo in range(0, n, step):
        m = min(step, n - lo)
        rows = rng.standard_normal((m, d))
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        out[lo : lo + m] = rows
    return out


def truth_topk(data, queries, nq):
    t0 = time.perf_counter()
    scores = np.empty((nq, data.shape[0]), dtype=np.float32)
    step = 1 << 20
    q32 = queries[:nq].astype(np.float32)
    for lo in range(0, data.shape[0], step):
        scores[:, lo : lo + step] = q32 @ data[lo : lo + step].T.astype(
            np.float32
        )
    idx = np.argpartition(-scores, K, axis=1)[:, :K]
    out = [
        set(
            idx[b][np.argsort(-scores[b, idx[b]], kind="stable")][
                :K
            ].tolist()
        )
        for b in range(nq)
    ]
    log(f"  truth in {time.perf_counter() - t0:.0f}s")
    return out


def build_index(data, *, dtype, env):
    from vectorlite_tpu.index.flat import FlatIndex

    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: str(v) for k, v in env.items()})
    try:
        idx = FlatIndex(D, device_dtype=dtype)
        ids = np.arange(data.shape[0], dtype=np.uint64)
        t0 = time.perf_counter()
        step = 1 << 20
        for lo in range(0, data.shape[0], step):
            idx.add_batch_arrays(ids[lo : lo + step], data[lo : lo + step])
        ingest_s = time.perf_counter() - t0
        log(f"  ingest {ingest_s:.0f}s")
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return idx, ingest_s


def measure(idx, queries, truth, *, iters=8, label=""):
    from vectorlite_tpu.core.metrics import SimilarityMetric

    t0 = time.perf_counter()
    got = idx.search_batch_arrays(queries, K, SimilarityMetric.COSINE)
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        got = idx.search_batch_arrays(queries, K, SimilarityMetric.COSINE)
    t = (time.perf_counter() - t0) / iters
    hits = sum(
        len(set(got[0][b][:K].tolist()) & truth[b]) for b in range(NQ)
    )
    rec = hits / (NQ * K)
    row = {
        "first_s": round(first_s, 1),
        "warm_ms": round(t * 1e3, 3),
        "qps": round(BATCH / t, 1),
        "recall_at_10": round(rec, 4),
    }
    log(
        f"  {label}: {t * 1e3:.2f} ms/batch = {BATCH / t:,.0f} QPS, "
        f"recall@10 {rec:.4f} (first {first_s:.0f}s)"
    )
    return row


def calibration():
    """Tiny fixed matmul timing — window-health anchor."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1000, 384), dtype=np.float32))
    f = jax.jit(lambda a: a @ a.T)
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(f(x))
    return round((time.perf_counter() - t0) / 5 * 1e3, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-ivf", action="store_true")
    ap.add_argument("--skip-pq", action="store_true")
    ap.add_argument("--skip-brute", action="store_true")
    args = ap.parse_args()

    from vectorlite_tpu.core.metrics import SimilarityMetric  # noqa: F401

    rng = np.random.default_rng(1)
    queries = rng.standard_normal((BATCH, D))
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    path = os.path.join(os.path.dirname(__file__), "report_scale8m.json")
    out = {}
    if os.path.exists(path):
        try:  # merge: section-only re-runs must not drop earlier work
            with open(path) as f:
                out = json.load(f)
        except Exception:
            out = {}
    out.update(
        {"config": "scale8m_r5", "n": N, "calib_t0_ms": calibration()}
    )
    log(f"calibration anchor: {out['calib_t0_ms']} ms")

    def checkpoint():
        # write-then-overwrite after every section: a timeout kill at
        # any point must leave the measured sections on disk (the
        # round-4 lesson — BENCH_r04 went null for lack of exactly this)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)

    # ---------------- clustered corpus: IVF frontier ----------------
    if not args.skip_ivf:
        # f32 corpus cache keyed by generator version + N: the 8M
        # generation costs ~10 min of single-core wall per attempt and
        # every consumer casts to f32 anyway
        cache = f"/tmp/scale8m_clustered_b02_{N}.npy"
        if os.path.exists(cache):
            log(f"[ivf] loading cached corpus {cache}")
            data = np.load(cache)
        else:
            log("[ivf] generating clustered 8M corpus...")
            data = make_clustered(N, D).astype(np.float32)
            np.save(cache, data)
        # queries from the corpus distribution (perturbed rows) — IVF
        # recall is meaningless for off-manifold iid queries
        qsel = rng.choice(N, BATCH, replace=False)
        cq = data[qsel] + 0.05 * rng.standard_normal((BATCH, D))
        cq /= np.linalg.norm(cq, axis=1, keepdims=True)
        log("[ivf] f64->f32 ground truth (blocked numpy)...")
        truth = truth_topk(data, cq, NQ)
        idx, ingest_s = build_index(
            data,
            dtype="auto",
            env={"VECTORLITE_AUTO_BF16_GB": "8.0"},
        )
        del data
        ivf = {"ingest_s": round(ingest_s, 1), "sweep": {}}
        # first search triggers device sync + IVF auto-build (k-means)
        t0 = time.perf_counter()
        idx.search_batch_arrays(cq, K, SimilarityMetric.COSINE)
        ivf["build_first_s"] = round(time.perf_counter() - t0, 1)
        ivf["active"] = bool(idx._ivf_active)
        ivf["nprobe_floor"] = int(idx._ivf_nprobe_floor)
        if idx._ivf_rows is not None:
            ivf["C"] = int(idx._ivf_cent_sq.shape[0])
            ivf["P"] = int(idx._ivf_p)
        log(f"[ivf] active={ivf['active']} build {ivf['build_first_s']}s")
        for nprobe in (4, 8, 16, 24):
            os.environ["VECTORLITE_IVF_NPROBE"] = str(nprobe)
            try:
                ivf["sweep"][str(nprobe)] = measure(
                    idx, cq, truth, label=f"ivf nprobe={nprobe}"
                )
            finally:
                os.environ.pop("VECTORLITE_IVF_NPROBE", None)
            out["ivf_clustered"] = ivf
            checkpoint()
        # brute anchor on the same index/corpus: an absurd nprobe makes
        # _ivf_topk decline (probed bytes > half the corpus) and the
        # brute amk engine serves — same rows, same window
        os.environ["VECTORLITE_IVF_NPROBE"] = "512"
        try:
            ivf["brute_bf16"] = measure(
                idx, cq, truth, label="brute bf16 (clustered)"
            )
        finally:
            os.environ.pop("VECTORLITE_IVF_NPROBE", None)
        out["ivf_clustered"] = ivf
        del idx
        out["calib_t1_ms"] = calibration()
        checkpoint()

    # ---------------- iid corpus: PQ ladder + brute re-measure ------
    if not (args.skip_pq and args.skip_brute):
        log("[iid] generating iid 8M corpus (round-3 comparable)...")
        data = make_iid(N, D)
        iq = queries
        log("[iid] ground truth...")
        truth = truth_topk(data, iq, NQ)

    if not args.skip_brute:
        idx, ingest_s = build_index(
            data, dtype="auto", env={"VECTORLITE_AUTO_BF16_GB": "8.0"}
        )
        row = measure(idx, iq, truth, label="brute bf16 (iid)")
        row["ingest_s"] = round(ingest_s, 1)
        # the guard must have REFUSED iid data (that's the design)
        row["ivf_active"] = bool(idx._ivf_active)
        out["iid_bf16_brute"] = row
        del idx
        out["calib_t2_ms"] = calibration()
        checkpoint()

    if not args.skip_pq:
        idx, ingest_s = build_index(
            data,
            dtype="pq",
            env={"VECTORLITE_PQ_TRAIN_SAMPLE": "65536"},
        )
        pq = {"ingest_s": round(ingest_s, 1), "pool": {}}
        for pool in (256, 512, 1024):
            os.environ["VECTORLITE_PQ_POOL_MIN"] = str(pool)
            try:
                pq["pool"][str(pool)] = measure(
                    idx, iq, truth, label=f"pq pool={pool}"
                )
            finally:
                os.environ.pop("VECTORLITE_PQ_POOL_MIN", None)
        out["iid_pq"] = pq
        del idx
        out["calib_t3_ms"] = calibration()
        checkpoint()

    checkpoint()
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
