"""1M HNSW build shoot-out: classic SIMD insert vs TPU bulk build
(+ NN-descent refinement) — VERDICT round-2 item 5 acceptance run.

Acceptance: bulk recall@10 >= 0.94 at ef=128 AND >= 2x the classic
build rate, else the item closes with these measurements.

Run one mode at a time (classic is host-only and can run during chip
congestion; bulk needs the TPU):

    python -m bench.bulk_1m --mode classic
    python -m bench.bulk_1m --mode bulk --refine 0
    python -m bench.bulk_1m --mode bulk --refine 1

Each run merges its result into bench/report_bulk_1m.json.
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

from pathlib import Path

import numpy as np

D = 384
N = 1_000_000


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_embeddings(n, d=D, n_clusters=256, spread=0.35, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    data = centers[assign] + spread * rng.normal(size=(n, d)) / np.sqrt(d)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    return data.astype(np.float32)


def recall_at(idx, data, ef, nq=128, k=10, seed=11):
    rng = np.random.default_rng(seed)
    qidx = rng.integers(0, len(data), nq)
    queries = data[qidx] + (
        0.05 * rng.normal(size=(nq, D)).astype(np.float32) / np.sqrt(D)
    )
    v = data.astype(np.float64)
    q = queries.astype(np.float64)
    s = (q @ v.T) / (
        np.linalg.norm(q, axis=1, keepdims=True)
        * np.linalg.norm(v, axis=1)[None, :]
    )
    truth = np.argsort(-s, axis=1)[:, :k]
    from vectorlite_tpu.core.metrics import SimilarityMetric

    qlist = [list(map(float, row)) for row in queries]
    t0 = time.perf_counter()
    res = idx.search_batch(
        qlist, k, SimilarityMetric.COSINE, ef=ef, use_device=False
    )
    search_s = (time.perf_counter() - t0) / nq
    rec = float(
        np.mean(
            [
                len({r.id for r in row} & set(truth[i])) / k
                for i, row in enumerate(res)
            ]
        )
    )
    return rec, search_s * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=["classic", "bulk", "auto"], required=True
    )
    ap.add_argument("--refine", type=int, default=1)
    ap.add_argument("--n", type=int, default=N)
    ap.add_argument("--out", default="bench/report_bulk_1m.json")
    args = ap.parse_args()

    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.core.types import Vector
    from vectorlite_tpu.index.hnsw import HNSWIndex

    label = args.mode + (
        f"_refine{args.refine}" if args.mode == "bulk" else ""
    )

    log(f"[{label}] generating {args.n} x {D} clustered embeddings...")
    data = make_embeddings(args.n)

    if args.mode == "bulk":
        os.environ["VECTORLITE_BULK_BUILD"] = "always"
        os.environ["VECTORLITE_BULK_REFINE"] = str(args.refine)
        os.environ["VECTORLITE_BULK_PROFILE"] = "1"
    elif args.mode == "auto":
        # VERDICT r4 item 7: the as-shipped default path — no env
        # overrides; the >=400K-rows-on-TPU policy (index/hnsw.py)
        # must engage by itself through the normal add_batch_arrays
        for k in ("VECTORLITE_BULK_BUILD", "VECTORLITE_BULK_REFINE",
                  "VECTORLITE_BULK_PROFILE"):
            os.environ.pop(k, None)
    else:
        os.environ["VECTORLITE_BULK_BUILD"] = "never"

    idx = HNSWIndex(D, SimilarityMetric.COSINE, store_f64=False)
    log(f"[{label}] building...")
    t0 = time.perf_counter()
    idx.add_batch_arrays(
        ids=np.arange(args.n, dtype=np.uint64),
        values=data.astype(np.float64),
        texts=None,
        metadatas=None,
    )
    build_s = time.perf_counter() - t0
    rate = args.n / build_s
    log(f"[{label}] built in {build_s:.0f}s = {rate:,.0f} inserts/s")

    entry = {
        "mode": label,
        "n": args.n,
        "build_s": round(build_s, 1),
        "inserts_per_s": round(rate, 1),
        "bulk_engaged": bool(getattr(idx, "_bulk_built", False)),
        "sweep": [],
    }
    for ef in (64, 128):
        rec, p50 = recall_at(idx, data, ef)
        log(f"[{label}] ef={ef}: recall@10={rec:.4f}  host p50 {p50:.2f} ms")
        entry["sweep"].append(
            {"ef": ef, "recall_at_10": round(rec, 4), "p50_ms": round(p50, 3)}
        )

    out = Path(args.out)
    report = json.loads(out.read_text()) if out.exists() else {}
    report[label] = entry
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
