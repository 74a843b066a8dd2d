"""Sustained concurrent serving benchmark at Pallas scale.

Measures steady-state index-level QPS on a 1M x 384 FlatIndex under:

* ``threads`` mode — S concurrent streams calling
  ``search_batch_arrays`` (the production serving path), the shape of a
  multi-client HTTP deployment: each stream's relay fetch + host
  assembly overlaps other streams' device scans.
* ``pipelined`` mode — one stream keeping D dispatches in flight
  (dispatch i+D issued before fetching i), the double-buffered dispatch
  VERDICT round-2 item 2 asks for, via FlatIndex.search_batch_stream.
* ``coalesced`` mode — S streams of SINGLE-query Collection.search_text
  calls (the exact shape of concurrent HTTP traffic), merged by the
  store/coalesce.py group-commit dispatcher into batched device work.
  The uncoalesced comparison point (VECTORLITE_COALESCE=0) pays one
  B=1 device dispatch per request.

Run: python -m bench.serving [--n 1048576] [--streams 1,2,4,6,8]
Writes bench/report_serving.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)

from pathlib import Path

import numpy as np

D = 384
K = 10
BATCH = 256


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_index(n):
    from vectorlite_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, D), dtype=np.float32)
    idx = FlatIndex(D)
    idx.add_batch_arrays(
        ids=np.arange(n, dtype=np.uint64),
        values=data.astype(np.float64),
        texts=None,
        metadatas=None,
    )
    queries = rng.standard_normal((BATCH, D), dtype=np.float32).astype(
        np.float64
    )
    return idx, queries


def bench_threads(idx, queries, n_streams, seconds=12.0):
    from vectorlite_tpu.core.metrics import SimilarityMetric

    stop = time.perf_counter() + seconds
    counts = [0] * n_streams
    errs = []

    def worker(s):
        try:
            while time.perf_counter() < stop:
                ids, _ = idx.search_batch_arrays(
                    queries, K, SimilarityMetric.COSINE
                )
                assert ids.shape == (BATCH, K)
                counts[s] += BATCH
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t0 = time.perf_counter()
    ts = [
        threading.Thread(target=worker, args=(s,)) for s in range(n_streams)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errs:
        raise errs[0]
    wall = time.perf_counter() - t0
    return sum(counts) / wall


def bench_pipelined(idx, queries, depth, seconds=12.0, group=1):
    from vectorlite_tpu.core.metrics import SimilarityMetric

    total = 0
    t0 = time.perf_counter()
    stream = idx.search_batch_stream(
        _repeat_until(queries, t0 + seconds),
        K,
        SimilarityMetric.COSINE,
        depth=depth,
        group=group,
    )
    for ids, _scores in stream:
        assert ids.shape == (BATCH, K)
        total += BATCH
    wall = time.perf_counter() - t0
    return total / wall


def _repeat_until(queries, deadline):
    while time.perf_counter() < deadline:
        yield queries


class _TableEmbedder:
    """Precomputed text->vector lookup: removes embed cost from the
    measurement so `coalesced` mode times the serving machinery only."""

    def __init__(self, table):
        self._table = table

    def generate_embedding(self, text):
        return self._table[text]

    def embed_batch(self, texts):
        return [self._table[t] for t in texts]

    def embed_batch_arrays(self, texts):
        return np.stack([self._table[t] for t in texts])

    @property
    def dimension(self):
        return D


def bench_coalesced(collection, embedder, n_streams, seconds=12.0):
    """S streams of single-query search_text against one collection."""
    from vectorlite_tpu.core.metrics import SimilarityMetric
    from vectorlite_tpu.observability import coalesce_stats

    texts = list(embedder._table.keys())
    stop = time.perf_counter() + seconds
    counts = [0] * n_streams
    errs = []
    before = coalesce_stats.snapshot()

    def worker(s):
        try:
            i = s
            while time.perf_counter() < stop:
                rows = collection.search_text(
                    texts[i % len(texts)], K, SimilarityMetric.COSINE,
                    embedder,
                )
                assert len(rows) == K
                counts[s] += 1
                i += n_streams
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t0 = time.perf_counter()
    ts = [
        threading.Thread(target=worker, args=(s,)) for s in range(n_streams)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errs:
        raise errs[0]
    wall = time.perf_counter() - t0
    after = coalesce_stats.snapshot()
    batches = after.get("batches", 0) - before.get("batches", 0)
    reqs = after.get("requests", 0) - before.get("requests", 0)
    avg_batch = round(reqs / batches, 2) if batches else None
    return sum(counts) / wall, avg_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--streams", default="1,2,4,6,8")
    ap.add_argument("--depths", default="1,2,4")
    ap.add_argument("--groups", default="4,8,16")
    ap.add_argument("--coalesce-streams", default="8,32,64")
    ap.add_argument(
        "--uncoalesced-probe",
        action="store_true",
        help="also measure the B=1-per-request comparison point "
        "(slow: one device dispatch per query)",
    )
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--out", default="bench/report_serving.json")
    args = ap.parse_args()

    import jax

    log(f"platform: {jax.devices()[0]}; building {args.n} x {D} index...")
    idx, queries = build_index(args.n)
    from vectorlite_tpu.core.metrics import SimilarityMetric

    # warm every jit bucket + measure the pure-kernel floor
    idx.search_batch_arrays(queries, K, SimilarityMetric.COSINE)
    t0 = time.perf_counter()
    for _ in range(8):
        idx.search_batch_arrays(queries, K, SimilarityMetric.COSINE)
    seq_qps = 8 * BATCH / (time.perf_counter() - t0)
    log(f"sequential single-stream: {seq_qps:,.0f} QPS")

    report = {"n": args.n, "batch": BATCH, "sequential_qps": round(seq_qps)}
    results = []
    for s in [int(x) for x in args.streams.split(",")]:
        qps = bench_threads(idx, queries, s, args.seconds)
        log(f"threads={s}: {qps:,.0f} QPS sustained")
        results.append({"mode": "threads", "streams": s, "qps": round(qps)})
    if hasattr(idx, "search_batch_stream"):
        for d in [int(x) for x in args.depths.split(",")]:
            qps = bench_pipelined(idx, queries, d, args.seconds)
            log(f"pipelined depth={d}: {qps:,.0f} QPS sustained")
            results.append(
                {"mode": "pipelined", "depth": d, "qps": round(qps)}
            )
        for spec in [x for x in args.groups.split(",") if x]:
            # "G" sweeps at depth 2; "D:G" pins the fetch-pool depth too
            parts = spec.split(":")
            if len(parts) > 2 or not all(
                x.lstrip("-").isdigit() for x in parts if x
            ):
                raise SystemExit(
                    f"--groups entry {spec!r}: expected G or D:G integers"
                )
            d = int(parts[0]) if len(parts) == 2 and parts[0] else 2
            g = int(parts[-1])
            if d < 1 or g < 1:
                raise SystemExit(f"--groups entry {spec!r}: must be >= 1")
            # warm the concatenated-batch jit bucket outside the window
            big = np.concatenate([queries] * g)
            idx.search_batch_arrays(big, K, SimilarityMetric.COSINE)
            qps = bench_pipelined(
                idx, queries, d, args.seconds, group=g
            )
            log(f"pipelined depth={d} group={g}: {qps:,.0f} QPS sustained")
            results.append(
                {
                    "mode": "pipelined",
                    "depth": d,
                    "group": g,
                    "qps": round(qps),
                }
            )
    if args.coalesce_streams:
        from vectorlite_tpu.store.collection import Collection

        table = {f"q{i}": queries[i] for i in range(len(queries))}
        embedder = _TableEmbedder(table)
        collection = Collection("serving", idx)
        # warm the coalesced path AND every pow2 B-bucket the group
        # dispatcher can form — a bucket compiling inside the measured
        # window eats most of it (a 12 s window measured 1 QPS once)
        collection.search_text(
            "q0", K, SimilarityMetric.COSINE, embedder
        )
        max_streams = max(
            int(x) for x in args.coalesce_streams.split(",")
        )
        b = 1
        while b <= max_streams:
            idx.search_batch_arrays(
                queries[:b], K, SimilarityMetric.COSINE
            )
            b *= 2
        log("coalesce buckets warmed")
        for s in [int(x) for x in args.coalesce_streams.split(",")]:
            qps, avg_batch = bench_coalesced(
                collection, embedder, s, args.seconds
            )
            log(
                f"coalesced streams={s}: {qps:,.0f} QPS sustained "
                f"(avg device batch {avg_batch})"
            )
            results.append(
                {
                    "mode": "coalesced",
                    "streams": s,
                    "qps": round(qps),
                    "avg_batch": avg_batch,
                }
            )
        if args.uncoalesced_probe:
            os.environ["VECTORLITE_COALESCE"] = "0"
            try:
                s = 8
                qps, _ = bench_coalesced(
                    collection, embedder, s, min(args.seconds, 6.0)
                )
                log(f"UNcoalesced streams={s}: {qps:,.0f} QPS sustained")
                results.append(
                    {"mode": "uncoalesced", "streams": s, "qps": round(qps)}
                )
            finally:
                os.environ.pop("VECTORLITE_COALESCE", None)
        collection.close()
    report["results"] = results
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
