"""On-silicon probe for the fused Pallas PQ rank kernel (kernels/pq.py
_pallas_chunk_rank): compile check, id parity vs the XLA one-hot
formulation, and kernel timing at 1M and 8M x 384.

Motivation (session-7 analysis): the XLA formulation's one-hot operand
materializes in HBM (kOutput fusion feeding the convolution — the same
lowering the int8 probe's HLO showed), costing ~2x the kernel's whole
HBM traffic: at 1M x 384 b=256 4-bit the kernel measures 33.6 ms vs a
~10 ms MXU bound. The Pallas kernel expands the one-hot in VMEM, so
predicted ~13-15 ms at 1M (lane padding 96->128 costs 33% extra MXU).

Run (chip): python -m bench.probe_pq_pallas
Writes bench/report_pq_pallas.json.
"""

from __future__ import annotations

import json
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.kernels.pq import (
    encode_rows,
    pack_nibbles,
    pq_search_topk,
    pq_subspaces,
    train_codebooks,
)

B, D, KSEL = 256, 384, 256
REPS = 20


def timeit(fn, reps=REPS):
    fn()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3


def bench_n(n: int, rng, out: dict, label: str, parity: bool, reps=REPS):
    m = pq_subspaces(D, D // 2)  # 4-bit geometry: dsub=2, kc=16
    if parity:
        # real-ish codes so id parity is meaningful
        rows = rng.normal(size=(min(n, 262144), D)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        cb = train_codebooks(rows[:65536], m, kc=16, iters=4)
        chunks, sqs = [], []
        for lo in range(0, n, 262144):
            take = min(262144, n - lo)
            if lo == 0:
                r = rows[:take]
            else:  # fresh rows per chunk: duplicate rows would fill
                # the pool with exact ties and drown the id-parity
                # signal this probe exists to measure
                r = rng.normal(size=(take, D)).astype(np.float32)
                r /= np.linalg.norm(r, axis=1, keepdims=True)
            chunks.append(np.asarray(encode_rows(cb, jnp.asarray(r))))
            sqs.append(np.einsum("nd,nd->n", r, r).astype(np.float32))
        codes_u = np.concatenate(chunks)[:n]
        sq = jnp.asarray(np.concatenate(sqs)[:n])
    else:
        # random codes/codebooks: formulation timing only (identical
        # compute shape; recall is the parity run's job)
        cb = jnp.asarray(rng.normal(size=(m, 16, 2)).astype(np.float32))
        codes_u = rng.integers(0, 16, (n, m), dtype=np.uint8)
        sq = jnp.asarray(np.ones(n, np.float32))
    codes = jnp.asarray(pack_nibbles(jnp.asarray(codes_u)))
    codes.block_until_ready()
    valid = jnp.asarray(np.ones(n, bool))
    q = rng.normal(size=(B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qj = jnp.asarray(q)

    results = {}
    for name, pallas in (("xla", False), ("pallas", True)):
        kw = dict(
            metric=SimilarityMetric.COSINE,
            k=KSEL,
            chunk=65536,
            packed=True,
            pallas=pallas,
        )
        try:
            fn = lambda: jax.block_until_ready(  # noqa: E731
                pq_search_topk(codes, cb, sq, valid, qj, **kw)
            )
            ms = timeit(fn, reps)
            results[name] = {"ms": round(ms, 3)}
            print(f"[pq_pallas] {label} {name}: {ms:.3f} ms/batch")
        except Exception:
            results[name] = {"error": traceback.format_exc()[-2000:]}
            print(f"[pq_pallas] {label} {name}: FAILED")
            print(traceback.format_exc()[-2000:])
    if parity and all("ms" in v for v in results.values()):
        s0, i0 = pq_search_topk(
            codes, cb, sq, valid, qj,
            metric=SimilarityMetric.COSINE, k=KSEL, chunk=65536,
            packed=True, pallas=False,
        )
        s1, i1 = pq_search_topk(
            codes, cb, sq, valid, qj,
            metric=SimilarityMetric.COSINE, k=KSEL, chunk=65536,
            packed=True, pallas=True,
        )
        i0, i1 = np.asarray(i0), np.asarray(i1)
        overlap = np.mean(
            [
                len(set(i0[r]) & set(i1[r])) / KSEL
                for r in range(i0.shape[0])
            ]
        )
        top10 = float(np.mean(i0[:, :10] == i1[:, :10]))
        results["pool_overlap"] = round(float(overlap), 5)
        results["top10_id_match"] = round(top10, 5)
        print(
            f"[pq_pallas] {label} pool overlap {overlap:.5f}, "
            f"top10 id match {top10:.5f}"
        )
    out[label] = results


def main():
    import sys

    print(f"[pq_pallas] platform: {jax.devices()[0]}")
    smoke = "--smoke" in sys.argv
    rng = np.random.default_rng(0)
    out = {}
    if smoke:  # CPU shape/plumbing check (pallas path gated off-TPU by
        # callers; here we exercise the XLA branch + probe harness only)
        bench_n(131_072, rng, out, "smoke", parity=True, reps=1)
    else:
        bench_n(1_048_576, rng, out, "pq1m", parity=True)
        bench_n(8_388_608, rng, out, "pq8m", parity=False)
    with open("bench/report_pq_pallas.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1)[:1500])


if __name__ == "__main__":
    main()
