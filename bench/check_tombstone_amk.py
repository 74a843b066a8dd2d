"""On-chip sanity: the amk watermark fast path vs the tombstone
fallback at index level.

The round-3 rescore optimization made FlatIndex pass
``tombstones=False, live_hi`` when no deletes exist (validity proven
arithmetically) and fall back to the mask gather after a delete. CPU
tests cover the kernel contract (tests/test_amk.py) but `_use_pallas`
gates the index-level amk dispatch to real TPU — this script closes
that gap on silicon:

1. fresh index (watermark path) vs f64 numpy truth
2. delete winners + bystanders (gather path) vs recomputed truth
3. compact() (watermark path again, shifted slots) vs truth

Run: python -m bench.check_tombstone_amk  (exits nonzero on mismatch)
"""

from __future__ import annotations

import sys

import numpy as np

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.index.flat import FlatIndex

N, D, B, K = 262_144, 128, 64, 10


def truth_topk(data, ids, q, k):
    s = q @ data.T
    out = []
    for b in range(q.shape[0]):
        order = np.argsort(-s[b], kind="stable")[:k]
        out.append([int(ids[i]) for i in order])
    return out


def got_ids(idx, q, k):
    ids, _ = idx.search_batch_arrays(q, k, SimilarityMetric.COSINE)
    return ids[:, :k].tolist()


def main():
    import jax

    if jax.devices()[0].platform != "tpu":
        print("not on TPU; this check is chip-only")
        return
    rng = np.random.default_rng(7)
    data = rng.normal(size=(N, D))
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q = rng.normal(size=(B, D))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids = np.arange(N, dtype=np.uint64)

    idx = FlatIndex(D)
    idx.add_batch_arrays(ids, data)

    def recall(want, got):
        hits = sum(
            len(set(w) & set(g)) for w, g in zip(want, got)
        )
        return hits / (len(want) * K)

    # the engine is amk rt=0.99: expected ~1 miss per ~2.5K hits is the
    # engine's documented frontier, so the bar is recall, not equality;
    # returning a DELETED id is a hard dispatch bug and never allowed
    want = truth_topk(data, ids, q, K)
    got = got_ids(idx, q, K)
    r1 = recall(want, got)
    print(f"[1] fresh (watermark path): recall {r1:.4f}")
    assert r1 >= 0.995, r1

    # delete every current winner's id plus a spread of bystanders
    dead = sorted({w[0] for w in want} | set(range(0, N, 4097)))
    for i in dead:
        idx.delete(i)
    deadset = set(dead)
    live = np.setdiff1d(np.arange(N), np.asarray(dead))
    want2 = truth_topk(data[live], ids[live], q, K)
    got2 = got_ids(idx, q, K)
    assert not any(g in deadset for row in got2 for g in row), \
        "deleted id returned (gather path)"
    r2 = recall(want2, got2)
    print(f"[2] after {len(dead)} deletes (gather path): recall {r2:.4f}")
    assert r2 >= 0.995, r2

    idx.compact()
    got3 = got_ids(idx, q, K)
    assert not any(g in deadset for row in got3 for g in row), \
        "deleted id returned (post-compact watermark path)"
    r3 = recall(want2, got3)
    print(f"[3] after compact (watermark path, shifted slots): recall {r3:.4f}")
    assert r3 >= 0.995, r3
    print("tombstone/watermark dispatch OK on chip")


if __name__ == "__main__":
    try:
        main()
    except AssertionError as e:
        print("MISMATCH:", str(e)[:400])
        sys.exit(1)
