"""Product-quantization serving rung: codebook training, encoding, and
streaming ADC search.

Extends the Flat index capacity ladder (f32 -> bf16 -> int8, see
index/flat.py) with a ~`dim*8/M`-fold compressed rung: rows are split
into M subspaces of dsub = dim/M dims, each quantized to the nearest of
256 learned centroids, so a row stores as M uint8 codes (48 bytes at
384-d/M=48 vs 1536 f32 bytes — 32x). 10M rows fit in ~0.5 GB of HBM;
100M in ~5 GB. Selection scores are asymmetric-distance (ADC) lookups;
winners are ALWAYS re-scored in exact f64 on the host from the
uncompressed truth (the same `_exact_rescore` contract the int8 rung
uses), so returned scores match the scalar reference formulas
(reference: src/lib.rs:425-572) and only *ranking* is approximate.

TPU mapping:

* **Training** is Lloyd's k-means vmapped over subspaces — assignment
  and the centroid update are both matmuls ([S,256] distance +
  one-hot.T @ X), so the whole trainer runs on the MXU under one jit.
* **Encoding** is the same assignment matmul, chunked to a fixed shape.
* **Search** builds a per-query LUT ([B, M, 256], one einsum), then
  accumulates scores chunk-by-chunk with a fori over subspaces (each
  step one [B, chunk] gather) and merges a running top-k across chunks
  with lax.scan — no [B, N] intermediate ever materializes, same
  streaming property as the Pallas scan kernels.
* Cosine/euclidean rank on the ADC dot plus the EXACT stored f32
  squared norms (4 bytes/row; better than reconstruction norms).
  Manhattan uses a per-subspace L1 LUT — all four metrics are ADC-able.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metrics import SimilarityMetric

NEG_INF = float("-inf")

#: codes per codebook; one uint8 per subspace.
K_CODES = 256


def rotation_matrix(dim: int, seed: int = 0) -> np.ndarray:
    """Seeded random orthonormal rotation [D, D] f32, applied before the
    subspace split (OPQ-lite). Real embedding corpora are anisotropic —
    a few dominant directions concentrate variance in a few subspaces
    and plain PQ's recall collapses there (measured 0.76 -> 1.0 on an
    eigen-decay corpus at 384-d/M=96, tests/test_pq.py). A random
    rotation spreads variance evenly across subspaces, is
    data-independent (stable under corpus drift, nothing to retrain),
    and preserves dot/cosine/euclidean exactly (orthogonal invariance;
    the stored exact norms stay valid). Manhattan is NOT rotation-
    invariant, so with rotation active the index selects manhattan
    candidates via the rotation-invariant dot+norms (euclidean) proxy
    instead of rotated-L1 (measured pool recall 0.90 vs 0.86 on an
    eigen-decay corpus; plain unrotated L1 ADC is dim-separable and
    scores 1.0 there — VECTORLITE_PQ_ROTATE=0 is the right call for
    L1-dominated workloads, documented)."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    return q.astype(np.float32)


def pq_subspaces(dim: int, m_requested: int) -> int:
    """Largest divisor of ``dim`` that is <= m_requested (every subspace
    must get an equal, whole number of dims)."""
    m = max(1, min(int(m_requested), dim))
    while dim % m:
        m -= 1
    return m


def _kmeans_subspace(x, init, key, *, iters: int):
    """Lloyd's iterations for one subspace: x [S, d], init [256, d].
    Empty clusters are re-seeded from random sample rows (a common
    PQ-codebook refinement; without it dead centroids waste code
    space)."""
    s = x.shape[0]
    xsq = jnp.sum(x * x, axis=1)  # [S]

    def step(carry, key_i):
        c = carry
        csq = jnp.sum(c * c, axis=1)  # [256]
        # [S, 256] squared distances via the MXU
        d2 = xsq[:, None] - 2.0 * (x @ c.T) + csq[None, :]
        assign = jnp.argmin(d2, axis=1)  # [S]
        onehot = (
            assign[:, None] == jnp.arange(K_CODES)[None, :]
        ).astype(x.dtype)
        counts = jnp.sum(onehot, axis=0)  # [256]
        sums = onehot.T @ x  # [256, d]
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # dead centroid -> random row (keeps all 256 codes useful)
        reseed = x[jax.random.randint(key_i, (K_CODES,), 0, s)]
        new_c = jnp.where((counts > 0)[:, None], new_c, reseed)
        return new_c, None

    keys = jax.random.split(key, iters)
    final, _ = jax.lax.scan(step, init, keys)
    return final


@partial(jax.jit, static_argnames=("iters",))
def _kmeans_all(x, init, keys, *, iters: int):
    """Sequential scan over subspaces (NOT vmap: M concurrent lanes
    would materialize an [M, S, 256] assignment temp; one lane's
    [S, 256] at a time keeps the trainer's footprint flat)."""
    def one(carry, xs):
        x_m, init_m, key_m = xs
        return carry, _kmeans_subspace(x_m, init_m, key_m, iters=iters)

    _, cbs = jax.lax.scan(one, None, (x, init, keys))
    return cbs


def train_codebooks(
    sample32: np.ndarray,  # [S, D] f32 live-row sample
    m: int,
    *,
    iters: int = 10,
    seed: int = 0,
) -> jax.Array:
    """Learn per-subspace codebooks [M, 256, dsub] (f32, on device).

    Init is a random distinct-row draw per subspace; S should be >= a
    few thousand (the index gates the PQ rung on a minimum corpus
    size)."""
    s, dim = sample32.shape
    dsub = dim // m
    x = jnp.asarray(sample32, dtype=jnp.float32).reshape(s, m, dsub)
    x = jnp.transpose(x, (1, 0, 2))  # [M, S, dsub]
    key = jax.random.PRNGKey(seed)
    k_init, k_seed = jax.random.split(key)
    # distinct init rows per subspace (with replacement only when S<256,
    # which the caller's minimum-size gate prevents)
    idx = jax.random.permutation(k_init, s)[:K_CODES]
    init = x[:, idx % s, :]  # [M, 256, dsub]
    return _kmeans_all(
        x, init, jax.random.split(k_seed, m), iters=iters
    )


@jax.jit
def encode_rows(codebooks: jax.Array, rows32: jax.Array) -> jax.Array:
    """Nearest-centroid codes: rows [N, D] f32 -> uint8 [N, M].

    Scanned over subspaces (one [N, 256] distance temp at a time; a
    vmap would batch all M). Callers chunk N — the index encodes in
    fixed 131072-row buckets so the temp stays ~134 MB and the jit
    cache stays small."""
    n = rows32.shape[0]
    m, _k, dsub = codebooks.shape
    x = rows32.reshape(n, m, dsub)
    x = jnp.transpose(x, (1, 0, 2))  # [M, N, dsub]

    def sub(carry, xc):
        xs, cs = xc  # [N, dsub], [256, dsub]
        d2 = (
            jnp.sum(xs * xs, axis=1)[:, None]
            - 2.0 * (xs @ cs.T)
            + jnp.sum(cs * cs, axis=1)[None, :]
        )
        return carry, jnp.argmin(d2, axis=1).astype(jnp.uint8)

    _, codes = jax.lax.scan(sub, None, (x, codebooks))
    return jnp.transpose(codes)  # [N, M]


def _adc_lut(queries, codebooks, metric):
    """Per-query lookup tables [B, M, 256]: dot tables for the matmul
    metrics, |q - c| L1 tables for manhattan."""
    b = queries.shape[0]
    m, _k, dsub = codebooks.shape
    q = queries.reshape(b, m, dsub)
    if metric is SimilarityMetric.MANHATTAN:
        # [B, M, 256, dsub] reduces immediately; at B=256/M=48 the
        # peak temp is ~100 MB — fine, it never scales with N
        return jnp.sum(
            jnp.abs(q[:, :, None, :] - codebooks[None]), axis=-1
        )
    return jnp.einsum("bmd,mcd->bmc", q, codebooks)


@partial(jax.jit, static_argnames=("metric", "k", "chunk"))
def pq_search_topk(
    codes: jax.Array,  # [cap, M] uint8
    codebooks: jax.Array,  # [M, 256, dsub] f32
    sqnorms: jax.Array,  # [cap] f32 EXACT row squared norms
    valid: jax.Array,  # [cap] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    chunk: int = 65536,
):
    """Streaming ADC top-k: (scores [B, k], slots [B, k]).

    Scores are the ADC similarity approximations (callers exact-rescore
    winners from host truth); invalid slots are -inf. Ties break toward
    the lower slot, matching every other kernel here."""
    cap = codes.shape[0]
    b = queries.shape[0]
    # a chunk narrower than k would silently drop true winners (each
    # chunk can contribute at most its full width to the merge)
    chunk = min(max(chunk, k), cap)
    n_chunks = -(-cap // chunk)
    pad = n_chunks * chunk - cap
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        sqnorms = jnp.pad(sqnorms, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    lut = _adc_lut(queries.astype(jnp.float32), codebooks, metric)
    qsq = jnp.sum(
        queries.astype(jnp.float32) ** 2, axis=1, keepdims=True
    )  # [B, 1]
    m = codes.shape[1]

    codes_c = codes.reshape(n_chunks, chunk, m)
    sq_c = sqnorms.reshape(n_chunks, chunk)
    valid_c = valid.reshape(n_chunks, chunk)
    k_eff = min(k, chunk)

    def score_chunk(codes_chunk, sq_chunk, valid_chunk):
        def body(i, acc):
            # one [B, chunk] gather per subspace; acc never exceeds
            # [B, chunk] so no [B, N] (or [B, M, chunk]) temp exists
            return acc + jnp.take(
                lut[:, i, :], codes_chunk[:, i], axis=1
            )
        adc = jax.lax.fori_loop(
            0, m, body, jnp.zeros((b, chunk), jnp.float32)
        )
        if metric is SimilarityMetric.DOT_PRODUCT:
            scores = adc
        elif metric is SimilarityMetric.COSINE:
            denom = jnp.sqrt(qsq) * jnp.sqrt(sq_chunk)[None, :]
            scores = jnp.where(
                denom > 0.0, adc / jnp.maximum(denom, 1e-30), 0.0
            )
        elif metric is SimilarityMetric.EUCLIDEAN:
            d2 = jnp.maximum(qsq - 2.0 * adc + sq_chunk[None, :], 0.0)
            scores = 1.0 / (1.0 + jnp.sqrt(d2))
        else:  # MANHATTAN: adc IS the L1 distance
            scores = 1.0 / (1.0 + adc)
        return jnp.where(valid_chunk[None, :], scores, NEG_INF)

    def merge(carry, xs):
        best_s, best_i = carry
        codes_chunk, sq_chunk, valid_chunk, base = xs
        scores = score_chunk(codes_chunk, sq_chunk, valid_chunk)
        cs, ci = jax.lax.top_k(scores, k_eff)
        ci = ci + base
        # carry first: on ties top_k keeps the earlier position, which
        # is the lower global slot (earlier chunk)
        all_s = jnp.concatenate([best_s, cs], axis=1)
        all_i = jnp.concatenate([best_i, ci], axis=1)
        sel_s, sel_pos = jax.lax.top_k(all_s, k)
        sel_i = jnp.take_along_axis(all_i, sel_pos, axis=1)
        return (sel_s, sel_i), None

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.zeros((b, k), jnp.int32),
    )
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (scores, slots), _ = jax.lax.scan(
        merge, init, (codes_c, sq_c, valid_c, bases)
    )
    return scores, slots
