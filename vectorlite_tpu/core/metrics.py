"""Similarity metrics: scalar parity math and batched device scoring.

The reference defines four similarity metrics (higher = more similar):
cosine in [-1, 1]; euclidean and manhattan distances mapped through
``1 / (1 + d)``; and raw dot product (reference: src/lib.rs:363-572).

Two tiers live here:

* **Scalar parity functions** (`cosine_similarity`, ...) — float64 numpy,
  bit-comparable with the reference formulas, used for tests, tiny inputs,
  and the persistence layer.
* **Batched device scoring** (`batched_scores`) — computes a ``[B, N]``
  similarity matrix on the TPU for a ``[B, D]`` query batch against an
  ``[N, D]`` corpus. Cosine/dot/euclidean ride the MXU via one matmul
  (euclidean uses the ``|x-y|^2 = |x|^2 + |y|^2 - 2xy`` expansion);
  manhattan is an elementwise reduce tiled over N chunks to bound memory.
"""

from __future__ import annotations

import enum
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import InvalidSimilarityMetric


class SimilarityMetric(enum.Enum):
    """Reference: src/lib.rs:363-378. Default is Cosine."""

    COSINE = "Cosine"
    EUCLIDEAN = "Euclidean"
    MANHATTAN = "Manhattan"
    DOT_PRODUCT = "DotProduct"

    @classmethod
    def default(cls) -> "SimilarityMetric":
        return cls.COSINE

    @classmethod
    def parse(cls, s: str) -> "SimilarityMetric":
        """Case-insensitive parse (reference: src/server.rs:157-165)."""
        table = {
            "cosine": cls.COSINE,
            "euclidean": cls.EUCLIDEAN,
            "manhattan": cls.MANHATTAN,
            "dotproduct": cls.DOT_PRODUCT,
        }
        m = table.get(s.lower())
        if m is None:
            raise InvalidSimilarityMetric(s)
        return m

    @classmethod
    def from_serde(cls, s: str) -> "SimilarityMetric":
        """Parse the serde-serialized variant name, e.g. "Cosine"."""
        for m in cls:
            if m.value == s:
                return m
        raise InvalidSimilarityMetric(s)

    def variant_name(self) -> str:
        """Rust Debug / serde name, e.g. "Cosine"."""
        return self.value

    def calculate(self, a, b) -> float:
        """Scalar similarity between two vectors (reference: src/lib.rs:380-391)."""
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        assert a.shape == b.shape, "Vectors must have the same length"
        if self is SimilarityMetric.COSINE:
            return cosine_similarity(a, b)
        if self is SimilarityMetric.EUCLIDEAN:
            return euclidean_similarity(a, b)
        if self is SimilarityMetric.MANHATTAN:
            return manhattan_similarity(a, b)
        return dot_product(a, b)


def cosine_similarity(a, b) -> float:
    """Cosine similarity; zero-norm inputs yield 0.0 (reference: src/lib.rs:425-444)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, "Vectors must have the same length"
    dot = float(np.dot(a, b))
    norm_a = float(np.sqrt(np.dot(a, a)))
    norm_b = float(np.sqrt(np.dot(b, b)))
    if norm_a == 0.0 or norm_b == 0.0:
        return 0.0
    return dot / (norm_a * norm_b)


def euclidean_similarity(a, b) -> float:
    """1 / (1 + L2-distance) in [0, 1] (reference: src/lib.rs:476-489)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, "Vectors must have the same length"
    d = float(np.sqrt(np.sum((a - b) ** 2)))
    return 1.0 / (1.0 + d)


def manhattan_similarity(a, b) -> float:
    """1 / (1 + L1-distance) in [0, 1] (reference: src/lib.rs:521-532)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, "Vectors must have the same length"
    d = float(np.sum(np.abs(a - b)))
    return 1.0 / (1.0 + d)


def dot_product(a, b) -> float:
    """Raw dot product, unbounded (reference: src/lib.rs:565-572)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, "Vectors must have the same length"
    return float(np.dot(a, b))


# ---------------------------------------------------------------------------
# Batched device scoring (traced under jit; all shapes static).
# ---------------------------------------------------------------------------

# Per-step memory budget for the tiled manhattan reduce ([B, chunk, D] f32).
_MANHATTAN_TILE_BYTES = 64 * 1024 * 1024


def _manhattan_chunk(n: int, b: int, d: int) -> int:
    chunk = max(1, _MANHATTAN_TILE_BYTES // (4 * b * d))
    # round down to a power of two so it divides power-of-two capacities
    chunk = 1 << (chunk.bit_length() - 1)
    return min(chunk, n)


def batched_scores(
    values: jax.Array,  # [N, D]
    sqnorms: jax.Array,  # [N] cached squared L2 norms of `values` rows
    queries: jax.Array,  # [B, D]
    metric: SimilarityMetric,
) -> jax.Array:  # [B, N] float32 similarities
    """Similarity of every query against every corpus row, on device.

    `sqnorms` is maintained incrementally by the index so cosine/euclidean
    need only a single [B,D]x[D,N] matmul over the corpus (one HBM pass).
    """
    queries = queries.astype(jnp.float32)
    values_f32 = values.astype(jnp.float32)

    if metric is SimilarityMetric.MANHATTAN:
        n, d = values.shape
        b = queries.shape[0]
        chunk = _manhattan_chunk(n, b, d)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        v = values_f32
        if pad:
            v = jnp.pad(v, ((0, pad), (0, 0)))
        v = v.reshape(n_chunks, chunk, d)

        def one_chunk(v_chunk):  # [chunk, D] -> [B, chunk]
            diff = jnp.abs(queries[:, None, :] - v_chunk[None, :, :])
            return jnp.sum(diff, axis=-1)

        dists = jax.lax.map(one_chunk, v)  # [n_chunks, B, chunk]
        dists = jnp.moveaxis(dists, 0, 1).reshape(b, n_chunks * chunk)[:, :n]
        return 1.0 / (1.0 + dists)

    # f32 corpus: HIGHEST precision keeps full f32 accuracy on the MXU (the
    # TPU default feeds bf16 inputs, ~1e-3 absolute score error). bf16 corpus
    # (memory-optimized profile) takes the native fast path, accumulating
    # in f32 via preferred_element_type.
    if values.dtype == jnp.bfloat16:
        dot = jnp.dot(
            queries.astype(jnp.bfloat16),
            values.T,
            preferred_element_type=jnp.float32,
        )
    else:
        dot = jnp.dot(
            queries,
            values_f32.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, N]

    if metric is SimilarityMetric.DOT_PRODUCT:
        return dot

    if metric is SimilarityMetric.COSINE:
        q_norm = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        v_norm = jnp.sqrt(sqnorms)[None, :]
        denom = q_norm * v_norm
        # zero-norm rows or queries score 0.0 (reference: src/lib.rs:439-443)
        return jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0)

    # Euclidean: |x-y|^2 = |x|^2 + |y|^2 - 2xy, clamped for fp cancellation.
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    d_sq = jnp.maximum(q_sq + sqnorms[None, :] - 2.0 * dot, 0.0)
    return 1.0 / (1.0 + jnp.sqrt(d_sq))


@partial(jax.jit, static_argnames=("metric",))
def batched_scores_jit(values, sqnorms, queries, metric: SimilarityMetric):
    return batched_scores(values, sqnorms, queries, metric)


# ---------------------------------------------------------------------------
# int8 quantized scoring (the "quantized" profile): corpus rows stored as
# symmetric per-row int8 (scale = max|x| / 127), queries quantized per-row
# on the fly. The dot product rides the int8 MXU path (2x bf16 peak, 4x
# less HBM traffic than f32); cosine/euclidean reconstruct with the EXACT
# cached norms, so only the cross-term is approximate. Callers re-score
# the k winners exactly on the host (index/flat.py).
# ---------------------------------------------------------------------------


def quantize_rows_int8(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[N, D] float -> (int8 values [N, D], f32 scales [N])."""
    rows = rows.astype(jnp.float32)
    max_abs = jnp.max(jnp.abs(rows), axis=-1)
    scale = jnp.where(max_abs > 0.0, max_abs / 127.0, 1.0)
    q = jnp.clip(jnp.round(rows / scale[:, None]), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def batched_scores_int8(
    values_q: jax.Array,  # [N, D] int8
    scales: jax.Array,  # [N] f32 per-row scale
    sqnorms: jax.Array,  # [N] f32 EXACT squared norms (pre-quantization)
    queries: jax.Array,  # [B, D] f32
    metric: SimilarityMetric,
) -> jax.Array:  # [B, N] f32 approximate similarities
    if metric is SimilarityMetric.MANHATTAN:
        # reconstruct to f32 tiles inside the chunked path
        n, d = values_q.shape
        b = queries.shape[0]
        chunk = _manhattan_chunk(n, b, d)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        v = values_q
        s = scales
        if pad:
            v = jnp.pad(v, ((0, pad), (0, 0)))
            s = jnp.pad(s, (0, pad))
        v = v.reshape(n_chunks, chunk, d)
        s = s.reshape(n_chunks, chunk)
        q32 = queries.astype(jnp.float32)

        def one_chunk(args):
            v_chunk, s_chunk = args
            vf = v_chunk.astype(jnp.float32) * s_chunk[:, None]
            return jnp.sum(jnp.abs(q32[:, None, :] - vf[None, :, :]), -1)

        dists = jax.lax.map(one_chunk, (v, s))
        dists = jnp.moveaxis(dists, 0, 1).reshape(b, n_chunks * chunk)[:, :n]
        return 1.0 / (1.0 + dists)

    # int8 rows cast to f32 for the contraction (queries stay f32):
    # measured much faster than the int8 dot on this stack, and only row
    # quantization contributes error (callers re-score winners exactly)
    dot = jax.lax.dot_general(
        queries.astype(jnp.float32),
        values_q.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scales[None, :]  # [B, N]
    if metric is SimilarityMetric.DOT_PRODUCT:
        return dot
    queries = queries.astype(jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    if metric is SimilarityMetric.COSINE:
        denom = jnp.sqrt(q_sq) * jnp.sqrt(sqnorms)[None, :]
        return jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0)
    d_sq = jnp.maximum(q_sq + sqnorms[None, :] - 2.0 * dot, 0.0)
    return 1.0 / (1.0 + jnp.sqrt(d_sq))
