"""Jitted score + top-k search step.

This is the XLA compute path for exact (flat) search: one fused
score-matrix + ``lax.top_k`` program per (capacity, batch, k, metric, dtype)
bucket. All shapes are static — the index buckets capacity, batch size and k
to powers of two so the jit cache stays tiny and stable.

Replaces the reference's linear scan + full sort + truncate
(reference: src/index/flat.rs:98-119) with an MXU matmul and a device-side
partial top-k. Ties break toward the lower slot index, which reproduces the
reference's stable descending sort over insertion order
(reference: src/index/flat.rs:116).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.metrics import SimilarityMetric, batched_scores

NEG_INF = float("-inf")


@partial(jax.jit, static_argnames=("metric", "k"))
def search_topk(
    values: jax.Array,  # [cap, D] device dtype
    sqnorms: jax.Array,  # [cap] f32
    valid: jax.Array,  # [cap] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
):
    """Return (scores [B, k], slot_indices [B, k]); invalid slots score -inf."""
    scores = batched_scores(values, sqnorms, queries, metric)
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("metric", "k"))
def search_topk_int8(
    values_q: jax.Array,  # [cap, D] int8
    scales: jax.Array,  # [cap] f32
    sqnorms: jax.Array,  # [cap] f32 exact squared norms
    valid: jax.Array,  # [cap] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
):
    """int8-MXU scored top-k (quantized profile); callers re-score the k
    winners exactly on the host."""
    from ..core.metrics import batched_scores_int8

    scores = batched_scores_int8(values_q, scales, sqnorms, queries, metric)
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, donate_argnums=(0,))
def update_rows(buffer: jax.Array, rows: jax.Array, start: int):
    """Write `rows` into `buffer[start:start+len(rows)]` in place (donated)."""
    return jax.lax.dynamic_update_slice(
        buffer, rows.astype(buffer.dtype), (start,) + (0,) * (buffer.ndim - 1)
    )


@jax.jit
def row_sqnorms(rows: jax.Array) -> jax.Array:
    r = rows.astype(jnp.float32)
    return jnp.sum(r * r, axis=-1)


def next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()
