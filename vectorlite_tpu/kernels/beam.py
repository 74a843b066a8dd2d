"""Batched HNSW beam search on device.

The reference's HNSW search is a sequential pointer-chasing traversal inside
the Rust ``hnsw`` crate (reference: src/index/hnsw.rs:415-496). The TPU
redesign runs the level-0 ef-search as a **batched best-first beam** over
flat adjacency arrays, entirely inside one jitted program:

* state: per-query beam of (node, distance) pairs kept sorted ascending,
  plus an expanded flag per slot — all static ``[B, EF]`` shapes;
* one iteration = pick each query's best unexpanded node, gather its
  adjacency row, gather + score its neighbors (vectorized ``[B, M0, D]``
  gathers feeding one batched reduction), mask already-in-beam duplicates,
  merge-and-resort the beam;
* termination: a query goes inactive when its best unexpanded candidate is
  worse than its current beam tail (classic best-first stop), the loop when
  all queries are inactive or ``max_iters`` hits.

Dedup against the current beam is sufficient: the beam tail distance is
non-increasing, so an evicted node can never re-qualify; within one
iteration a query's candidates come from a single adjacency row and are
unique by construction.

Upper-level routing (greedy 1-NN descent over levels >= 1) stays on the
host — it touches ~M * top_level rows per query, negligible next to the
level-0 search.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.metrics import SimilarityMetric

INF = jnp.inf


def _neighbor_dists(
    queries,  # [B, D] f32
    q_sq,  # [B, 1]
    q_norm,  # [B, 1]
    nvecs,  # [B, M, D] gathered neighbor vectors
    n_sq,  # [B, M] gathered squared norms
    metric: SimilarityMetric,
):
    """Internal HNSW distances (smaller = closer), matching index/hnsw.py
    _dist_to_many (reference formulas: src/index/hnsw.rs:113-174, unscaled)."""
    if metric is SimilarityMetric.MANHATTAN:
        return jnp.sum(jnp.abs(nvecs - queries[:, None, :]), axis=-1)
    if metric is SimilarityMetric.EUCLIDEAN:
        # direct form: the gathered [B, M, D] block is already materialized,
        # and the |x|^2+|y|^2-2xy expansion loses ~1e-3 absolute near d=0
        diff = nvecs - queries[:, None, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    dot = jnp.einsum(
        "bd,bmd->bm", queries, nvecs, preferred_element_type=jnp.float32
    )
    if metric is SimilarityMetric.DOT_PRODUCT:
        return 1000.0 - jnp.clip(dot, -1000.0, 1000.0)
    # cosine: 1 - cos, zero-norm -> 1.0 (clamped: f32 cos can pass 1)
    denom = q_norm * jnp.sqrt(n_sq)
    cos = jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.where(denom > 0.0, jnp.maximum(1.0 - cos, 0.0), 1.0)


@partial(jax.jit, static_argnames=("metric", "ef", "max_iters"))
def beam_search_l0(
    vecs: jax.Array,  # [N, D] f32
    sqnorms: jax.Array,  # [N] f32
    adj: jax.Array,  # [N, M0] int32, -1 padded
    entries: jax.Array,  # [B] int32 entry node per query
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    ef: int,
    max_iters: int,
):
    """Returns (beam_ids [B, EF] int32 sorted by distance, beam_dist
    [B, EF] f32). Unfilled slots are (-1, +inf)."""
    b = queries.shape[0]
    queries = queries.astype(jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    q_norm = jnp.sqrt(q_sq)
    rows = jnp.arange(b)

    e_vec = vecs[entries][:, None, :]  # [B, 1, D]
    e_sq = sqnorms[entries][:, None]
    d0 = _neighbor_dists(queries, q_sq, q_norm, e_vec, e_sq, metric)[:, 0]

    beam_ids = jnp.full((b, ef), -1, jnp.int32).at[:, 0].set(entries)
    beam_dist = jnp.full((b, ef), INF, jnp.float32).at[:, 0].set(d0)
    expanded = jnp.zeros((b, ef), bool)

    def cond(state):
        _, _, _, any_active, it = state
        return jnp.logical_and(any_active, it < max_iters)

    def body(state):
        beam_ids, beam_dist, expanded, _, it = state
        # best unexpanded slot per query
        sel_space = jnp.where(
            expanded | (beam_ids < 0), INF, beam_dist
        )
        sel = jnp.argmin(sel_space, axis=1)  # [B]
        sel_dist = sel_space[rows, sel]
        # beam tail (worst kept distance); beam is sorted ascending
        tail = beam_dist[:, -1]
        active = (sel_dist < INF) & (sel_dist <= tail)

        expanded = expanded.at[rows, sel].set(
            expanded[rows, sel] | active
        )
        node = jnp.where(active, beam_ids[rows, sel], 0)
        nbrs = adj[node]  # [B, M0]
        valid = (nbrs >= 0) & active[:, None]
        nbrs_safe = jnp.maximum(nbrs, 0)
        nvecs = vecs[nbrs_safe]  # [B, M0, D]
        n_sq = sqnorms[nbrs_safe]
        nd = _neighbor_dists(queries, q_sq, q_norm, nvecs, n_sq, metric)
        # dedup against current beam
        in_beam = jnp.any(
            nbrs[:, :, None] == beam_ids[:, None, :], axis=-1
        )
        nd = jnp.where(valid & ~in_beam, nd, INF)
        nbrs_masked = jnp.where(valid & ~in_beam, nbrs, -1)

        # merge + resort to EF best
        all_ids = jnp.concatenate([beam_ids, nbrs_masked], axis=1)
        all_dist = jnp.concatenate([beam_dist, nd], axis=1)
        all_exp = jnp.concatenate(
            [expanded, jnp.zeros_like(nd, bool)], axis=1
        )
        order = jnp.argsort(all_dist, axis=1)[:, :ef]
        beam_ids = jnp.take_along_axis(all_ids, order, axis=1)
        beam_dist = jnp.take_along_axis(all_dist, order, axis=1)
        expanded = jnp.take_along_axis(all_exp, order, axis=1)

        # is any query still improvable next round?
        nxt = jnp.where(expanded | (beam_ids < 0), INF, beam_dist)
        nxt_best = jnp.min(nxt, axis=1)
        any_active = jnp.any(
            (nxt_best < INF) & (nxt_best <= beam_dist[:, -1])
        )
        return beam_ids, beam_dist, expanded, any_active, it + 1

    beam_ids, beam_dist, expanded, _, _ = jax.lax.while_loop(
        cond, body, (beam_ids, beam_dist, expanded, jnp.bool_(True), 0)
    )
    return beam_ids, beam_dist
