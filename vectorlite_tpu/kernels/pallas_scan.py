"""Pallas fused tiled distance + partial top-k scan.

The XLA path (kernels/topk.py) materializes the full ``[B, N]`` score matrix
in HBM before ``lax.top_k`` — fine to ~1M rows, impossible at 10M+ (a
256-query batch over 10M rows is a 10 GB intermediate). This kernel tiles
the corpus over a 1-D grid and reduces each ``[B, TILE]`` score tile to its
``[B, K]`` tile-local winners **inside VMEM**, so HBM traffic is exactly one
pass over the corpus plus the tiny per-tile winner lists. The exact global
top-k is recovered by a final ``lax.top_k`` over the ``[B, n_tiles*K]``
winners (the global top-k is a subset of the per-tile top-ks).

Per tile: one MXU matmul (``[B,D] x [D,TILE]``) + K iterations of
max/mask selection on the VPU (K * B * TILE ops — negligible next to the
matmul). Cosine/euclidean ride the cached squared norms; ties break toward
the lower global row index, matching the XLA path's insertion-order
tie-break (reference stable sort: src/index/flat.rs:116).

Manhattan has no matmul form and stays on the tiled XLA path
(core/metrics.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.metrics import SimilarityMetric

NEG_INF = float("-inf")

DEFAULT_TILE_N = 2048


def _tile_kernel(
    q_ref,  # [B, D] queries (VMEM, full)
    qsq_ref,  # [B, 1] query squared norms
    v_ref,  # [TILE, D] corpus tile
    sq_ref,  # [TILE, 1] row squared norms
    valid_ref,  # [TILE, 1] row validity (int8)
    out_s_ref,  # [1, B, K] tile-local top-k scores
    out_i_ref,  # [1, B, K] tile-local top-k global row ids
    *,
    metric: SimilarityMetric,
    k: int,
    tile_n: int,
):
    q = q_ref[:]
    v = v_ref[:]
    # [B, TILE] = q [B, D] . v [TILE, D]^T — contract on D, no transpose copy
    dot = jax.lax.dot_general(
        q,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            None if v.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        ),
    )

    sq_v = sq_ref[:].reshape(1, tile_n)  # [1, TILE]
    if metric is SimilarityMetric.DOT_PRODUCT:
        scores = dot
    elif metric is SimilarityMetric.COSINE:
        q_norm = jnp.sqrt(qsq_ref[:])  # [B, 1]
        v_norm = jnp.sqrt(sq_v)  # [1, TILE]
        denom = q_norm * v_norm
        scores = jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0)
    elif metric is SimilarityMetric.EUCLIDEAN:
        d_sq = jnp.maximum(qsq_ref[:] + sq_v - 2.0 * dot, 0.0)
        scores = 1.0 / (1.0 + jnp.sqrt(d_sq))
    else:
        raise NotImplementedError("manhattan uses the tiled XLA path")

    valid_row = valid_ref[:].reshape(1, tile_n) != 0
    scores = jnp.where(valid_row, scores, NEG_INF)

    b = scores.shape[0]
    tile_base = pl.program_id(0) * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)

    # Iterative K-selection: K rounds of (max, first-argmax, mask). Ties
    # resolve to the lowest column id -> lowest global row id.
    def select(i, scores):
        best = jnp.max(scores, axis=1, keepdims=True)  # [B, 1]
        cand = jnp.where(scores >= best, col_ids, tile_n)
        bidx = jnp.min(cand, axis=1, keepdims=True)  # [B, 1]
        out_s_ref[0, :, pl.ds(i, 1)] = best
        out_i_ref[0, :, pl.ds(i, 1)] = bidx + tile_base
        return jnp.where(col_ids == bidx, NEG_INF, scores)

    jax.lax.fori_loop(0, k, select, scores, unroll=True)


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "tile_n", "interpret")
)
def pallas_search_topk(
    values: jax.Array,  # [N, D], N a multiple of tile_n
    sqnorms: jax.Array,  # [N] f32
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
):
    """Exact top-k over a huge corpus without a [B, N] intermediate.

    Returns (scores [B, k], row_indices [B, k]).
    """
    n, d = values.shape
    b = queries.shape[0]
    assert n % tile_n == 0, (n, tile_n)
    n_tiles = n // tile_n
    k_tile = min(k, tile_n)

    queries = queries.astype(jnp.float32)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    grid = (n_tiles,)

    kernel = functools.partial(
        _tile_kernel, metric=metric, k=k_tile, tile_n=tile_n
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, 1), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, 1), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, b, k_tile), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, b, k_tile), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b, k_tile), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b, k_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * values.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        queries,
        qsq,
        values,
        sqnorms.reshape(n, 1),
        valid.astype(jnp.int8).reshape(n, 1),
    )

    # Final exact merge over the per-tile winners ([n_tiles, B, K] ->
    # [B, n_tiles*K], tile-major so ties keep global row order).
    s_flat = jnp.moveaxis(out_s, 0, 1).reshape(b, n_tiles * k_tile)
    i_flat = jnp.moveaxis(out_i, 0, 1).reshape(b, n_tiles * k_tile)
    s_top, pos = jax.lax.top_k(s_flat, k)
    i_top = jnp.take_along_axis(i_flat, pos, axis=1)
    return s_top, i_top
