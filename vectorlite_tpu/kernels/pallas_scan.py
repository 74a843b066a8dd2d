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

Manhattan has no matmul form; large corpora route to the dedicated
fused L1 kernel (kernels/pallas_l1.py, see index/flat.py's dispatch),
small ones to the tiled XLA path (core/metrics.py).
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

#: v5e has 128 MiB of VMEM; Mosaic's default scoped limit is 16 MiB.
#: Larger tiles amortize per-grid-step overhead, which measures at
#: ~5-10 us/step on this stack.
_VMEM_LIMIT = 100 * 1024 * 1024

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _tile_kernel(
    q_ref,  # [B, D] queries (VMEM, full)
    qsq_ref,  # [B, 1] query squared norms
    v_ref,  # [TILE, D] corpus tile
    sq_ref,  # [TILE//128, 128] (lane-packed per-row column; see note below) row squared norms
    valid_ref,  # [TILE//128, 128] (lane-packed per-row column; see note below) row validity (int8)
    out_s_ref,  # [1, K, B] tile-local top-k scores (B in lanes: k is
    #   usually 16, and a [.., B, K] layout would lane-pad K 8x — 1 GB
    #   of padded HBM temp at 8M rows)
    out_i_ref,  # [1, K, B] tile-local top-k global row ids
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

    sq_v = sq_ref[:].reshape(1, tile_n)  # [TILE//128, 128] (lane-packed per-row column; see note below)
    if metric is SimilarityMetric.DOT_PRODUCT:
        scores = dot
    elif metric is SimilarityMetric.COSINE:
        q_norm = jnp.sqrt(qsq_ref[:])  # [B, 1]
        v_norm = jnp.sqrt(sq_v)  # [TILE//128, 128] (lane-packed per-row column; see note below)
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
        out_s_ref[0, pl.ds(i, 1), :] = best.reshape(1, b)
        out_i_ref[0, pl.ds(i, 1), :] = (bidx + tile_base).reshape(1, b)
        return jnp.where(col_ids == bidx, NEG_INF, scores)

    jax.lax.fori_loop(0, k, select, scores, unroll=True)


BLOCK = 128  # lane width; one candidate survives per block in approx mode

# Per-row column operands (sqnorms / scales / validity) ship as
# [N/128, 128] lane-packed blocks: the natural [N, 1] layout lane-pads
# 128x under T(8,128) — measured 4 GB + 1 GB of padded HLO temps at 8M
# rows (a hard compile OOM), ~1.6 GB of padded copy traffic at 1M. The
# kernels reshape each [tile/128, 128] block back to [1, tile] in VMEM;
# that relayout costs ~2.6 ms/batch at 1M b256 on the exhaustive path —
# accepted: it buys 8M+ single-chip capacity and the serving default
# (kernels/amk.py) never runs these kernels.


def _scores_tile(
    q, qscale, qsq, v, vscale, sq_v, metric: SimilarityMetric, tile_n: int
):
    """[B, TILE] similarity tile.

    int8 rows are cast to f32 in VMEM and contracted at DEFAULT precision:
    measured 20x faster than the int8x int8->int32 dot on this stack
    (Mosaic lowers that off the MXU), while keeping the 4x HBM saving —
    the cast costs VPU cycles that overlap the tile DMA. Queries stay
    full-precision f32, so only row quantization contributes error."""
    if v.dtype == jnp.int8:
        dot = jax.lax.dot_general(
            q.astype(jnp.float32),
            v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * vscale.reshape(1, tile_n)
    else:
        dot = jax.lax.dot_general(
            q,
            v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                None if v.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
            ),
        )
    sq_row = sq_v.reshape(1, tile_n)
    if metric is SimilarityMetric.DOT_PRODUCT:
        return dot
    if metric is SimilarityMetric.COSINE:
        denom = jnp.sqrt(qsq) * jnp.sqrt(sq_row)
        return jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0)
    if metric is SimilarityMetric.EUCLIDEAN:
        d_sq = jnp.maximum(qsq + sq_row - 2.0 * dot, 0.0)
        return 1.0 / (1.0 + jnp.sqrt(d_sq))
    raise NotImplementedError("manhattan uses the tiled XLA path")


def _block_topw_kernel(
    q_ref,
    qscale_ref,
    qsq_ref,
    v_ref,
    vscale_ref,
    sq_ref,
    valid_ref,
    out_s_ref,  # [1, B, W * BLOCK]
    out_i_ref,  # [1, B, W * BLOCK]
    *,
    metric: SimilarityMetric,
    tile_n: int,
    winners: int,
):
    """Partial top-W reduction over LANE GROUPS (TPU-KNN-style, but with
    a hardware-native partition). Group l of a tile = rows {t : t === l
    (mod 128)} — i.e. the rows sharing VPU lane l. Reducing a group is
    then a log2(T/128) sequence of *elementwise* vreg folds
    (``max(s[:, :half], s[:, half:])``): no cross-lane shuffles, no
    relayout. The previous per-128-consecutive-rows partition needed a
    cross-lane argmax, which Mosaic lowers ~4x slower than the matmul
    itself — the select, not the matmul or the DMA, was the 6.5 ms
    bottleneck at 1M (BASELINE.md round-3 notes; this fold dropped it
    to ~2.9 ms).

    The strided partition is also *more robust* for real ingestion:
    consecutively-inserted near-duplicates land in consecutive rows,
    which are DIFFERENT lane groups (old layout: the same 128-row block,
    where only W of them could ever surface). A miss now needs more than
    W of the true top-k to share both a tile and a lane (P ~ C(k, W+1) *
    (1/128)^W per tile; ~4e-4 for k=10, W=2 even when all ten live in
    one tile).

    Ties resolve to the lowest row: the max-fold is score-only, and the
    index-recovery fold takes the *minimum* matching column.
    """
    scores = _scores_tile(
        q_ref[:], qscale_ref[:], qsq_ref[:], v_ref[:], vscale_ref[:],
        sq_ref[:], metric, tile_n,
    )
    valid_row = valid_ref[:].reshape(1, tile_n) != 0
    scores = jnp.where(valid_row, scores, NEG_INF)

    b = scores.shape[0]
    n_rep = tile_n // BLOCK
    tile_base = pl.program_id(0) * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)

    for w in range(winners):  # static unroll; W is tiny (2-4)
        # score-only halving fold: [B, T] -> [B, 128] group maxima
        s = scores
        while s.shape[1] > BLOCK:
            half = s.shape[1] // 2
            s = jnp.maximum(s[:, :half], s[:, half:])
        s_bcast = jnp.tile(s, (1, n_rep))  # [B, T]; t -> group t%128
        # lowest column attaining the group max (= lowest global row)
        cand = jnp.where(scores >= s_bcast, col_ids, tile_n)
        while cand.shape[1] > BLOCK:
            half = cand.shape[1] // 2
            cand = jnp.minimum(cand[:, :half], cand[:, half:])
        out_s_ref[0, :, pl.ds(w * BLOCK, BLOCK)] = s
        out_i_ref[0, :, pl.ds(w * BLOCK, BLOCK)] = cand + tile_base
        if w + 1 < winners:
            scores = jnp.where(
                col_ids == jnp.tile(cand, (1, n_rep)), NEG_INF, scores
            )


def _block_topk_call(
    inputs: list,
    in_specs: list,
    *,
    b: int,
    n: int,
    metric: SimilarityMetric,
    k: int,
    tile_n: int,
    bytes_per_row: int,
    interpret: bool,
    winners: int = 1,
):
    n_tiles = n // tile_n
    n_cand = BLOCK * winners  # per-tile candidates (tile-size invariant)
    kernel = functools.partial(
        _block_topw_kernel, metric=metric, tile_n=tile_n, winners=winners
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, b, n_cand), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b, n_cand), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b, n_cand), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b, n_cand), jnp.int32),
        ],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * inputs[0].shape[-1],
            bytes_accessed=n * bytes_per_row + b * inputs[0].shape[-1] * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    # Candidate rows interleave across lane groups, so flat position is
    # NOT row-monotonic and lax.top_k's positional tie-break no longer
    # implies lowest-row-on-ties here. Every serving path re-scores the
    # winners (device rescored kernel / host f64) and re-sorts candidates
    # by row there, restoring the reference's stable-sort tie semantics.
    s_flat = jnp.moveaxis(out_s, 0, 1).reshape(b, n_tiles * n_cand)
    i_flat = jnp.moveaxis(out_i, 0, 1).reshape(b, n_tiles * n_cand)
    s_top, pos = jax.lax.top_k(s_flat, k)
    i_top = jnp.take_along_axis(i_flat, pos, axis=1)
    return s_top, i_top


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "tile_n", "interpret", "winners"),
)
def pallas_search_block_topk(
    values: jax.Array,  # [N, D] f32/bf16
    sqnorms: jax.Array,
    valid: jax.Array,
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
    winners: int = 1,
):
    """Approximate (lane-group top-W) candidate selection; measured
    recall@10 = 1.0 at 1M for W=2 vs the exhaustive kernel (the strided
    partition tolerates consecutive near-duplicates, and a miss needs
    >W of the true top-k sharing both a tile and a lane). Pair with
    exact re-scoring of the winners; superseded as the serving default
    by kernels/amk.py (VECTORLITE_AMK=0 revives this path)."""
    n, d = values.shape
    b = queries.shape[0]
    assert n % tile_n == 0 and tile_n % BLOCK == 0
    queries = queries.astype(jnp.float32)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    dummy_scale = jnp.ones((b, 1), jnp.float32)
    inputs = [
        queries,
        dummy_scale,
        qsq,
        values,
        sqnorms.reshape(n // 128, 128),  # reused slot; unused for f32 dot
        sqnorms.reshape(n // 128, 128),
        valid.astype(jnp.int8).reshape(n // 128, 128),
    ]
    in_specs = [
        pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM),
    ]
    return _block_topk_call(
        inputs,
        in_specs,
        b=b,
        n=n,
        metric=metric,
        k=k,
        tile_n=tile_n,
        bytes_per_row=d * values.dtype.itemsize,
        interpret=interpret,
        winners=winners,
    )


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "tile_n", "interpret", "winners"),
)
def pallas_search_block_topk_int8(
    values_q: jax.Array,  # [N, D] int8
    scales: jax.Array,
    sqnorms: jax.Array,
    valid: jax.Array,
    queries: jax.Array,
    *,
    metric: SimilarityMetric,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
    winners: int = 1,
):
    n, d = values_q.shape
    b = queries.shape[0]
    assert n % tile_n == 0 and tile_n % BLOCK == 0
    queries = queries.astype(jnp.float32)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    inputs = [
        queries,
        jnp.ones((b, 1), jnp.float32),  # unused (queries stay f32)
        qsq,
        values_q,
        scales.reshape(n // 128, 128),
        sqnorms.reshape(n // 128, 128),
        valid.astype(jnp.int8).reshape(n // 128, 128),
    ]
    in_specs = [
        pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM),
    ]
    return _block_topk_call(
        inputs,
        in_specs,
        b=b,
        n=n,
        metric=metric,
        k=k,
        tile_n=tile_n,
        bytes_per_row=d,
        interpret=interpret,
        winners=winners,
    )


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "k_sel", "tile_n", "interpret", "winners"),
)
def pallas_search_block_topk_rescored(
    values_scan: jax.Array,  # [N, D] bf16 scan copy (half the HBM reads)
    values_exact: jax.Array,  # [N, D] f32 exact rows (co-resident)
    sqnorms: jax.Array,  # [N] f32 exact squared norms
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    k_sel: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
    winners: int = 2,
):
    """Speed-mode scan: block-top-W candidate selection over the bf16
    copy (1-pass MXU matmul + argmax select — reads half the bytes of
    the f32 scan), then an exact-f32 re-score of the k_sel candidates
    from the co-resident f32 rows, all in one dispatch. Returned scores
    are the same exact-f32 values the exhaustive kernel computes; with
    k_sel ~ 2x the k bucket, measured recall@10 = 1.0 at 1M (bf16
    selection error only reorders near-boundary candidates).

    Costs one extra bf16 corpus copy in HBM (1.5x total vs f32-only) —
    index/flat.py enables this only while the budget allows.
    """
    s_sel, i_sel = pallas_search_block_topk(
        values_scan,
        sqnorms,
        valid,
        queries,
        metric=metric,
        k=k_sel,
        tile_n=tile_n,
        interpret=interpret,
        winners=winners,
    )
    queries = queries.astype(jnp.float32)
    rows = values_exact[i_sel]  # [B, k_sel, D] gather
    dot = jnp.einsum(
        "bkd,bd->bk",
        rows,
        queries,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric is SimilarityMetric.DOT_PRODUCT:
        exact = dot
    elif metric is SimilarityMetric.COSINE:
        qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
        denom = jnp.sqrt(qsq) * jnp.sqrt(sqnorms[i_sel])
        exact = jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0)
    elif metric is SimilarityMetric.EUCLIDEAN:
        qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
        d_sq = jnp.maximum(qsq + sqnorms[i_sel] - 2.0 * dot, 0.0)
        exact = 1.0 / (1.0 + jnp.sqrt(d_sq))
    else:
        raise NotImplementedError("manhattan uses the tiled XLA path")
    exact = jnp.where(s_sel == NEG_INF, NEG_INF, exact)
    # i_sel is ordered by bf16 selection score; re-sort candidates by
    # global row so positional top_k breaks exact-score ties toward the
    # LOWEST row — the same insertion-order tie-break as the exhaustive
    # kernel, the host scan, and the reference's stable sort
    order = jnp.argsort(i_sel, axis=1)
    i_sel = jnp.take_along_axis(i_sel, order, axis=1)
    exact = jnp.take_along_axis(exact, order, axis=1)
    s_top, pos = jax.lax.top_k(exact, k)
    i_top = jnp.take_along_axis(i_sel, pos, axis=1)
    return s_top, i_top


def _tile_kernel_int8(
    q_ref,  # [B, D] int8 quantized queries
    qscale_ref,  # [B, 1] f32 query scales
    qsq_ref,  # [B, 1] f32 exact query squared norms
    v_ref,  # [TILE, D] int8 corpus tile
    vscale_ref,  # [TILE//128, 128] (lane-packed per-row column; see note below) f32 row scales
    sq_ref,  # [TILE//128, 128] (lane-packed per-row column; see note below) f32 exact row squared norms
    valid_ref,  # [TILE//128, 128] (lane-packed per-row column; see note below) int8 validity
    out_s_ref,  # [1, K, B] (see _tile_kernel)
    out_i_ref,  # [1, K, B]
    *,
    metric: SimilarityMetric,
    k: int,
    tile_n: int,
):
    """int8 storage variant (4x less HBM): rows cast to f32 in VMEM and
    contracted at DEFAULT precision (see _scores_tile); scores reconstruct
    with exact norms; callers re-score the winners exactly on the host
    (index/flat.py)."""
    dot = jax.lax.dot_general(
        q_ref[:].astype(jnp.float32),
        v_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * vscale_ref[:].reshape(1, tile_n)
    sq_v = sq_ref[:].reshape(1, tile_n)
    if metric is SimilarityMetric.DOT_PRODUCT:
        scores = dot
    elif metric is SimilarityMetric.COSINE:
        denom = jnp.sqrt(qsq_ref[:]) * jnp.sqrt(sq_v)
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

    def select(i, scores):
        best = jnp.max(scores, axis=1, keepdims=True)
        cand = jnp.where(scores >= best, col_ids, tile_n)
        bidx = jnp.min(cand, axis=1, keepdims=True)
        out_s_ref[0, pl.ds(i, 1), :] = best.reshape(1, b)
        out_i_ref[0, pl.ds(i, 1), :] = (bidx + tile_base).reshape(1, b)
        return jnp.where(col_ids == bidx, NEG_INF, scores)

    jax.lax.fori_loop(0, k, select, scores, unroll=True)


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "tile_n", "interpret")
)
def pallas_search_topk_int8(
    values_q: jax.Array,  # [N, D] int8
    scales: jax.Array,  # [N] f32
    sqnorms: jax.Array,  # [N] f32 exact squared norms
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
):
    n, d = values_q.shape
    b = queries.shape[0]
    assert n % tile_n == 0 and tile_n % 128 == 0, (n, tile_n)
    n_tiles = n // tile_n
    k_tile = min(k, tile_n)

    queries = queries.astype(jnp.float32)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)

    kernel = functools.partial(
        _tile_kernel_int8, metric=metric, k=k_tile, tile_n=tile_n
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, k_tile, b), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_tile, b), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, k_tile, b), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, k_tile, b), jnp.int32),
        ],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        queries,
        jnp.ones((b, 1), jnp.float32),  # unused (queries stay f32)
        qsq,
        values_q,
        scales.reshape(n // 128, 128),
        sqnorms.reshape(n // 128, 128),
        valid.astype(jnp.int8).reshape(n // 128, 128),
    )

    s_flat = jnp.moveaxis(out_s, 2, 0).reshape(b, n_tiles * k_tile)
    i_flat = jnp.moveaxis(out_i, 2, 0).reshape(b, n_tiles * k_tile)
    s_top, pos = jax.lax.top_k(s_flat, k)
    i_top = jnp.take_along_axis(i_flat, pos, axis=1)
    return s_top, i_top


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
    assert n % tile_n == 0 and tile_n % 128 == 0, (n, tile_n)
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
                (tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n // 128, 128), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, k_tile, b), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_tile, b), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, k_tile, b), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, k_tile, b), jnp.int32),
        ],
        compiler_params=_COMPILER_PARAMS,
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
        sqnorms.reshape(n // 128, 128),
        valid.astype(jnp.int8).reshape(n // 128, 128),
    )

    # Final exact merge over the per-tile winners ([n_tiles, B, K] ->
    # [B, n_tiles*K], tile-major so ties keep global row order).
    s_flat = jnp.moveaxis(out_s, 2, 0).reshape(b, n_tiles * k_tile)
    i_flat = jnp.moveaxis(out_i, 2, 0).reshape(b, n_tiles * k_tile)
    s_top, pos = jax.lax.top_k(s_flat, k)
    i_top = jnp.take_along_axis(i_flat, pos, axis=1)
    return s_top, i_top
