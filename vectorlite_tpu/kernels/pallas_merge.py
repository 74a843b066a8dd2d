"""Pallas tournament-merge selection: running per-lane top-W in VMEM.

The round-4 roofline (bench/report_roofline_r4.json) proved the shipped
ApproxTopK engine's selection+aggregation costs ~1.9 ms at k_sel=128
against a 0.42 ms matmul floor, and that XLA ApproxTopK's aggregation
is superlinear in k_sel. The fold variants that tried to beat it died
by materializing a ``[B, N]`` rank matrix (15-23 ms). This kernel is
the one untried attack from that close-out (VERDICT r4 item 3): the
per-shard winner merge happens *in registers/VMEM across grid steps* —
no per-tile winner dump to HBM, no XLA aggregation sort, no ``[B, N]``
anything.

Design
------
Partition rows by VPU lane: row r belongs to lane group ``r % 128``
(the same hardware-native partition as pallas_scan's lane-group fold —
strided, so consecutively-inserted near-duplicates land in different
groups). The kernel keeps, for every (query, lane group), the running
top-W scores and their row ids as ``W`` pairs of ``[B, 128]`` VMEM
accumulators, sorted descending by ``w``. Each corpus tile contributes
its ``[B, TILE]`` score matrix, consumed 128 columns at a time by an
elementwise insertion network:

    gt_w = c > m_w          # [B, 128] compare against each rung
    shift rungs below the insertion point down one, insert (c, ic)

— ``2W+3``-ish VPU ops per 128-column block, **zero cross-lane
shuffles** (the fold-dead-end's killer was exactly the cross-lane
argmax/rank materialization). The accumulator is the pallas output
block with a constant index map: it stays VMEM-resident across the
sequential TPU grid and is flushed to HBM once, after the last tile —
``[B, W*128]`` total, the only selection traffic the kernel ever
writes.

The result is the exact per-lane-group global top-W. A true top-k
member is lost only if more than W true winners share a lane group
(P ~ C(k, W+1)/128^W: ~4e-4 for k=10, W=2) or reduced-precision
scoring displaces it below W others *in its own group* (a ~100-rank
global displacement at 1M is ~1 within-group rank). Callers re-score
the W*128 pool exactly, as with every selection engine here.

Reference semantics reproduced: exhaustive scan + stable sort
(reference: src/index/flat.rs:98-119); ties and exactness are restored
by the exact re-score + row-sorted positional top_k downstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.metrics import SimilarityMetric
from .pallas_scan import _COMPILER_PARAMS, _scores_tile

NEG_INF = float("-inf")

LANES = 128

DEFAULT_TILE_N = 16384


def _merge_kernel(
    q_ref,  # [B, D] queries (VMEM, constant across grid)
    qscale_ref,  # [B, 1] (unused for f32/bf16 dot; int8 parity slot)
    qsq_ref,  # [B, 1] query squared norms
    v_ref,  # [TILE, D] corpus tile
    vscale_ref,  # [TILE//128, 128] lane-packed row scales (int8) / unused
    sq_ref,  # [TILE//128, 128] lane-packed row squared norms
    valid_ref,  # [TILE//128, 128] lane-packed validity (int8)
    acc_s_ref,  # [W, B, 128] running top-W scores (constant index map:
    #   VMEM-resident across the whole sequential grid, flushed once)
    acc_i_ref,  # [W, B, 128] running top-W global row ids
    scratch_ref,  # [B, TILE] f32 VMEM staging for the score tile:
    #   Mosaic has no dynamic_slice lowering for VMEM *values* (the
    #   pallas_l1 lesson, round 3), so the per-block loop reads pl.ds
    #   slices of this ref instead of slicing the score array
    *,
    metric: SimilarityMetric,
    tile_n: int,
    winners: int,
):
    b = q_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_s_ref[...] = jnp.full(
            (winners, b, LANES), NEG_INF, jnp.float32
        )
        acc_i_ref[...] = jnp.zeros((winners, b, LANES), jnp.int32)

    scores = _scores_tile(
        q_ref[:], qscale_ref[:], qsq_ref[:], v_ref[:], vscale_ref[:],
        sq_ref[:], metric, tile_n,
    )
    valid_row = valid_ref[:].reshape(1, tile_n) != 0
    scratch_ref[...] = jnp.where(valid_row, scores, NEG_INF)

    n_blk = tile_n // LANES
    tile_base = pl.program_id(0) * tile_n
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, LANES), 1)

    def body(j, carry):
        ms, is_ = carry  # tuples of W [B, 128] registers, sorted desc
        c = scratch_ref[:, pl.ds(j * LANES, LANES)]
        ic = tile_base + j * LANES + lane_ids
        new_ms, new_is = [], []
        # elementwise insertion network: rung w keeps max(m_w, best of
        # what fell through from above); strictly-greater comparisons
        # make ties keep the incumbent — incumbents come from earlier
        # (lower-row) blocks, matching the stable lowest-row tie-break
        for w in range(len(ms)):
            gt = c > ms[w]
            new_ms.append(jnp.where(gt, c, ms[w]))
            new_is.append(jnp.where(gt, ic, is_[w]))
            # the displaced incumbent cascades to the next rung
            c = jnp.where(gt, ms[w], c)
            ic = jnp.where(gt, is_[w], ic)
        return tuple(new_ms), tuple(new_is)

    ms = tuple(acc_s_ref[w] for w in range(winners))
    is_ = tuple(acc_i_ref[w] for w in range(winners))
    ms, is_ = jax.lax.fori_loop(0, n_blk, body, (ms, is_))
    for w in range(winners):
        acc_s_ref[w] = ms[w]
        acc_i_ref[w] = is_[w]


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "tile_n", "interpret", "winners"),
)
def pallas_search_merge_topk(
    values: jax.Array,  # [N, D] f32/bf16
    sqnorms: jax.Array,  # [N] f32
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
    winners: int = 2,
):
    """Approximate candidate selection via the in-VMEM tournament merge.

    Returns (scores [B, k], rows [B, k]) ranked on the scan dtype's
    scores — pair with exact re-scoring for serving (the _rescored
    wrapper below).
    """
    n, d = values.shape
    b = queries.shape[0]
    assert n % tile_n == 0 and tile_n % LANES == 0, (n, tile_n)
    n_tiles = n // tile_n
    queries = queries.astype(jnp.float32)
    qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    dummy_scale = jnp.ones((b, 1), jnp.float32)

    kernel = functools.partial(
        _merge_kernel, metric=metric, tile_n=tile_n, winners=winners
    )
    const = lambda j: (0, 0)  # noqa: E731
    acc_spec = pl.BlockSpec(
        (winners, b, LANES), lambda j: (0, 0, 0), memory_space=pltpu.VMEM
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n // 128, 128), lambda j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n // 128, 128), lambda j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n // 128, 128), lambda j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[acc_spec, acc_spec],
        out_shape=[
            jax.ShapeDtypeStruct((winners, b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((winners, b, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((b, tile_n), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * values.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        queries,
        dummy_scale,
        qsq,
        values,
        sqnorms.reshape(n // 128, 128),  # unused slot for f32/bf16 dot
        sqnorms.reshape(n // 128, 128),
        valid.astype(jnp.int8).reshape(n // 128, 128),
    )
    # [W, B, 128] -> [B, W*128]; candidate order is lane-interleaved,
    # NOT row-monotonic — downstream rescore re-sorts by row
    s_flat = jnp.moveaxis(out_s, 0, 1).reshape(b, winners * LANES)
    i_flat = jnp.moveaxis(out_i, 0, 1).reshape(b, winners * LANES)
    s_top, pos = jax.lax.top_k(s_flat, k)
    return s_top, jnp.take_along_axis(i_flat, pos, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "k_sel", "tile_n", "interpret", "winners",
        "tombstones",
    ),
)
def pallas_search_merge_topk_rescored(
    values_scan: jax.Array,  # [N, D] bf16 scan copy
    values_exact: jax.Array,  # [N, D] f32 exact rows (co-resident)
    sqnorms: jax.Array,  # [N] f32 exact squared norms
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    k_sel: int = 128,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
    winners: int = 2,
    tombstones: bool = True,
    live_hi: jax.Array | None = None,
):
    """Tournament-merge selection + exact-f32 re-score, one dispatch —
    the serving form (same contract as amk_search_topk_rescored)."""
    from .amk import _exact_rescore_device

    _, i_sel = pallas_search_merge_topk(
        values_scan,
        sqnorms,
        valid,
        queries,
        metric=metric,
        k=min(k_sel, winners * LANES),
        tile_n=tile_n,
        interpret=interpret,
        winners=winners,
    )
    if not tombstones:
        if live_hi is None:
            live_hi = jnp.sum(valid.astype(jnp.int32))
        return _exact_rescore_device(
            i_sel, values_exact, None, queries, metric, k, live_hi
        )
    return _exact_rescore_device(
        i_sel, values_exact, valid, queries, metric, k, 0
    )
