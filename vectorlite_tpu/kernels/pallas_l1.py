"""Pallas fused Manhattan (L1) scan + exact top-k.

Manhattan similarity is ``1 / (1 + sum_d |q_d - v_d|)`` (reference:
src/lib.rs:521-532). Unlike the other three metrics it has NO matmul
form, so the MXU cannot help: the scan is inherently VPU-bound at
``3*B*N*D`` elementwise ops. What Pallas buys over the chunked XLA path
(core/metrics.py) is the memory shape, not FLOPs: the XLA path
materializes the full ``[B, N]`` score matrix in HBM before ``top_k``
(1 GB at 1M x b256; impossible at 10M), while this kernel reduces each
corpus tile to its ``[B, K]`` winners inside VMEM — one pass over the
corpus, no intermediate.

Layout: the corpus tile arrives ``[T, D]`` (lanes = D) and is transposed
once in VMEM to ``[D, T]`` so each dimension's pass is a sublane
broadcast of ``vT[c, :]`` against a lane broadcast of ``q[:, c]`` —
both free on the VPU. The D-loop accumulates ``|q - v|`` into a
``[B, T]`` f32 tile; selection then reuses the exhaustive
max/mask/min-index rounds of pallas_scan (ties to the lowest row,
matching the reference's stable sort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

DEFAULT_TILE_N = 2048

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024
)

#: dims folded per accumulation step: a [C, B, T] abs-diff block stays
#: comfortably in VMEM while amortizing loop overhead over C dims.
_DIM_CHUNK = 8


def _l1_tile_kernel(
    q_ref,  # [B, D] f32 queries
    v_ref,  # [TILE, D] corpus tile
    valid_ref,  # [TILE//128, 128] (lane-packed per-row column; see note below) int8
    out_s_ref,  # [1, K, B] (B in lanes — a [.., B, K] layout lane-pads
    #   K 8x; see pallas_scan._tile_kernel)
    out_i_ref,  # [1, K, B]
    vt_ref,  # [D, TILE] f32 VMEM scratch (transposed tile)
    qt_ref,  # [D, B] f32 VMEM scratch (transposed queries)
    *,
    k: int,
    tile_n: int,
    dim: int,
):
    q = q_ref[:].astype(jnp.float32)
    b = q.shape[0]
    # One VMEM relayout each into scratch; the dim loop then does
    # *dynamic ref loads* (pl.ds on a ref — supported by Mosaic) rather
    # than lax.dynamic_slice on a value (no TC lowering exists) or a
    # static unroll (whose dim/_DIM_CHUNK live [C, B, TILE] temporaries
    # blow the 100 MB scoped-VMEM limit at B=256: measured 112 MB).
    vt_ref[:] = v_ref[:].astype(jnp.float32).T
    qt_ref[:] = q.T

    def dim_block(i, acc):
        # [C, 1, TILE] vs [C, B, 1] -> [C, B, TILE] abs-diff, summed
        # over C; sublane-aligned starts (i * 8)
        vc = vt_ref[pl.ds(i * _DIM_CHUNK, _DIM_CHUNK), :][:, None, :]
        qc = qt_ref[pl.ds(i * _DIM_CHUNK, _DIM_CHUNK), :][:, :, None]
        return acc + jnp.sum(jnp.abs(qc - vc), axis=0)

    l1 = jax.lax.fori_loop(
        0, dim // _DIM_CHUNK, dim_block,
        jnp.zeros((b, tile_n), jnp.float32),
    )
    if dim % _DIM_CHUNK:
        base = dim - dim % _DIM_CHUNK
        vt = vt_ref[:]
        for c in range(dim % _DIM_CHUNK):
            l1 = l1 + jnp.abs(q[:, base + c : base + c + 1] - vt[base + c])

    scores = 1.0 / (1.0 + l1)
    valid_row = valid_ref[:].reshape(1, tile_n) != 0
    scores = jnp.where(valid_row, scores, NEG_INF)

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
    jax.jit, static_argnames=("k", "tile_n", "interpret")
)
def pallas_search_topk_l1(
    values: jax.Array,  # [N, D] f32/bf16
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
):
    """Exact Manhattan top-k without a [B, N] HBM intermediate.

    Returns (scores [B, k], row_indices [B, k]); scores are the
    reference's 1/(1+d) mapping in f32 (callers re-score winners in f64
    for exact parity, as with every reduced-precision path).
    """
    n, d = values.shape
    b = queries.shape[0]
    assert n % tile_n == 0 and tile_n % 128 == 0, (n, tile_n)
    n_tiles = n // tile_n
    k_tile = min(k, tile_n)

    queries = queries.astype(jnp.float32)
    kernel = functools.partial(
        _l1_tile_kernel, k=k_tile, tile_n=tile_n, dim=d
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM
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
        scratch_shapes=[
            pltpu.VMEM((d, tile_n), jnp.float32),
            pltpu.VMEM((d, b), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n * d,
            bytes_accessed=n * d * values.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        queries,
        values,
        valid.astype(jnp.int8).reshape(n // 128, 128),
    )

    s_flat = jnp.moveaxis(out_s, 2, 0).reshape(b, n_tiles * k_tile)
    i_flat = jnp.moveaxis(out_i, 2, 0).reshape(b, n_tiles * k_tile)
    s_top, pos = jax.lax.top_k(s_flat, k)
    i_top = jnp.take_along_axis(i_flat, pos, axis=1)
    return s_top, i_top
