"""IVF partitioned scan — the scale rung that makes 8M+ rows *fast*,
not just fit.

Brute-force selection (kernels/amk.py) reads the entire corpus every
batch: at 8M x 384 that is ~6 GB of bf16 per 256-query batch, and the
measured rung throughput collapses to a few thousand QPS exactly at the
scale the capacity ladder exists for (bench/report_flat8m.json, round
3). IVF restores the missing axis: k-means partition the corpus, store
rows partition-contiguous, and per query read only the ``nprobe``
closest partitions. Probe traffic is ``B * nprobe * P * D`` bytes vs
brute's ``N * D`` — at 8M with C=16384, nprobe=16 that is a ~6x HBM
read cut and a ~60x FLOP cut per batch.

TPU-first design decisions (vs the classic CPU inverted-list design,
e.g. faiss IVFFlat):

* **Partition blocks, not inverted lists.** Every partition is padded
  to one fixed width P (multiple of 128 lanes) inside a single
  ``[C * P, D]`` bf16 (int8 + per-row scales on the quantized rung)
  matrix. A probe is then ONE contiguous
  ``[P, D]`` block DMA — the gather is partition-granular, never
  row-granular, so HBM reads stay streaming-rate. Overflow rows past
  the pad width spill to a small dense "extra" matrix scanned like a
  mini brute-force corpus every query (measured <2% of rows at pad
  factor 1.25).
* **The probe step is a Pallas scalar-prefetch kernel.** XLA's
  ``take`` would materialize the gathered ``[B, L, P, D]`` operand in
  HBM (write + re-read: 3x the traffic of the probe itself). The
  Pallas kernel (`_gather_score_kernel`) consumes the per-query
  partition ids as a scalar-prefetch operand, DMAs each probed block
  HBM->VMEM once, and emits only the tiny ``[B, L, P]`` score tensor.
* **Selection ranks on monotonic surrogates** (the amk engine's rule):
  dot for DOT, ``dot * rsqrt(|v|^2)`` for COSINE, ``dot - 0.5 |v|^2``
  for EUCLIDEAN — division/sqrt never rides the big tensor. Winners
  are exactly re-scored (device f32 from the original-slot-order rows,
  then host f64 for reduced-precision rungs, as every approximate
  engine here does).
* **Fixed shapes everywhere**: C, P, nprobe, k_sel are static; the
  tail of rows appended since the last build lives in a power-of-2
  bucketed brute slice, so steady-state serving never recompiles.

The quality knob is ``nprobe`` (the measured recall/traffic frontier
lives in BASELINE.md round 5, 8M section); correctness does not depend on the
clustering — a bad k-means only costs recall, and recall is measured,
never assumed.

Reference scope note: the Rust reference has no partitioned index at
all (FlatIndex is an O(n) scan, src/index/flat.rs:98-119); this module
is a capability *extension* motivated by its <10K-vector intended
scale (README.md:94) — the TPU build serves 8M+ on one chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.metrics import SimilarityMetric
from .amk import _exact_rescore_device, _matmul, _rank_scores

NEG_INF = float("-inf")

#: pad factor: partition width P = ceil(pad * N_live / C), rounded up
#: to a lane multiple. 1.25 keeps block padding ~20% while spilling
#: only the fattest clusters' overflow to the dense extra matrix.
PAD_FACTOR = 1.25

#: probe width default; the measured frontier at 8M x 384 (BASELINE.md
#: round 5, 8M section) picks the serving operating point.
NPROBE = 16


# --------------------------------------------------------------- training


def _chunk_assign(rows, centroids, csq):
    """argmin_c ||x - c||^2 for one chunk — distances via the MXU
    (||x||^2 is constant per row and drops out of the argmin)."""
    dot = jax.lax.dot_general(
        rows,
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.argmin(csq[None, :] - 2.0 * dot, axis=1)


@partial(jax.jit, static_argnames=("iters", "chunk"))
def _kmeans(sample, init, key, *, iters: int, chunk: int):
    """Lloyd's iterations, chunk-scanned so the [chunk, C] assignment
    temp (not [S, C] — 17 GB at S=256K, C=16K) bounds the footprint.
    Assignment and the centroid update are both matmuls; dead centroids
    re-seed from random sample rows (standard IVF practice — empty
    partitions waste probe slots)."""
    s, d = sample.shape
    c = init.shape[0]
    n_chunks = s // chunk  # s is pre-padded to a chunk multiple
    xs = sample.reshape(n_chunks, chunk, d)

    def iteration(cents, key_i):
        csq = jnp.sum(cents * cents, axis=1)

        def fold(carry, x):
            sums, counts = carry
            assign = _chunk_assign(x, cents, csq)
            onehot = jax.nn.one_hot(assign, c, dtype=jnp.float32)
            return (
                sums + onehot.T @ x.astype(jnp.float32),
                counts + jnp.sum(onehot, axis=0),
            ), None

        (sums, counts), _ = jax.lax.scan(
            fold,
            (jnp.zeros((c, d), jnp.float32), jnp.zeros((c,), jnp.float32)),
            xs,
        )
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        reseed = sample[jax.random.randint(key_i, (c,), 0, s)]
        return jnp.where((counts > 0)[:, None], new, reseed), None

    final, _ = jax.lax.scan(iteration, init, jax.random.split(key, iters))
    return final


def train_centroids(
    sample32: np.ndarray,  # [S, D] f32 live-row sample
    c: int,
    *,
    iters: int = 8,
    chunk: int = 8192,
    seed: int = 0,
) -> jax.Array:
    """Full-dimension k-means codebook [C, D] f32 for the coarse
    quantizer. Runs entirely on the accelerator (assignment distance
    and the one-hot centroid update are MXU contractions under one
    jit); the sample is padded with repeats to a chunk multiple so the
    scan shape is static."""
    s, d = sample32.shape
    if s < c:
        raise ValueError(f"IVF needs sample >= C rows ({s} < {c})")
    rng = np.random.default_rng(seed)
    init = sample32[rng.choice(s, c, replace=False)]
    chunk = min(chunk, s)
    pad = (-s) % chunk
    if pad:
        sample32 = np.concatenate([sample32, sample32[:pad]], axis=0)
    return _kmeans(
        jnp.asarray(sample32),
        jnp.asarray(init),
        jax.random.key(seed),
        iters=iters,
        chunk=chunk,
    )


@partial(jax.jit, static_argnames=())
def _assign_jit(rows, centroids):
    csq = jnp.sum(centroids * centroids, axis=1)
    return _chunk_assign(rows, centroids, csq)


@partial(jax.jit, static_argnames=())
def _assign2_jit(rows, centroids):
    csq = jnp.sum(centroids * centroids, axis=1)
    dot = jax.lax.dot_general(
        rows,
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _, top2 = jax.lax.top_k(2.0 * dot - csq[None, :], 2)
    return top2.astype(jnp.int32)


def assign_rows(
    values64: np.ndarray,  # [N, D] host truth (any float dtype)
    live: np.ndarray,  # [L] live slot numbers
    centroids: jax.Array,
    rot: jax.Array | None = None,
    *,
    chunk: int = 65536,
    top2: bool = False,
) -> np.ndarray:
    """Nearest-centroid id per live slot, chunked through the device
    (each chunk casts to f32 on its own — no full-corpus f32 staging,
    same rule as the PQ encoder). ``top2`` returns the two nearest
    cells ``[L, 2]`` — build_layout spills rows of over-full cells to
    their runner-up instead of the brute-scanned extras (round 5: with
    tight clusters and single assignment, k-means skew pushed 25% of a
    2M corpus into extras, turning every probe into a quarter-brute
    scan)."""
    if top2:
        chunk = min(chunk, 16384)  # [chunk, C] top-k temp stays modest
        out = np.empty((len(live), 2), dtype=np.int32)
    else:
        out = np.empty(len(live), dtype=np.int32)
    for lo in range(0, len(live), chunk):
        sel = live[lo : lo + chunk]
        rows = jnp.asarray(values64[sel], dtype=jnp.float32)
        if rot is not None:
            rows = rows @ rot
        fn = _assign2_jit if top2 else _assign_jit
        out[lo : lo + chunk] = np.asarray(fn(rows, centroids))
    return out


# ----------------------------------------------------------- layout build


def build_layout(
    assign: np.ndarray,  # [L] partition id per live slot
    live: np.ndarray,  # [L] live slot numbers
    c: int,
    *,
    pad_factor: float = PAD_FACTOR,
    lane: int = 128,
) -> tuple[np.ndarray, np.ndarray]:
    """Partition-contiguous slot layout.

    Returns ``(part_slots [C, P] int64, extra_slots [E] int64)`` where
    ``part_slots[p]`` lists the original slots stored in partition
    ``p`` (-1 pads) and ``extra_slots`` holds the overflow of
    partitions fatter than P (they join the dense extra matrix the
    search scans unconditionally). P is a lane multiple so the Pallas
    block shapes tile.

    ``assign`` may be ``[L]`` (nearest cell) or ``[L, 2]``
    (nearest + runner-up, from ``assign_rows(top2=True)``): with the
    runner-up available, rows of cells fatter than P spill to their
    second-nearest cell's free slots before falling to extras. k-means
    skew on tightly-clustered corpora otherwise floods extras —
    measured 25% of a 2M corpus (524K rows) brute-scanned per query,
    round 5 — while the runner-up cell is nearly as probe-correlated
    as the winner."""
    n_live = len(live)
    second = None
    if assign.ndim == 2:
        assign, second = assign[:, 0], assign[:, 1]
    p_width = int(np.ceil(pad_factor * max(n_live, 1) / c))
    p_width = max(lane, ((p_width + lane - 1) // lane) * lane)
    order = np.argsort(assign, kind="stable")
    sorted_parts = assign[order]
    sorted_slots = live[order]
    counts = np.bincount(sorted_parts, minlength=c)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    part_slots = np.full((c, p_width), -1, dtype=np.int64)
    fill = np.minimum(counts, p_width)
    spill_rows = []  # positions into `order` of first-pass overflow
    for p in range(c):
        s, n = starts[p], counts[p]
        take = min(n, p_width)
        part_slots[p, :take] = sorted_slots[s : s + take]
        if n > take:
            spill_rows.append(np.arange(s + take, s + n))
    extras = []
    if spill_rows:
        spill = np.concatenate(spill_rows)
        if second is None:
            extras.append(sorted_slots[spill])
        else:
            # place overflow into the runner-up cell's remaining
            # capacity (grouped per cell so the fill bookkeeping stays
            # vectorizable); what still doesn't fit goes to extras
            s2 = second[order][spill]
            for p in np.unique(s2):
                rows_p = spill[s2 == p]
                room = p_width - fill[p]
                take = min(room, len(rows_p))
                if take > 0:
                    part_slots[p, fill[p] : fill[p] + take] = (
                        sorted_slots[rows_p[:take]]
                    )
                    fill[p] += take
                if take < len(rows_p):
                    extras.append(sorted_slots[rows_p[take:]])
    extra_slots = (
        np.concatenate(extras) if extras else np.empty(0, dtype=np.int64)
    )
    return part_slots, extra_slots


# ------------------------------------------------------------ probe kernel


def _gather_score_kernel(ids_ref, q_ref, rows_ref, out_ref):
    """One grid step = one (query, probe) pair: the probed partition's
    [P, D] block was DMA'd to VMEM by the BlockSpec index_map (which
    reads the scalar-prefetched partition id), so the body is just the
    [P, D] x [D] contraction at f32 accumulation.

    int8 blocks (the quantized-rung composition) cast to f32 in VMEM —
    HBM reads stay 1 byte/element, and the cast overlaps the block DMA
    (the same trade pallas_scan._scores_tile measured 20x better than
    Mosaic's s8 x s8 lowering). The per-row scales fold in OUTSIDE the
    kernel (a [B, L, P] elementwise on the score tensor)."""
    del ids_ref  # consumed by the index_map
    q = q_ref[0]  # [1, D] (block [1, 1, D]; the size-1 dims ride
    # OUTSIDE the trailing two so Mosaic's (8, 128) tiling rule sees
    # (1, D) == the overall array dims — the flat [B, D] layout with a
    # (1, D) block failed lowering on silicon, round 5)
    rows = rows_ref[0]  # [P, D]
    if rows.dtype == jnp.int8:
        rows = rows.astype(jnp.float32)
    out_ref[0, 0] = jax.lax.dot_general(
        q,
        rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("p_width", "interpret"))
def gather_score_pallas(
    part_rows: jax.Array,  # [C * P, D] bf16 partition-contiguous rows
    part_ids: jax.Array,  # [B, L] int32 probed partition per query
    queries: jax.Array,  # [B, D]
    *,
    p_width: int,
    interpret: bool = False,
) -> jax.Array:
    """Raw dot scores [B, L, P] of every query against its probed
    partition blocks. HBM traffic is exactly the probed bytes (each
    block read once into VMEM) — no [B, L, P, D] gather operand ever
    materializes, which is the entire point vs the XLA formulation."""
    b, l = part_ids.shape
    d = part_rows.shape[1]
    c = part_rows.shape[0] // p_width
    grid = (b, l)
    return pl.pallas_call(
        _gather_score_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # queries ride as [B, 1, D] and the scores as
                # [B, L, 1, P]: Mosaic requires the trailing two block
                # dims to be 8/128-tiled or equal to the overall dims,
                # so every size-1 block dim must sit outside them (the
                # flat [B, D]/(1, D) spec failed hardware lowering)
                pl.BlockSpec((1, 1, d), lambda bi, li, ids: (bi, 0, 0)),
                pl.BlockSpec(
                    (1, p_width, d),
                    lambda bi, li, ids: (ids[bi, li], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, p_width), lambda bi, li, ids: (bi, li, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, 1, p_width), jnp.float32),
        interpret=interpret,
    )(
        part_ids,
        # int8 blocks: queries STAY f32 (casting them to int8 would
        # truncate); the kernel casts the rows up instead
        (
            queries.astype(jnp.float32)
            if part_rows.dtype == jnp.int8
            else queries.astype(part_rows.dtype)
        )[:, None, :],
        part_rows.reshape(c, p_width, d),
    ).reshape(b, l, p_width)


def gather_score_xla(part_rows, part_ids, queries, *, p_width):
    """XLA reference formulation of the probe (materializes the
    [B, L, P, D] gathered operand — used for parity tests and
    non-Pallas backends). The query is quantized to the row dtype
    first, exactly as the Pallas kernel's MXU contraction sees it, so
    the two formulations are bitwise-comparable (bf16 x bf16 products
    are exact in the f32 accumulator)."""
    c = part_rows.shape[0] // p_width
    d = part_rows.shape[1]
    blocks = jnp.take(
        part_rows.reshape(c, p_width, d), part_ids, axis=0
    )  # [B, L, P, D]
    q = (
        queries.astype(jnp.float32)
        if part_rows.dtype == jnp.int8
        else queries.astype(part_rows.dtype).astype(jnp.float32)
    )
    return jnp.einsum(
        "blpd,bd->blp",
        blocks.astype(jnp.float32),
        q,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------- search


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "k_sel", "nprobe", "p_width", "tail_pad",
        "use_pallas", "tombstones", "interpret",
    ),
)
def ivf_search_topk_rescored(
    part_rows: jax.Array,  # [C * P, D] bf16 reordered rows
    part_slots: jax.Array,  # [C * P] int32 original slot (-1 pad)
    part_sqnorms: jax.Array,  # [C * P] f32 exact |v|^2 (0 on pads)
    part_valid: jax.Array,  # [C * P] bool live & not tombstoned
    centroids: jax.Array,  # [C, D] f32
    cent_sqnorms: jax.Array,  # [C] f32
    extra_rows: jax.Array,  # [E, D] bf16 overflow + pre-build stragglers
    extra_slots: jax.Array,  # [E] int32
    extra_sqnorms: jax.Array,  # [E] f32
    extra_valid: jax.Array,  # [E] bool
    values_exact: jax.Array,  # [cap, D] rung buffer (f32/bf16/int8 codes)
    valid: jax.Array,  # [cap] bool index validity mask
    queries: jax.Array,  # [B, D] f32
    tail_lo: jax.Array,  # scalar int32: first slot past the build
    size: jax.Array,  # scalar int32: append watermark (tail end)
    part_scales: jax.Array | None = None,  # [C * P] f32 (int8 layout)
    extra_scales: jax.Array | None = None,  # [E] f32 (int8 layout)
    values_scales: jax.Array | None = None,  # [cap] f32 (int8 rung)
    *,
    metric: SimilarityMetric,
    k: int,
    k_sel: int,
    nprobe: int,
    p_width: int,
    tail_pad: int,  # static pow2 bucket covering the tail slice
    use_pallas: bool,
    tombstones: bool,
    interpret: bool = False,
):
    """Full IVF serving step in one dispatch: centroid scan -> top-L
    probe -> partition-block scores (Pallas gather-score) -> extra +
    tail brute scores -> merged candidate pool -> exact-f32 re-score
    from the original-slot-order rows (kernels/amk.py's rescore, same
    tie-break and dedupe semantics). Returns (scores [B, k],
    slots [B, k]).

    The tail slice covers rows appended since the last layout build:
    ``values_exact[tail_lo : tail_lo + tail_pad]`` scanned brute-force
    (tail_pad is a static bucket; rows past ``tail_len`` mask to
    -inf), so inserts stay O(1) and never invalidate the layout."""
    b = queries.shape[0]
    qf = queries.astype(jnp.float32)

    # 1. coarse scan: rank centroids with the metric's surrogate
    cdot = _matmul(qf, centroids)
    crank = _rank_scores(cdot, metric, cent_sqnorms)
    _, probe_ids = jax.lax.top_k(crank, nprobe)  # [B, L]
    probe_ids = probe_ids.astype(jnp.int32)

    # 2. partition-block scores
    if use_pallas:
        dot = gather_score_pallas(
            part_rows, probe_ids, qf, p_width=p_width, interpret=interpret
        )
    else:
        dot = gather_score_xla(part_rows, probe_ids, qf, p_width=p_width)
    dot = dot.reshape(b, nprobe * p_width)
    # side tables gather as whole partition blocks (take along the
    # leading [C, P] axis — contiguous P-wide runs, never element-wise)
    c = part_rows.shape[0] // p_width
    w = nprobe * p_width
    if part_scales is not None:
        # int8 layout: fold the per-row quantization scales into the
        # raw code dots (block-gathered like every other side table)
        dot = dot * jnp.take(
            part_scales.reshape(c, p_width), probe_ids, axis=0
        ).reshape(b, w)
    psq = jnp.take(
        part_sqnorms.reshape(c, p_width), probe_ids, axis=0
    ).reshape(b, w)
    pok = jnp.take(
        part_valid.reshape(c, p_width), probe_ids, axis=0
    ).reshape(b, w)
    pslots = jnp.take(
        part_slots.reshape(c, p_width), probe_ids, axis=0
    ).reshape(b, w)
    prank = jnp.where(pok, _rank_scores_rows(dot, metric, psq), NEG_INF)

    # 3. candidate pool: probed top-k_sel, plus extras, plus the tail
    k_sel_eff = min(k_sel, nprobe * p_width)
    _, sel = jax.lax.top_k(prank, k_sel_eff)
    cand = [jnp.take_along_axis(pslots, sel, axis=1)]

    e = extra_rows.shape[0]
    if e:
        if extra_rows.dtype == jnp.int8:
            edot = _matmul(qf, extra_rows.astype(jnp.float32))
            edot = edot * extra_scales[None, :]
        else:
            edot = _matmul(qf, extra_rows)
        erank = jnp.where(
            extra_valid[None, :],
            _rank_scores(edot, metric, extra_sqnorms),
            NEG_INF,
        )
        k_e = min(k_sel_eff, e)
        _, esel = jax.lax.top_k(erank, k_e)
        cand.append(jnp.take(extra_slots, esel))

    if tail_pad:
        cap = values_exact.shape[0]
        # dynamic_slice clamps its start, so pre-clamp and re-derive
        # the slot numbers from the clamped start — rows and slots must
        # agree even when the bucket overhangs the buffer end
        start = jnp.minimum(tail_lo, cap - tail_pad)
        trows = jax.lax.dynamic_slice(
            values_exact, (start, 0), (tail_pad, values_exact.shape[1])
        )
        tslots = start + jnp.arange(tail_pad, dtype=jnp.int32)
        if values_scales is not None:
            # int8 rung: dequantize the tail slice (codes x scale) so
            # tail scores live in the same space as the layout's
            tscale = jax.lax.dynamic_slice(values_scales, (start,),
                                           (tail_pad,))
            trows = trows.astype(jnp.float32) * tscale[:, None]
        tdot = _matmul(qf, trows)
        tsq = jnp.sum(trows.astype(jnp.float32) ** 2, axis=1)
        tok = (tslots >= tail_lo) & (tslots < size) & valid[tslots]
        trank = jnp.where(
            tok[None, :], _rank_scores_rows(tdot, metric, tsq[None, :]),
            NEG_INF,
        )
        k_t = min(k_sel_eff, tail_pad)
        _, tsel = jax.lax.top_k(trank, k_t)
        cand.append(jnp.take(tslots, tsel))

    pool = jnp.concatenate(cand, axis=1)
    # -1 pad slots (and any masked winner) clamp to 0 for the rescore
    # gather; the validity mask re-kills them exactly
    pool = jnp.maximum(pool, 0).astype(jnp.int32)

    # 4. exact re-score from the slot-order rung rows (dedupes, masks
    # tombstones, ties break to the lowest row). The live watermark is
    # ``size``: -inf pool entries arrive slot-clamped, so the watermark
    # (or the validity gather) must re-kill any slot past the live
    # region — zero-filled pad rows would otherwise re-enter with
    # real-looking exact scores.
    return _exact_rescore_device(
        pool, values_exact, None if not tombstones else valid,
        qf, metric, k, size, row_scales=values_scales,
    )


def _rank_scores_rows(dot, metric: SimilarityMetric, sqnorms):
    """_rank_scores where sqnorms is already [B, W]-shaped (gathered
    per query) rather than a shared [N] column."""
    if metric is SimilarityMetric.DOT_PRODUCT:
        return dot
    if metric is SimilarityMetric.COSINE:
        return dot * jax.lax.rsqrt(jnp.maximum(sqnorms, 1e-30))
    if metric is SimilarityMetric.EUCLIDEAN:
        return dot - 0.5 * sqnorms
    raise NotImplementedError("manhattan scans exactly (pallas_l1)")
