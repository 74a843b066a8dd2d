"""ApproxTopK (XLA PartialReduce) scan — the default selection engine.

``jax.lax.approx_max_k`` is XLA:TPU's hardware top-k: a PartialReduce
that fuses onto the producing matmul as a fusion *root*, so the ``[B, N]``
score matrix never reaches HBM and the reduction runs in the matmul
epilogue (the TPU-KNN paper's design, see PAPERS.md). Measured at
1M x 384, b=256 on one v5e (bench round 3): the fused
bf16-matmul + approx_max_k selection runs **1.18 ms/batch = 217K QPS at
160 TF/s** — ~4x the best hand-written Pallas block kernel of round 2
(the Mosaic select idiom cost more than the matmul; see
pallas_scan.py's lane-group fold for the history) and ~20x the round-1
exhaustive scan.

Selection ranks on *monotonic* surrogates, never on full formulas —
no division or sqrt rides the [B, N] fusion:

* cosine:     ``dot * rsqrt(|v|^2)``   (1/|q| is constant per query row)
* euclidean:  ``dot - 0.5 |v|^2``      (-d^2/2 shifted by the constant |q|^2)
* dot:        ``dot``

Winners are then re-scored exactly (f32 HIGHEST from the co-resident
rows in one dispatch, or f64 on the host for reduced-precision storage)
and ties break to the lowest row. Recall floors measured at 1M (64-query
f64 ground truth): bf16 selection misorders only near-boundary
candidates, so candidate recall@10 is 0.994 at k_sel=32, 0.997 at 64,
**1.000 at k_sel=128** — raising ``recall_target`` beyond 0.95 does not
help (the floor is bf16 matmul precision, not reduction drops), widening
the candidate pool does.

Round-5 shipped frontier (int8 scan copy, 1M x 384 b=256 cosine,
1024-query f64 truth = 10,240 hits — bench/report_headline_r5b.json):

* default  k_sel=128 rt=0.99:  2.886 ms = **88.7K QPS**, recall 0.9998
  (2/10240 missed; 256-query windows measure 1.0000)
* turbo    k_sel=64  rt=0.99:  1.509 ms = **170K QPS**,  recall 0.9994
  (VECTORLITE_AMK_KSEL=64)
* rt=0.98  k_sel=128:          1.775 ms = 144K QPS,      recall 0.9994
  (past rt~0.985 XLA re-tiles the PartialReduce: 128-row shards ->
  fewer partial winners -> the aggregation stage that round 4 proved
  superlinear in k_sel gets cheaper — the same knob from the other
  side)

The hand-written Pallas tournament-merge kernel (pallas_merge.py) —
per-lane top-W accumulators VMEM-resident across grid steps, no [B,N]
ranks — was the one untried attack on that aggregation cost; measured
on silicon it is exact-ish but slower (w=2: 4.24 ms / 10 missed; w=3:
5.56 ms / 1 missed), so ApproxTopK + exact rescore remains the shipped
engine and 2.9 ms is the measured recall-0.9998 bound at k_sel=128.

Reference semantics being reproduced: exhaustive scan + stable sort
(reference: src/index/flat.rs:98-119).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.metrics import SimilarityMetric

NEG_INF = float("-inf")

#: PartialReduce sizing knob. The measured recall/latency frontier at
#: 1M x 384 b=256 (256-query f64 ground truth, 2560 hits):
#:   rt=0.95:  ~2.1 ms  misses 12-14/2560  (recall ~0.995)
#:   rt=0.99:  ~3.7 ms  misses  1/2560     (recall 0.9996)   <- default
#:   rt>=0.995: XLA abandons the fused strategy (9.7-50 ms) — same
#:   cliff as k_sel > 128 at rt=0.99. Raising k_sel at fixed rt does
#:   NOT recover the misses (drops happen at the shard-top-1 reduction,
#:   before aggregation). VECTORLITE_AMK_RT overrides (e.g. 0.95 as a
#:   turbo profile); exact serving remains approx=False (exhaustive
#:   Pallas kernel).
RECALL_TARGET = 0.99

#: candidate-pool floor: bf16 selection error displaces true top-10
#: members by up to ~100 rank positions at 1M; a 128-wide exact-rescore
#: pool recovers every displacement observed (64-wide missed 3/2560)
K_SEL_MIN = 128


def recall_target() -> float:
    """RECALL_TARGET with the VECTORLITE_AMK_RT env override."""
    from ..utils import env_number

    return float(
        env_number("VECTORLITE_AMK_RT", RECALL_TARGET, cast=float)
    )


def amk_available() -> bool:
    """ApproxTopK lowers to the fused PartialReduce only on TPU (other
    backends fall back to exact sort — correct, but no speedup)."""
    return jax.default_backend() == "tpu"


def _rank_scores(dot, metric: SimilarityMetric, sqnorms):
    """Monotonic selection surrogate (see module docstring)."""
    if metric is SimilarityMetric.DOT_PRODUCT:
        return dot
    if metric is SimilarityMetric.COSINE:
        return dot * jax.lax.rsqrt(jnp.maximum(sqnorms, 1e-30))[None, :]
    if metric is SimilarityMetric.EUCLIDEAN:
        return dot - 0.5 * sqnorms[None, :]
    raise NotImplementedError("manhattan uses pallas_l1 / the XLA path")


def _matmul(queries, values):
    """[B, D] x [N, D]^T at DEFAULT precision: one MXU pass (bf16
    multipliers) regardless of storage dtype; f32 storage still reads
    f32 bytes but multiplies at the same rate."""
    q = queries.astype(values.dtype) if values.dtype == jnp.bfloat16 \
        else queries
    return jax.lax.dot_general(
        q,
        values,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def int8_quantize(rows):
    """Symmetric per-row int8 quantization: ``codes * scale ~ rows``.

    One implementation serves every int8 consumer (storage rung, scan
    copy, probes): this is core.metrics.quantize_rows_int8, re-exported
    here so kernel callers don't reach across layers."""
    from ..core.metrics import quantize_rows_int8

    return quantize_rows_int8(rows)


def _int8_scan_dot(queries, values_s8, scan_scales):
    """s8 x s8 -> s32 contraction for an int8 *scan copy* (round-3
    probe: lowers as an MXU s32 convolution, 1.96 ms vs bf16's 2.51 ms
    at 1M x 384 b=256 — half the HBM reads and the int8 MXU rate).
    Queries are quantized per-row on device; both scales fold back in
    f32 after the contraction."""
    q_s8, qscale = int8_quantize(queries)
    dot = jax.lax.dot_general(
        q_s8,
        values_s8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return dot.astype(jnp.float32) * (
        qscale[:, None] * scan_scales[None, :]
    )


def _exact_rescore_device(
    i_sel, values_exact, valid, queries, metric, k, live_hi,
    row_scales=None,
):
    """Gather the candidates' exact rows and re-score at f32 HIGHEST.

    ``i_sel`` is sorted ascending first: coalesced gather DMA and the
    lowest-row tie-break (positional top_k over row-sorted candidates)
    in one move — the same stable-sort semantics as the host scan and
    the reference. Duplicate candidate rows (possible after locality
    augmentation) are masked to -inf after the sort so no row can be
    returned twice.

    Side-gather elimination (round-3 rescore probes): the naive form
    gathered ``sqnorms[i_sel]`` and ``valid[i_sel]`` — 2x 51K random
    scalar fetches per batch that cost ~0.8 ms at headline scale, more
    than the row gather itself. Instead: candidate norms are recomputed
    from the already-gathered rows (fused into the einsum's consumer,
    effectively free), and validity uses the index's contiguous-slot
    watermark — when the caller reports no tombstones (``valid is
    None``), a slot is live iff ``slot < live_hi``, a pure comparison.
    Tombstoned corpora (deletes since the last compaction) fall back to
    the gather. Measured: 4.54 -> 3.71 ms/batch at 1M x 384 b=256
    pool-200, bit-identical ids.
    """
    i_sel = jnp.sort(i_sel, axis=1)
    dup = jnp.concatenate(
        [
            jnp.zeros((i_sel.shape[0], 1), bool),
            i_sel[:, 1:] == i_sel[:, :-1],
        ],
        axis=1,
    )
    rows = values_exact[i_sel].astype(jnp.float32)  # [B, k_sel, D]
    if row_scales is not None:
        # int8 storage rung: candidates dequantize to the same rows the
        # brute int8 path ranks with; the index's host f64 rescore
        # restores exactness for the returned k afterwards
        rows = rows * row_scales[i_sel][..., None]
    queries = queries.astype(jnp.float32)
    dot = jnp.einsum(
        "bkd,bd->bk", rows, queries,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric is SimilarityMetric.DOT_PRODUCT:
        exact = dot
    elif metric is SimilarityMetric.COSINE:
        rowsq = jnp.sum(rows * rows, axis=-1)
        qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
        denom = jnp.sqrt(qsq) * jnp.sqrt(rowsq)
        exact = jnp.where(denom > 0.0, dot / jnp.maximum(denom, 1e-30), 0.0)
    elif metric is SimilarityMetric.EUCLIDEAN:
        rowsq = jnp.sum(rows * rows, axis=-1)
        qsq = jnp.sum(queries * queries, axis=-1, keepdims=True)
        d_sq = jnp.maximum(qsq + rowsq - 2.0 * dot, 0.0)
        exact = 1.0 / (1.0 + jnp.sqrt(d_sq))
    else:
        raise NotImplementedError("manhattan uses pallas_l1 / the XLA path")
    if valid is None:
        ok = i_sel < live_hi
    else:
        ok = valid[i_sel]
    exact = jnp.where(ok & ~dup, exact, NEG_INF)
    s_top, pos = jax.lax.top_k(exact, k)
    return s_top, jnp.take_along_axis(i_sel, pos, axis=1)


#: rows pulled in on each side of an augmented candidate (default)
_AUGMENT_RADIUS = 4


def k_sel_floor() -> int:
    """K_SEL_MIN with the VECTORLITE_AMK_KSEL env override.

    64 is the measured turbo rung: 1.509 ms = 170K QPS at recall
    0.9994 (6/10240) on the 1M int8 frontier — the ApproxTopK
    aggregation stage is superlinear in k_sel (round-4 roofline), so
    halving the pool nearly halves the whole dispatch. The 128 default
    keeps the 0.9998 floor."""
    from ..utils import env_number

    return int(env_number("VECTORLITE_AMK_KSEL", K_SEL_MIN))


def augment_default() -> int:
    """Default augmentation width (VECTORLITE_AMK_AUGMENT override).

    0 since round 5: the adversarial probe augmentation was built for
    (1M rows, 20% in runs of 16 near-duplicates, queries aimed at run
    prototypes — bench/probe_headline_r5b.py) measured aug=8 recovering
    NOTHING: 45/10240 misses with augmentation vs 39-45 without, and
    the misses reproduce identically on the conservative bf16+aug8
    config, i.e. they are near-tie score artifacts among ~equal-score
    duplicates, not shard-quota selection losses. Meanwhile aug=8 costs
    ~10% latency on the iid frontier (3.163 vs 3.061 ms at k_sel=128).
    The knob stays for corpora whose ingestion locality differs."""
    from ..utils import env_number

    return int(env_number("VECTORLITE_AMK_AUGMENT", 0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "k_sel", "recall_target", "augment", "tombstones",
        "augment_radius",
    ),
)
def amk_search_topk_rescored(
    values_scan: jax.Array,  # [N, D] bf16/int8 scan copy (or the f32 rows)
    values_exact: jax.Array,  # [N, D] f32 exact rows (may alias scan)
    sqnorms: jax.Array,  # [N] f32 exact squared norms
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    k_sel: int = K_SEL_MIN,
    recall_target: float = RECALL_TARGET,
    augment: int = 0,
    augment_radius: int = _AUGMENT_RADIUS,
    scan_scales: jax.Array | None = None,
    tombstones: bool = True,
    live_hi: jax.Array | None = None,
):
    """Speed-mode scan: fused matmul + ApproxTopK candidate selection
    over ``values_scan``, exact-f32 re-score from ``values_exact``, one
    dispatch. Returns (scores [B, k], rows [B, k]) with exact-f32 scores
    and lowest-row tie-breaks. ``augment`` widens the rescore pool with
    the row neighborhoods of that many top candidates (see inline note;
    0 disables). An int8 ``values_scan`` requires ``scan_scales`` (the
    per-row quantization scales) and runs the s8 x s8 MXU contraction.

    ``tombstones=False`` asserts slots form a contiguous live prefix
    ``[0, live_hi)`` (a Flat index with no deletes since its last
    compaction): the rescore stage then skips the per-candidate validity
    gather (see _exact_rescore_device). ``live_hi`` is a dynamic scalar
    so inserts don't recompile."""
    n = values_scan.shape[0]
    k_sel = min(k_sel, n)
    if values_scan.dtype == jnp.int8:
        dot = _int8_scan_dot(queries, values_scan, scan_scales)
    else:
        dot = _matmul(queries, values_scan)
    rank = jnp.where(
        valid[None, :], _rank_scores(dot, metric, sqnorms), NEG_INF
    )
    _, i_sel = jax.lax.approx_max_k(
        rank, k_sel, recall_target=recall_target
    )
    if augment > 0:
        # Locality augmentation: the PartialReduce keeps ONE winner per
        # reduction shard, so a run of consecutively-inserted
        # near-duplicates (adjacent rows -> usually one shard) would
        # surface only its best member no matter how wide k_sel is.
        # Insertion locality correlates with similarity (batch
        # ingestion), so pull each top-ranked candidate's row
        # neighborhood into the exact-rescore pool; the rescore dedupes
        # and re-ranks exactly.
        top = i_sel[:, :augment]  # rank-ordered (pre row-sort)
        offs = jnp.arange(-augment_radius, augment_radius + 1)
        aug = jnp.clip(
            top[:, :, None] + offs[None, None, :], 0, n - 1
        ).reshape(top.shape[0], -1)
        i_sel = jnp.concatenate([i_sel, aug], axis=1)
    if not tombstones:
        if live_hi is None:
            live_hi = jnp.sum(valid.astype(jnp.int32))
        return _exact_rescore_device(
            i_sel, values_exact, None, queries, metric, k, live_hi
        )
    return _exact_rescore_device(
        i_sel, values_exact, valid, queries, metric, k, 0
    )


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "recall_target")
)
def amk_select_int8(
    values_q: jax.Array,  # [N, D] int8
    scales: jax.Array,  # [N] f32 per-row scales
    sqnorms: jax.Array,  # [N] f32 exact squared norms
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    recall_target: float = RECALL_TARGET,
):
    """int8-storage candidate selection: the s8->f32 convert fuses into
    the matmul operand stream, so HBM reads stay 1 byte/element; the
    per-row scale folds into the rank surrogate after the contraction.
    Callers re-score exactly on the host (as with every int8 path)."""
    n = values_q.shape[0]
    dot = _matmul(queries.astype(jnp.float32), values_q.astype(jnp.float32))
    dot = dot * scales[None, :]
    rank = jnp.where(
        valid[None, :], _rank_scores(dot, metric, sqnorms), NEG_INF
    )
    s, i = jax.lax.approx_max_k(
        rank, min(k, n), recall_target=recall_target
    )
    order = jnp.argsort(i, axis=1)
    return (
        jnp.take_along_axis(s, order, axis=1),
        jnp.take_along_axis(i, order, axis=1),
    )
