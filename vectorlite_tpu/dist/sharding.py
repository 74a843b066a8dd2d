"""Multi-chip scale-out: corpus-sharded exact search over a device mesh.

The reference is single-process with no distributed backend — its only
concurrency is RwLock + rayon threads (reference: src/client.rs:243-247,
src/embeddings.rs:269-276). The TPU-native analogue of "scale the big
dimension" is sharding the ``[N, D]`` corpus matrix across devices with
``jax.sharding`` and running the distance + top-k kernel per shard with a
collective merge over ICI:

  per-device: scores over its N/n_dev rows  ->  local top-k
  all_gather(k candidates per device)       ->  [B, n_dev * k]
  final top-k on the gathered candidates    ->  exact global top-k

The merge is exact because the global top-k is a subset of the per-shard
top-ks. Collectives ride ICI via shard_map over a 1-D "shard" mesh axis.

Serving integration: ``FlatIndex(mesh=...)`` (index/flat.py) places its
device cache through :func:`shard_corpus` / :func:`update_rows_sharded`
and searches through :func:`sharded_search_topk`, so the full host-side
semantics (ids, tombstones, compaction, ``.vlc`` serde) are shared with
the single-chip path.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.metrics import SimilarityMetric
from ..kernels.topk import NEG_INF, search_topk, search_topk_int8

SHARD_AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    """1-D corpus-sharding mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def row_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Row-sharded placement for a rank-``ndim`` corpus-aligned array."""
    return NamedSharding(mesh, P(SHARD_AXIS, *([None] * (ndim - 1))))


def shard_corpus(mesh: Mesh, values, sqnorms, valid):
    """Place corpus arrays row-sharded across the mesh; queries replicate."""
    return (
        jax.device_put(values, row_sharding(mesh, 2)),
        jax.device_put(sqnorms, row_sharding(mesh, 1)),
        jax.device_put(valid, row_sharding(mesh, 1)),
    )


def _merge_local_topk(s, i, rows_per_shard, k):
    """Tag local winners with global row ids, all-gather, reduce to top-k.

    Tie-break parity with the single-device kernel: the gather is
    shard-major and ``lax.top_k`` breaks ties toward the lower position,
    so equal scores resolve toward the lower global row index.
    """
    shard_id = jax.lax.axis_index(SHARD_AXIS)
    gi = i + shard_id * rows_per_shard
    s_all = jax.lax.all_gather(s, SHARD_AXIS, axis=1, tiled=True)
    gi_all = jax.lax.all_gather(gi, SHARD_AXIS, axis=1, tiled=True)
    k_merge = min(k, s_all.shape[1])
    s_top, pos = jax.lax.top_k(s_all, k_merge)
    gi_top = jnp.take_along_axis(gi_all, pos, axis=1)
    return s_top, gi_top


@partial(jax.jit, static_argnames=("metric", "k", "mesh"))
def sharded_search_topk(
    values: jax.Array,  # [cap, D], row-sharded over mesh
    sqnorms: jax.Array,  # [cap], row-sharded
    valid: jax.Array,  # [cap] bool, row-sharded
    queries: jax.Array,  # [B, D], replicated
    *,
    metric: SimilarityMetric,
    k: int,
    mesh: Mesh,
):
    """Exact distributed top-k: per-shard scan + all-gather merge.

    Returns (scores [B, k], global_row_indices [B, k]), replicated.
    """

    def local_shard(v, sq, va, q):
        rows_per_shard = v.shape[0]
        s, i = search_topk(
            v, sq, va, q, metric=metric, k=min(k, rows_per_shard)
        )
        return _merge_local_topk(s, i, rows_per_shard, k)

    return jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(values, sqnorms, valid, queries)


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "k_sel", "recall_target", "mesh", "tombstones"
    ),
)
def sharded_search_amk(
    values_scan: jax.Array,  # [cap, D] bf16 scan copy (or f32 rows), sharded
    values_exact: jax.Array,  # [cap, D] f32 exact rows (may alias), sharded
    sqnorms: jax.Array,  # [cap] f32, row-sharded
    valid: jax.Array,  # [cap] bool, row-sharded
    queries: jax.Array,  # [B, D] f32, replicated
    *,
    metric: SimilarityMetric,
    k: int,
    k_sel: int,
    recall_target: float,
    mesh: Mesh,
    tombstones: bool = True,
    live_hi: jax.Array | None = None,
):
    """Mesh speed mode: the flagship single-chip engine — fused matmul +
    ApproxTopK candidate selection + exact-f32 device re-score
    (kernels/amk.py) — run per shard under shard_map, merged by
    all-gather. Per-shard winners carry EXACT f32 scores, so the
    cross-shard ``top_k`` merge is order-exact over the candidate pools;
    approximation lives only in each shard's candidate selection, the
    same contract as single-chip. ApproxTopK lowers to a per-device
    PartialReduce (a local op), so no cross-shard communication happens
    until the k-winner gather.

    ``tombstones=False`` + ``live_hi`` (a replicated scalar: the global
    contiguous live watermark) lets each shard's rescore stage skip the
    per-candidate validity gather: rows are block-sharded, so shard ``i``
    holds global rows ``[i*rows_per_shard, ...)`` and its local
    watermark is ``clip(live_hi - i*rows_per_shard, 0, rows_per_shard)``
    (see amk._exact_rescore_device)."""
    from ..kernels.amk import amk_search_topk_rescored

    if live_hi is None:
        tombstones = True

    def local_shard(vs, ve, sq, va, q, lh):
        rows_per_shard = vs.shape[0]
        if tombstones:
            shard_hi = None
        else:
            shard = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32)
            shard_hi = jnp.clip(
                lh.astype(jnp.int32) - shard * rows_per_shard,
                0,
                rows_per_shard,
            )
        s, i = amk_search_topk_rescored(
            vs,
            ve,
            sq,
            va,
            q,
            metric=metric,
            k=min(k, rows_per_shard),
            k_sel=min(k_sel, rows_per_shard),
            recall_target=recall_target,
            tombstones=tombstones,
            live_hi=shard_hi,
        )
        return _merge_local_topk(s, i, rows_per_shard, k)

    if live_hi is None:
        live_hi = jnp.int32(0)
    return jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None),
            P(SHARD_AXIS, None),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
            P(None, None),
            P(),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(values_scan, values_exact, sqnorms, valid, queries, live_hi)


@partial(jax.jit, static_argnames=("metric", "k", "mesh"))
def sharded_search_topk_int8(
    values_q: jax.Array,  # [cap, D] int8, row-sharded
    scales: jax.Array,  # [cap] f32 per-row scales, row-sharded
    sqnorms: jax.Array,  # [cap] f32 exact squared norms, row-sharded
    valid: jax.Array,  # [cap] bool, row-sharded
    queries: jax.Array,  # [B, D] f32, replicated
    *,
    metric: SimilarityMetric,
    k: int,
    mesh: Mesh,
):
    """Quantized-profile distributed top-k; callers re-score the winners
    exactly on the host (same contract as the single-chip int8 path)."""

    def local_shard(v, sc, sq, va, q):
        rows_per_shard = v.shape[0]
        s, i = search_topk_int8(
            v, sc, sq, va, q, metric=metric, k=min(k, rows_per_shard)
        )
        return _merge_local_topk(s, i, rows_per_shard, k)

    return jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
            P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(values_q, scales, sqnorms, valid, queries)


@partial(
    jax.jit,
    static_argnames=("metric", "k", "chunk", "mesh", "packed", "pallas"),
)
def sharded_search_pq(
    codes: jax.Array,  # [cap, M] uint8, row-sharded over mesh
    codebooks: jax.Array,  # [M, kc, dsub] f32, replicated
    sqnorms: jax.Array,  # [cap] f32 exact squared norms, row-sharded
    valid: jax.Array,  # [cap] bool, row-sharded
    queries: jax.Array,  # [B, D] f32, replicated (pre-rotated by caller)
    *,
    metric: SimilarityMetric,
    k: int,
    chunk: int,
    mesh: Mesh,
    packed: bool = False,
    pallas: bool = False,
):
    """PQ-profile distributed top-k: the streaming ADC scan
    (kernels/pq.py) runs per shard — each device holds only its slice
    of the uint8 code matrix (~N·M/n_dev bytes: 100M x 384 at M=96 is
    ~1.2 GB/chip on 8 chips) plus a replicated codebook — merged by the
    same all-gather the other profiles use. ADC scores are shard-
    independent (the LUT depends only on query + codebooks), so the
    merge ranks candidates exactly as a single-chip scan would; callers
    re-score winners exactly on the host as usual."""
    from ..kernels.pq import pq_search_topk

    def local_shard(c, cb, sq, va, q):
        rows_per_shard = c.shape[0]
        s, i = pq_search_topk(
            c,
            cb,
            sq,
            va,
            q,
            metric=metric,
            k=min(k, rows_per_shard),
            chunk=min(chunk, rows_per_shard),
            packed=packed,
            pallas=pallas,
        )
        return _merge_local_topk(s, i, rows_per_shard, k)

    return jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None),
            P(None, None, None),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
            P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(codes, codebooks, sqnorms, valid, queries)


@partial(jax.jit, static_argnames=("mesh",), donate_argnums=(0,))
def update_rows_sharded(
    buffer: jax.Array,  # [cap, ...] row-sharded over mesh, donated
    rows: jax.Array,  # [m, ...] replicated update block
    start: jax.Array,  # scalar int32: global row offset of the block
    *,
    mesh: Mesh,
):
    """Write ``rows`` into ``buffer[start:start+m]`` without re-placing the
    corpus: each shard scatters the slice of the (replicated) update block
    that lands inside its local row range and drops the rest. The donated
    buffer keeps its sharding, so an insert burst costs one small
    host->device transfer + a local scatter per shard — no collectives."""

    def body(buf, rows, start):
        local_n = buf.shape[0]
        shard_id = jax.lax.axis_index(SHARD_AXIS)
        pos = start + jnp.arange(rows.shape[0]) - shard_id * local_n
        in_range = (pos >= 0) & (pos < local_n)
        # out-of-range updates are routed to index local_n and dropped
        pos = jnp.where(in_range, pos, local_n)
        return buf.at[pos].set(
            rows.astype(buf.dtype), mode="drop", unique_indices=True
        )

    buf_spec = P(SHARD_AXIS, *([None] * (buffer.ndim - 1)))
    rows_spec = P(*([None] * rows.ndim))
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(buf_spec, rows_spec, P()),
        out_specs=buf_spec,
        check_vma=False,
    )(buffer, rows, jnp.asarray(start, jnp.int32))


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "k_sel", "nprobe_per_shard", "p_width", "mesh",
        "tombstones",
    ),
)
def sharded_search_ivf(
    part_rows: jax.Array,  # [C * P, D] bf16, sharded by partition blocks
    part_slots: jax.Array,  # [C * P] int32 global slots (-1 pad), sharded
    part_sqnorms: jax.Array,  # [C * P] f32, sharded
    part_valid: jax.Array,  # [C * P] bool, sharded
    centroids: jax.Array,  # [C, D] f32, row-sharded (C % n_dev == 0)
    cent_sqnorms: jax.Array,  # [C] f32, row-sharded
    values_exact: jax.Array,  # [cap, D] rung rows, ROW-sharded (slot order)
    valid: jax.Array,  # [cap] bool, row-sharded
    queries: jax.Array,  # [B, D] f32, replicated
    size: jax.Array,  # scalar int32: live watermark (replicated)
    *,
    metric: SimilarityMetric,
    k: int,
    k_sel: int,
    nprobe_per_shard: int,
    p_width: int,
    mesh: Mesh,
    tombstones: bool = False,
):
    """IVF probe under the mesh (VERDICT r4 item 5's multi-chip scale
    story): the partition-contiguous layout and its coarse centroids
    shard by PARTITION blocks — each chip owns C/n_dev whole partitions,
    so a probe stays one local [P, D] block read, never a cross-chip
    gather. Per shard: rank the LOCAL centroids, probe the top
    ``nprobe_per_shard`` local partitions (global probe width =
    n_dev * nprobe_per_shard — the union of per-shard windows replaces
    the single-chip global top-L, the same quota-per-region trade the
    other sharded engines make), score the probed blocks, keep a local
    surrogate-ranked candidate pool. Pools all-gather (tiny: [B, pool]
    ids + scores), reduce to the global pool, and ONE exact-f32 rescore
    runs on the slot-ordered rung rows — a [B, pool] cross-shard gather
    XLA serves with collectives at negligible width, restoring exact
    scores and lowest-slot tie-breaks (kernels/amk._exact_rescore_device,
    the same contract every engine here honors).

    The insert tail and overflow extras are the caller's to merge (the
    single-chip layout keeps them host-side; at mesh scale they ride the
    existing sharded brute engines over the same rung buffers)."""
    from ..kernels.amk import _exact_rescore_device
    from ..kernels.ivf import _rank_scores_rows, gather_score_xla
    from ..kernels.amk import _matmul, _rank_scores

    n_dev = int(mesh.devices.size)

    def local_shard(pr, ps, psq, pok, cents, csq, q):
        c_local = cents.shape[0]
        nb = min(nprobe_per_shard, c_local)
        qf = q.astype(jnp.float32)
        cdot = _matmul(qf, cents)
        crank = _rank_scores(cdot, metric, csq)
        _, probe_ids = jax.lax.top_k(crank, nb)  # local partition ids
        probe_ids = probe_ids.astype(jnp.int32)
        # local probe: XLA gather formulation — under shard_map the
        # Pallas scalar-prefetch kernel is per-device anyway, and the
        # dryrun must also run on CPU meshes; the FlatIndex single-chip
        # path keeps the Pallas kernel
        dot = gather_score_xla(pr, probe_ids, qf, p_width=p_width)
        b = qf.shape[0]
        w = nb * p_width
        dot = dot.reshape(b, w)
        c_rows = pr.shape[0] // p_width
        gsq = jnp.take(
            psq.reshape(c_rows, p_width), probe_ids, axis=0
        ).reshape(b, w)
        gok = jnp.take(
            pok.reshape(c_rows, p_width), probe_ids, axis=0
        ).reshape(b, w)
        gslots = jnp.take(
            ps.reshape(c_rows, p_width), probe_ids, axis=0
        ).reshape(b, w)
        rank = jnp.where(gok, _rank_scores_rows(dot, metric, gsq), NEG_INF)
        k_local = min(k_sel, w)
        s_loc, sel = jax.lax.top_k(rank, k_local)
        slots_loc = jnp.take_along_axis(gslots, sel, axis=1)
        # all-gather the tiny pools; slots are already GLOBAL (the
        # layout stores original slot numbers), so no shard offset
        s_all = jax.lax.all_gather(s_loc, SHARD_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(
            slots_loc, SHARD_AXIS, axis=1, tiled=True
        )
        k_pool = min(k_sel, s_all.shape[1])
        _, pos = jax.lax.top_k(s_all, k_pool)
        return jnp.take_along_axis(i_all, pos, axis=1)

    pool = jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
            P(SHARD_AXIS, None),
            P(SHARD_AXIS),
            P(None, None),
        ),
        out_specs=P(None, None),
        check_vma=False,
    )(
        part_rows, part_slots, part_sqnorms, part_valid,
        centroids, cent_sqnorms, queries,
    )
    pool = jnp.maximum(pool, 0).astype(jnp.int32)
    return _exact_rescore_device(
        pool,
        values_exact,
        valid if tombstones else None,
        queries.astype(jnp.float32),
        metric,
        k,
        size,
    )
