"""Exact (flat) index — HBM-resident matrix scan with fused top-k.

TPU-native redesign of the reference FlatIndex (reference: src/index/flat.rs).
The reference stores ``Vec<Vector>`` and linearly scans + sorts per query
(reference: src/index/flat.rs:98-119). Here:

* **Host staging** — float64 numpy ``[cap, D]`` is the source of truth
  (exact storage/round-trip parity with the reference's f64 values), with
  id / validity / text / metadata side tables.
* **Device cache** — a float32 (configurable) ``[cap, D]`` HBM matrix plus a
  cached squared-norm vector and validity mask, synchronized lazily with a
  dirty-row watermark so inserts are O(D) host writes and the first search
  after a burst pays one contiguous row upload (no per-insert device traffic).
* **Search** — batched queries go through one jitted
  score-matmul + ``lax.top_k`` program (kernels/topk.py). Capacity, batch and
  k are bucketed to powers of two so XLA compiles a handful of programs total.
  Score/selection contract: returned scores are exact-f32 evaluations of the
  scalar reference formulas (f64 on the host-scan and rescore paths; the
  reference itself is f64). Default selection at Pallas scale is block-top-W
  (see ``_BLOCK_WINNERS``): a true neighbor is missed only when more than W
  of the top-k share one 128-row block (P ~ 2e-5 at 1M, k=10) — pass
  ``approx=False`` for guaranteed-exhaustive selection.
* **Delete** — validity-mask clear (the reference's ``retain``
  semantics: deleting an absent id succeeds, reference: src/index/flat.rs:93-96).
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.metrics import SimilarityMetric
from ..core.types import SearchResult, Vector
from ..errors import DimensionMismatch, DuplicateVectorId, VectorNotFound
from ..kernels.topk import next_pow2, row_sqnorms, search_topk, update_rows
from .base import validate_batch_arrays

logger = logging.getLogger("vectorlite_tpu.flat")

_MIN_CAPACITY = 256

#: rows per PQ encode dispatch — bounds the per-bucket [rows, 256]
#: assignment temp (~134 MB f32) and keeps the jit cache small.
_PQ_ENCODE_BUCKET = 1 << 17


def _pq_scan_chunk(bits: int = 4) -> int:
    """Corpus rows per PQ selection scan step. Wider chunks amortize
    per-step overhead (operand staging, amk dispatch) AND shrink the
    merged surrogate pool (n_chunks * k_chunk wide) that the global
    trim sorts — at 8M a 64K chunk makes a 128-step scan whose merged
    pool dwarfs the final pool 100x. The [B, chunk] f32 rank buffer is
    the only footprint that grows (256 MB at 256 x 256K) — scratch, not
    resident. The wide default is only measured on the 4-bit profile;
    the opt-in 8-bit path (kc=256) keeps the old 64K chunk — its
    per-chunk one-hot operand is 8x wider ([chunk, m*kc] bf16), and a
    256K chunk would gamble ~12 GB of HLO temp on XLA fusing the
    compare-cast into the matmul operand stream (ADVICE r4).
    VECTORLITE_PQ_CHUNK overrides either."""
    from ..utils import env_number

    default = (1 << 18) if bits == 4 else (1 << 16)
    return max(1024, int(env_number("VECTORLITE_PQ_CHUNK", default)))
_MAX_K_BUCKET = 1024  # openapi k bound (reference: docs/openapi.yaml:624-630)

#: Above this capacity the fused Pallas tiled scan takes over from the
#: full-score-matrix XLA path (which needs a [B, cap] f32 intermediate).
_PALLAS_MIN_CAPACITY = 1 << 17

#: Measured-best tiles at 1M x 384 (v5e): the exact kernel peaks at 2048
#: for f32 and 4096 for bf16; the block-top1 kernel at 4096.
_PALLAS_TILE_F32 = 2048
_PALLAS_TILE_BF16 = 4096
_PALLAS_TILE_BLOCK = 4096

#: Winners kept per 128-lane block by the approx kernel. W=2 drops the
#: block-collision miss probability from ~0.6% to ~2e-5 at 1M/k=10 for a
#: ~8% kernel cost (the matmul dominates) — see kernels/pallas_scan.py.
#: Measured at 1M x 384 cosine, batch 256 (v5e): f32 exact 14.1 ms, f32
#: block-W1 9.0 ms, f32 block-W2 9.7 ms. f32 block selection returns the
#: same exact-f32 scores as the exact kernel, so it needs NO re-scoring.
_BLOCK_WINNERS = 2

#: "auto" dtype is a capacity ladder: f32 until the corpus would not fit
#: comfortably in one chip's HBM, then bf16 (2x rows), then int8 (4x
#: rows) — each reduced rung adds 2x candidate oversampling + exact f64
#: host re-scoring (recall@10 measured 1.0 at 1M for both). f32 +
#: block-W2 measured FASTER than bf16 anything once re-scoring is priced
#: in, so reduced precision buys capacity, never speed, here. Tunable:
#: VECTORLITE_AUTO_BF16_GB.
_AUTO_BF16_BYTES = 6 << 30

#: Speed mode: while the budget allows 6 bytes/element (f32 corpus + a
#: bf16 scan copy), candidate selection scans the bf16 copy (half the
#: HBM reads, 1-pass MXU matmul) and the winners are exactly re-scored
#: on device from the co-resident f32 rows — one dispatch, exact-f32
#: scores, indices measured identical to the exhaustive kernel at 1M
#: (6.45 ms vs 9.4 ms, ~40K QPS, recall 1.0; BASELINE.md).
_SCAN_COPY_BYTES_PER_ELEM = 6

#: Single/tiny-batch queries over small corpora skip the device entirely:
#: the exact host scan measured 0.17 ms (1K rows) / 0.94 ms (10K) /
#: 2.5 ms (32K) p50 per query on one core (with the f32 prefilter below),
#: vs ~25-30 ms per TPU relay RPC. This delivers the reference's
#: sub-millisecond single-query latency at its intended Flat scale
#: (<10K rows, reference: src/index/flat.rs:15) while batched/large
#: searches keep the device path. Tunables:
#: VECTORLITE_HOST_SCAN_ROWS (0 disables), batch cutoff fixed at 4.
_HOST_SCAN_ROWS = 32768
_HOST_SCAN_MAX_BATCH = 4

#: Host-scan prefilter: above this row count the host path selects
#: candidates on a cached f32 copy (half the memory traffic of the f64
#: matmul — the scan is memory-bound on one core) with a provably-safe
#: error margin, then re-scores only the candidate pool in exact f64.
#: Returned scores and slot/tie semantics are identical to the full f64
#: scan: any true top-k row is within the margin by construction (see
#: _host_scan_prefiltered), so this is a latency optimization, not an
#: approximation. Measured: 10K-row single-query p50 2.3 ms -> sub-ms.
#: Tunable: VECTORLITE_HOST_PREFILTER=0 disables.
_HOST_PREFILTER_ROWS = 4096

#: f32 selection-error margins (2x a conservative worst-case bound for
#: 384-d naive f32 accumulation, ~386 ulp; BLAS does better). A wider
#: margin only inflates the exactly-rescored candidate pool — it can
#: never lose a true top-k hit — so these are deliberately generous.
_PREFILTER_EPS_DOT = 2e-4  # x qn x vn_max
_PREFILTER_EPS_COS = 4e-4  # absolute (scores in [-1, 1])
_PREFILTER_EPS_L2 = 4e-4  # x (qn + vn_max)^2, on the d^2 scale
_PREFILTER_EPS_L1 = 4e-4  # x sqrt(D) x (qn + vn_max), via L1<=sqrt(D)L2


def _topk_tie_safe(
    scores: np.ndarray, k_eff: int
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k per row without a full O(N log N) argsort: an O(N)
    argpartition bounds the k-th value, then only the (>= kth) candidate
    set — gathered in ascending-slot order — is stably sorted, so equal
    scores still break to the LOWEST slot exactly like the previous full
    stable argsort (and the device kernels). NaN scores rank below
    everything (the full argsort placed them last too) but keep their
    stored value in the output."""
    b, n = scores.shape
    k_eff = max(0, int(k_eff))
    out_s = np.empty((b, k_eff), scores.dtype)
    out_i = np.empty((b, k_eff), np.int64)
    if k_eff == 0:
        return out_s, out_i
    for b_i in range(b):
        srow = scores[b_i]
        nan_mask = np.isnan(srow)
        key = np.where(nan_mask, -np.inf, srow) if nan_mask.any() else srow
        if k_eff >= n:
            cand = np.arange(n)
        else:
            kth = np.partition(key, n - k_eff)[n - k_eff]
            cand = np.flatnonzero(key >= kth)
        order = np.argsort(-key[cand], kind="stable")[:k_eff]
        sel = cand[order]
        out_s[b_i] = srow[sel]
        out_i[b_i] = sel
    return out_s, out_i


#: bf16 has an 8-bit significand: one ulp of relative error per operand.
_BF16_EPS = 2.0 ** -8

#: auto-guard trigger: estimated rank displacement from bf16 selection
#: error beyond which reduced-precision candidate selection is refused
#: (the amk candidate pool recovers displacements up to ~K_SEL_MIN/2;
#: 32 leaves a 2x margin under the default pool of 128)
_GUARD_DISPLACEMENT = 32.0


def _bf16_selection_risky(
    vals32: np.ndarray,
    valid: np.ndarray,
    size: int,
    competitor_rows: Optional[int] = None,
) -> bool:
    """Estimate whether bf16-precision candidate selection could displace
    true top-k members beyond the oversampled candidate pool
    (VERDICT round-2 item 9: an auto-guard instead of the
    VECTORLITE_SPEED_MODE=0 escape hatch).

    Mechanism: device selection ranks on bf16-rounded dot products, so
    score perturbations are ~_BF16_EPS * |q||v|. On realistic corpora
    the per-rank score gap near the top dwarfs that (measured recall 1.0
    at 1M across clustered/iid/10x-norm sweeps, BASELINE.md round 2);
    the pathological regime is gap << perturbation — huge-norm vectors
    with tiny absolute differences (euclidean cancellation) or
    ultra-tight angular clusters (cosine). A sampled nearest-neighbor
    gap statistic estimates the expected displacement
    ``perturbation / per-rank gap`` for both the raw geometry
    (euclidean/dot risk) and the normalized geometry (cosine risk); if
    either exceeds _GUARD_DISPLACEMENT the index refuses reduced-
    precision selection and serves the exact exhaustive kernel instead.

    O(sample^2 * D) on the host, run only on wholesale device rebuilds
    (capacity growth), never per query.
    """
    live = np.flatnonzero(valid[:size])
    if live.size < 256:
        return False
    rng = np.random.default_rng(0xC0FFEE)
    take = rng.choice(live.size, min(1024, live.size), replace=False)
    rows = vals32[live[take]].astype(np.float64)

    def displacement(r: np.ndarray) -> float:
        probes = r[:64]
        sq_p = np.einsum("pd,pd->p", probes, probes)
        sq_r = np.einsum("nd,nd->n", r, r)
        d2 = sq_p[:, None] + sq_r[None, :] - 2.0 * (probes @ r.T)
        np.maximum(d2, 0.0, out=d2)
        d2[np.arange(len(probes)), np.arange(len(probes))] = np.inf
        near = np.sort(d2, axis=1)[:, :16]
        # typical per-rank gap at the head of each probe's ranking
        gap = np.median(np.maximum(near[:, -1] - near[:, 0], 0.0) / 15.0)
        scale = float(
            np.median(np.sqrt(sq_p)) * np.median(np.sqrt(sq_r))
        )
        if gap <= 0.0:
            # exact duplicates dominate the sample: ties are handled by
            # slot order, not precision — not the pathological regime
            return 0.0
        return _BF16_EPS * max(scale, 1e-300) / gap

    # per-rank gaps shrink ~linearly with corpus density: the sampled
    # statistic sees a len(take)-point subsample, the serving scan sees
    # all live rows — correct the displacement estimate accordingly.
    # ``competitor_rows`` overrides the competing population for scans
    # that rank within a bounded window (the IVF probed partitions):
    # displacement risk scales with how many near-tied competitors the
    # selection actually sees, not with corpus size
    density = (
        competitor_rows if competitor_rows is not None else live.size
    ) / len(take)
    raw = displacement(rows)
    norms = np.linalg.norm(rows, axis=1, keepdims=True)
    normed = rows / np.maximum(norms, 1e-300)
    cosine = displacement(normed)
    return max(raw, cosine) * density > _GUARD_DISPLACEMENT


def _quantize_rows_int8_np(rows32: np.ndarray):
    """Host-side mirror of core.metrics.quantize_rows_int8 (same rounding:
    np.round and jnp.round are both half-to-even). Used by the mesh path so
    corpora larger than one chip's HBM never stage on a single device."""
    max_abs = np.max(np.abs(rows32), axis=-1)
    scale = np.where(max_abs > 0.0, max_abs / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(rows32 / scale[:, None]), -127, 127)
    return q.astype(np.int8), scale


def _pq_bits() -> int:
    """PQ code width: 4 (default — kc=16/dsub=2 nibble-packed codes,
    the MXU-friendly ScaNN-style config; same bytes/row as 8-bit at
    dim/4 subspaces with better pool recall at the 256 floor) or 8
    (classic byte codes, kc=256/dsub=4). VECTORLITE_PQ_BITS overrides;
    read at wholesale build time only."""
    from ..utils import env_number

    bits = int(env_number("VECTORLITE_PQ_BITS", 4))
    return bits if bits in (4, 8) else 4


def _hbm_budget_bytes() -> int:
    """The auto-profile HBM budget (VECTORLITE_AUTO_BF16_GB override),
    shared by the dtype ladder and the scan-copy decision so the two can
    never disagree."""
    from ..utils import env_number

    return int(
        env_number(
            "VECTORLITE_AUTO_BF16_GB",
            _AUTO_BF16_BYTES / (1 << 30),
            cast=float,
        )
        * (1 << 30)
    )


def _use_pallas(capacity: int, metric: SimilarityMetric) -> bool:
    if capacity < _PALLAS_MIN_CAPACITY:
        return False
    return jax.default_backend() == "tpu"


def _rows_as_matrix(
    vals: list, dim: int
) -> Optional[np.ndarray]:
    """Reshape per-row f64 arrays back into one [N, dim] matrix when
    they are consecutive views of a single base buffer — the native
    .vlc parser (persist/vlc.py) extracts document arrays into one
    contiguous f64 buffer in document order, so a Flat snapshot's rows
    are almost always adjacent. Avoids an np.stack copy, which on this
    box costs ~11 ms/MB in first-touch page faults (3 GB at 1Mx384).
    Returns None when rows aren't one contiguous run (e.g. a numeric
    metadata array interleaved between rows)."""
    first = vals[0]
    base = first.base
    if (
        base is None
        or first.dtype != np.float64
        or base.dtype != np.float64
        or base.ndim != 1
    ):
        return None
    addr = first.__array_interface__["data"][0]
    expect = addr
    for v in vals:
        if v.base is not base or v.__array_interface__["data"][0] != expect:
            return None
        expect += dim * 8
    start = (addr - base.__array_interface__["data"][0]) // 8
    return base[start : start + len(vals) * dim].reshape(len(vals), dim)


def _amk_enabled() -> bool:
    """ApproxTopK selection (kernels/amk.py) — VECTORLITE_AMK=0 reverts
    to the round-2 Pallas block kernels (escape hatch, not a tuned
    path)."""
    from ..utils import env_number

    return env_number("VECTORLITE_AMK", 1) == 1


class FlatRowsView:
    """Lazy, list-compatible snapshot of the Flat ``data`` payload.

    Holds the small per-row tables (ids, live slots, text/metadata list
    copies) plus a REFERENCE to the f64 truth matrix; row dicts
    materialize on access, one at a time, with ``values`` as a row VIEW
    into the matrix. Snapshot saves and the HTTP snapshot stream render
    through this without ever holding a second copy of the corpus —
    essential in the disk-backed truth mode. Immutability contract: see
    FlatIndex.index_to_json (the captured matrix generation is never
    written below the captured size)."""

    __slots__ = ("ids", "slots", "values", "texts", "metas")

    def __init__(self, ids, slots, values, texts, metas):
        self.ids = ids
        self.slots = slots
        self.values = values
        self.texts = texts
        self.metas = metas

    def __len__(self) -> int:
        return len(self.ids)

    def _row(self, i: int) -> dict:
        # field order matches Vector.to_json / the reference serde
        # output (reference: src/lib.rs:163-174)
        return {
            "id": int(self.ids[i]),
            "values": self.values[self.slots[i]],
            "text": self.texts[i],
            "metadata": self.metas[i],
        }

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [
                self._row(j) for j in range(*i.indices(len(self.ids)))
            ]
        return self._row(int(i))

    def __iter__(self):
        for i in range(len(self.ids)):
            yield self._row(i)


class FlatIndex:
    """O(N)-scan search over an HBM-resident vector matrix.

    Reference semantics (exhaustive scan + stable sort,
    src/index/flat.rs:98-119) with a TPU-native serving ladder. The
    returned *scores* are always exact (f64 host math or f32 HIGHEST
    device re-scoring); *selection* of the top-k is exact on the host
    path and on ``approx=False`` device searches, and approximate-with-
    exact-rescore on the default device path at Pallas scale
    (ApproxTopK candidates + a 128-wide exactly-re-scored pool;
    measured recall@10 0.9996 at 1M — see kernels/amk.py for the
    frontier and the knobs, and ``_bf16_selection_risky`` for the
    auto-guard that reverts pathological corpora to the exact kernel).
    """

    def __init__(
        self,
        dim: int,
        data: Sequence[Vector] = (),
        *,
        device_dtype="auto",
        mesh=None,
    ):
        if dim <= 0:
            raise ValueError("FlatIndex dimension must be positive")
        self.dim = int(dim)
        # "int8" selects the quantized profile: symmetric per-row int8
        # corpus + int8-MXU scoring, with exact host re-scoring of the k
        # winners (scores returned to callers are exact f64 math).
        # "auto" (default) is the capacity ladder: f32 below the HBM
        # budget, then bf16, then int8 — see _AUTO_BF16_BYTES and
        # _prospective_dtype (measured trade-offs in BASELINE.md).
        self._auto_dtype = device_dtype == "auto"
        if self._auto_dtype:
            device_dtype = jnp.float32
        # "pq" selects the product-quantization capacity rung
        # (kernels/pq.py): uint8 codes + learned codebooks on device
        # (~dim/24 bytes per f64 row at the default M = dim/4), ADC
        # selection with a wide pool, exact f64 host re-scoring of the
        # winners. Below _pq_min_rows() the profile serves the plain
        # f32 path (nothing to train on); it engages at the first sync
        # past the gate.
        self._pq = device_dtype == "pq"
        if self._pq:
            device_dtype = jnp.float32  # fallback rung below the gate
        self._quantized = device_dtype in ("int8", jnp.int8)
        self._device_dtype = (
            jnp.int8 if self._quantized else device_dtype
        )
        # Multi-chip serving: with a jax.sharding.Mesh, the device cache is
        # row-sharded across the mesh and searches run the per-shard scan +
        # all-gather merge (dist/sharding.py). Host-side semantics (ids,
        # tombstones, compaction, serde) are identical to the single-chip
        # path. The reference has no distributed analogue (SURVEY §2).
        self._mesh = mesh

        cap = max(_MIN_CAPACITY, next_pow2(max(1, len(data))))
        if mesh is not None:
            n_dev = int(mesh.devices.size)
            cap = -(-cap // n_dev) * n_dev  # split evenly across the mesh
        self._capacity = cap
        # truth-matrix placement is pinned for the index's lifetime (a
        # growth realloc must not silently switch RAM<->disk mid-life)
        self._truth_dir = os.environ.get("VECTORLITE_HOST_TRUTH_DIR")
        self._values64 = self._alloc_values(cap)
        self._ids = np.zeros(cap, dtype=np.uint64)
        self._valid = np.zeros(cap, dtype=bool)
        self._texts: list[Optional[str]] = [None] * cap
        self._metas: list = [None] * cap
        self._size = 0  # next append slot (monotonic until compaction)
        self._count = 0  # number of live vectors
        self._id_to_slot: dict[int, int] = {}
        # lazy f64 row-norm table for the exact-rescore fast path.
        # Guarded by its own lock: concurrent searches hold only the
        # collection READ lock, and the realloc/extend here must not
        # expose a half-filled table to a sibling reader.
        self._host_norms64: Optional[np.ndarray] = None
        self._host_norms_n = 0
        # lazy f32 row copy + squared norms for the host-scan prefilter
        # (same watermark/lock discipline as the norm table)
        self._host_f32v: Optional[np.ndarray] = None
        self._host_sq32: Optional[np.ndarray] = None
        self._host_f32_n = 0
        self._host_f32_finite = True
        self._norms_lock = threading.Lock()
        # set at wholesale device rebuilds by the bf16 auto-guard
        self._precision_risky = False
        # metadata-filter mask cache (core/filter.py:FilterCache).
        # _epoch is the STRUCTURAL epoch: delete/compaction/metadata
        # updates bump it (full mask rebuild); appends only move the
        # _size watermark and extend cached masks incrementally.
        self._epoch = 0
        from ..core.filter import FilterCache

        self._where_masks = FilterCache()

        # Device cache state. The mutex makes sync + dispatch atomic:
        # update_rows donates the old buffer, so a concurrent reader must
        # never dispatch against a reference captured before a sync.
        self._dev_lock = threading.Lock()
        self._dev_values: Optional[jax.Array] = None
        self._dev_scan: Optional[jax.Array] = None  # speed-mode scan copy
        # per-row quantization scales when the scan copy is int8
        # (None while the scan copy is bf16 or absent)
        self._dev_scan_scales: Optional[jax.Array] = None
        self._dev_scales: Optional[jax.Array] = None  # int8 profile only
        self._dev_codes: Optional[jax.Array] = None  # pq profile only
        self._dev_codebooks: Optional[jax.Array] = None  # pq profile only
        self._pq_rot: Optional[jax.Array] = None  # OPQ-lite rotation
        self._pq_packed = False  # 4-bit codes, two per stored byte
        self._pq_active = False  # pq cache built and serving
        # code width of the LIVE cache (frozen at wholesale build; the
        # env knob read later must not re-shape pool floors for codes
        # that were already built — see _selection_k)
        self._pq_bits_active: Optional[int] = None
        # IVF partitioned-scan state (kernels/ivf.py): a partition-
        # contiguous bf16 copy of the corpus + slot/norm/validity
        # tables, built lazily past the size gate. Selection then reads
        # only the probed partitions instead of the whole corpus — the
        # scale rung that keeps 8M+ rows *fast* (VERDICT round 3).
        self._ivf_rows: Optional[jax.Array] = None  # [C*P, D] bf16/int8
        # per-row quantization scales when the layout is int8
        self._ivf_scales: Optional[jax.Array] = None
        self._ivf_slots: Optional[jax.Array] = None  # [C*P] int32
        self._ivf_sq: Optional[jax.Array] = None  # [C*P] f32
        self._ivf_valid: Optional[jax.Array] = None  # [C*P] bool
        self._ivf_centroids: Optional[jax.Array] = None  # [C, D] f32
        self._ivf_cent_sq: Optional[jax.Array] = None  # [C] f32
        self._ivf_extra: tuple = ()  # (rows, slots, sq, valid, scales)
        self._ivf_p = 0  # partition pad width P
        self._ivf_hi = 0  # slots below this are inside the layout
        self._ivf_active = False
        self._ivf_slots_np: Optional[np.ndarray] = None
        self._ivf_extra_slots_np: Optional[np.ndarray] = None
        self._ivf_nprobe_floor = 0  # guard-raised probe width (0 = default)
        self._ivf_refused_at = 0  # live count when the guard last refused
        self._dev_sqnorms: Optional[jax.Array] = None
        self._dev_valid: Optional[jax.Array] = None
        # cached device scalar of the live watermark (tombstone-free
        # corpora skip the rescore validity gather; the relay makes a
        # per-call device_put of even 4 bytes expensive, so it uploads
        # only when _size changes)
        self._dev_live_hi: Optional[jax.Array] = None
        self._dev_live_hi_val = -1
        self._dirty_lo = 0
        self._dirty_hi = 0
        self._mask_dirty = True

        for v in data:
            self.add(v)

    # ------------------------------------------------------------------ API

    def _alloc_values(self, cap: int) -> np.ndarray:
        """The f64 truth matrix: RAM by default; a disk-backed memmap
        when VECTORLITE_HOST_TRUTH_DIR is set. The memmap mode moves the
        8·N·D-byte truth (the binding constraint once the pq rung holds
        the HBM side — ~30 GB at 10M x 384) onto disk: rescore gathers
        and persistence stream through the page cache, so host RAM
        bounds the WORKING SET, not the corpus. The backing file is
        unlinked immediately after mapping (Linux keeps it alive until
        the mapping dies), so crashes and GC can never leak disk space
        and no cleanup bookkeeping exists."""
        directory = self._truth_dir
        if not directory:
            return np.zeros((cap, self.dim), dtype=np.float64)
        import tempfile

        os.makedirs(directory, exist_ok=True)
        fd, path = tempfile.mkstemp(suffix=".truth", dir=directory)
        try:
            # reserve real blocks up front: a sparse file would admit
            # any size and then SIGBUS the process (uncatchable) on the
            # first page write past free space — fallocate turns
            # disk-full into a catchable OSError here instead, the
            # moral equivalent of the RAM path's MemoryError. Note the
            # transient during growth: old (~cap) + new (~2 cap)
            # reservations coexist until the old mapping dies.
            try:
                os.posix_fallocate(fd, 0, cap * self.dim * 8)
            except AttributeError:  # non-POSIX: keep the sparse file
                pass
            mm = np.memmap(
                path, dtype=np.float64, mode="w+", shape=(cap, self.dim)
            )
        finally:
            os.close(fd)
            # unlink keeps the inode alive for the mapping's lifetime:
            # unleakable, but invisible to ls/du — use lsof (deleted)
            # to audit consumption
            os.unlink(path)
        return mm

    def add(self, vector: Vector) -> None:
        """O(1) append (reference add: src/index/flat.rs:82-91)."""
        if len(vector.values) != self.dim:
            raise DimensionMismatch(self.dim, len(vector.values))
        vid = int(vector.id)
        if vid in self._id_to_slot:
            raise DuplicateVectorId(vid)
        if self._size >= self._capacity:
            self._grow()
        slot = self._size
        self._values64[slot] = np.asarray(vector.values, dtype=np.float64)
        self._ids[slot] = vid
        self._valid[slot] = True
        self._texts[slot] = vector.text
        self._metas[slot] = vector.metadata
        self._id_to_slot[vid] = slot
        self._size += 1
        self._count += 1
        self._mark_dirty(slot)

    def add_batch_arrays(
        self,
        ids: Sequence[int],
        values: np.ndarray,  # [B, D]
        texts: Optional[Sequence[str]] = None,
        metadatas: Optional[Sequence] = None,
    ) -> None:
        """Array-native bulk insert: one block write into the host matrix,
        one dirty-range mark — no per-row Vector objects or Python float
        materialization. All-or-nothing: ids are validated (dimension,
        duplicates within the batch and against the index) before any
        mutation. This is the high-throughput ingestion path fed directly
        by EmbeddingFunction.embed_batch_arrays."""
        int_ids, values = validate_batch_arrays(
            ids, values, self.dim, self._id_to_slot.keys(),
            texts=texts, metadatas=metadatas,
        )
        n = len(int_ids)
        if n == 0:
            return
        if self._size + n > self._capacity:
            self._grow(min_capacity=self._size + n)
        lo = self._size
        self._values64[lo : lo + n] = values
        self._ids[lo : lo + n] = int_ids
        self._valid[lo : lo + n] = True
        self._texts[lo : lo + n] = (
            list(texts) if texts is not None else [""] * n
        )
        self._metas[lo : lo + n] = (
            list(metadatas) if metadatas is not None else [None] * n
        )
        self._id_to_slot.update(zip(int_ids, range(lo, lo + n)))
        self._size += n
        self._count += n
        self._mark_dirty(lo)
        self._mark_dirty(lo + n - 1)

    def delete(self, id: int) -> None:
        """Mask clear; absent ids succeed (reference: src/index/flat.rs:93-96).

        When tombstones dominate, the slot array is compacted so add/delete
        churn cannot grow capacity without bound (the reference's
        ``Vec::retain`` frees rows eagerly; we amortize)."""
        slot = self._id_to_slot.pop(int(id), None)
        if slot is None:
            return
        self._valid[slot] = False
        self._texts[slot] = None
        self._metas[slot] = None
        self._count -= 1
        self._epoch += 1
        self._mask_dirty = True
        if self._size > 1024 and self._count < self._size // 2:
            self._compact()

    def delete_where(self, where) -> int:
        """Bulk-delete every live vector whose metadata matches ``where``
        (TPU-native extension — the reference deletes only by id,
        reference: src/index/flat.rs:93-96). One mask evaluation + one
        vectorized clear, so deleting M of N rows is O(N) once, not M
        id-deletes. ``{}`` is an explicit match-all (full clear); raises
        InvalidFilter on a malformed clause. Returns the count deleted."""
        mask, count, _ = self._where_mask(where)
        if count == 0:
            return 0
        slots = np.flatnonzero(mask)
        for s in slots:
            self._id_to_slot.pop(int(self._ids[s]), None)
            self._texts[s] = None
            self._metas[s] = None
        self._valid[slots] = False
        self._count -= int(count)
        self._epoch += 1
        self._mask_dirty = True
        if self._size > 1024 and self._count < self._size // 2:
            self._compact()
        return int(count)

    def compact(self) -> int:
        """Explicit tombstone reclamation (the automatic trigger in
        ``delete`` amortizes; this is the maintenance entry point shared
        with HNSWIndex.compact). Returns slots reclaimed."""
        dead = self._size - self._count
        if dead <= 0:
            return 0
        self._compact()
        return dead

    def _compact(self) -> None:
        """Drop tombstoned slots, preserving insertion order."""
        live = np.nonzero(self._valid[: self._size])[0]
        n = len(live)
        # COPY-on-compact into a fresh buffer (slab-wise gather — the
        # whole live set in RAM at once would defeat the memmap truth
        # mode at scale). A fresh buffer, not in-place moves, is what
        # makes FlatRowsView lazy snapshots safe to render after the
        # read lock drops: a captured matrix generation is never
        # mutated below its captured size (appends land past it, grow
        # and compact swap in new buffers).
        new_vals = self._alloc_values(self._capacity)
        slab = max(1, (1 << 27) // (8 * self.dim))
        for lo in range(0, n, slab):
            idx = live[lo : lo + slab]
            new_vals[lo : lo + len(idx)] = self._values64[idx]
        self._values64 = new_vals
        self._ids[:n] = self._ids[live]
        self._valid[:] = False
        self._valid[:n] = True
        self._texts = [self._texts[i] for i in live] + [None] * (
            self._capacity - n
        )
        self._metas = [self._metas[i] for i in live] + [None] * (
            self._capacity - n
        )
        self._size = n
        self._id_to_slot = {
            int(self._ids[slot]): slot for slot in range(n)
        }
        self._host_norms_n = 0  # rows moved: rebuild the norm table lazily
        self._host_f32_n = 0
        self._host_f32_finite = True
        # device cache must be rebuilt wholesale (codebooks survive a
        # compaction — the rows are a subset, only their slots moved)
        self._dev_values = None
        self._dev_scan = None
        self._dev_scan_scales = None
        self._dev_scales = None
        self._dev_codes = None
        self._dev_sqnorms = None
        self._dev_valid = None
        self._dirty_lo, self._dirty_hi = 0, n
        self._ivf_drop()  # compaction renumbers slots
        self._epoch += 1
        self._mask_dirty = True

    def search(
        self,
        query: Sequence[float],
        k: int,
        metric: SimilarityMetric,
        *,
        where: Optional[dict] = None,
    ) -> list[SearchResult]:
        results = self.search_batch([query], k, metric, where=where)
        return results[0]

    def search_batch(
        self,
        queries: Sequence[Sequence[float]],
        k: int,
        metric: SimilarityMetric,
        *,
        approx: Optional[bool] = None,
        where: Optional[dict] = None,
    ) -> list[list[SearchResult]]:
        """Batched top-k. The single-query API wraps this with B=1.

        ``approx`` selects candidates with the ApproxTopK engine
        (kernels/amk.py; Pallas-eligible corpora only); ``None``
        (default) auto-engages it at Pallas scale for every storage
        dtype unless the precision auto-guard tripped
        (see _resolve_approx). Returned scores stay exact: exact-f32
        via the fused device re-score, exact f64 host re-scoring for
        int8/bf16 storage. ``False`` forces exhaustive selection on the
        storage dtype.

        Dimension check only applies when the index is non-empty, matching the
        reference quirk (reference: src/index/flat.rs:99).
        """
        q64 = np.asarray(queries, dtype=np.float64)
        q = q64.astype(np.float32)
        if q.ndim != 2:
            raise ValueError("queries must be [B, D]")
        b = q.shape[0]
        mask = mkey = None
        if where is not None:
            # validate (InvalidFilter) before any early return so a
            # malformed clause is always a 400, even on empty indexes
            mask, mcount, mkey = self._where_mask(where)
            if mcount == self._count:
                mask = None  # matches every live row: keep the fast path
        if self._count == 0:
            return [[] for _ in range(b)]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, q.shape[1])
        k = int(k)
        if k <= 0:
            return [[] for _ in range(b)]
        avail = mcount if mask is not None else self._count
        if avail == 0:
            return [[] for _ in range(b)]

        k_eff = min(k, avail)
        if self._host_scan_eligible(b):
            if mask is None:
                scores, slots = self._host_scan(q64, k_eff, metric)
            else:
                scores, slots = self._host_scan_subset(
                    q64, k_eff, metric, mask
                )
        else:
            k_pad = min(
                self._capacity, max(1, next_pow2(min(k_eff, _MAX_K_BUCKET)))
            )
            if k_eff > k_pad:  # k beyond the bucket ceiling: widen
                k_pad = min(self._capacity, next_pow2(k_eff))
            b_pad = next_pow2(b)
            if b_pad > b:
                q = np.concatenate(
                    [q, np.zeros((b_pad - b, self.dim), np.float32)]
                )

            approx = self._resolve_approx(
                approx, k_pad, metric, filtered=mask is not None
            )
            k_sel = self._selection_k(k_pad, approx)
            where_dev = (
                self._where_dev(mkey, mask) if mask is not None else None
            )
            scores, slots = self._device_topk(
                q, k_sel, metric, approx, where_dev=where_dev
            )
            # one fused device->host transfer (np.asarray is a round trip)
            scores, slots = jax.device_get((scores, slots))
            scores, slots = self._finalize_device(
                q64, scores[:b], slots[:b], k_eff, metric
            )

        out: list[list[SearchResult]] = []
        for row_scores, row_slots in zip(scores, slots):
            hits = []
            for s, slot in zip(row_scores, row_slots):
                if s == -np.inf:
                    break
                hits.append(
                    SearchResult(
                        id=int(self._ids[slot]),
                        score=float(s),
                        text=self._texts[slot] or "",
                        metadata=self._metas[slot],
                    )
                )
            out.append(hits)
        return out

    def search_batch_arrays(
        self,
        queries: np.ndarray,
        k: int,
        metric: SimilarityMetric,
        *,
        approx: Optional[bool] = None,
        where: Optional[dict] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Array fast path: returns (ids [B,k] int64, scores [B,k] f64)
        without materializing per-hit Python objects (score dtype is
        normalized to float64 across the f32-device / host-scan / exact-
        rescore routes). Rows with fewer than k live vectors are padded
        with id=-1 / score=-inf; k <= 0 returns [B, 0] arrays. This is
        the production serving path for high-QPS batched search.
        """
        q64 = np.asarray(queries, dtype=np.float64)
        q = q64.astype(np.float32)
        b = q.shape[0]
        k = int(k)
        mask = mkey = None
        if where is not None:
            mask, mcount, mkey = self._where_mask(where)
            if mcount == self._count:
                mask = None  # matches every live row: keep the fast path
        if self._count == 0 or k <= 0:
            k_out = max(0, k)
            return (
                np.full((b, k_out), -1, np.int64),
                np.full((b, k_out), -np.inf, np.float64),
            )
        if q.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, q.shape[1])
        avail = mcount if mask is not None else self._count
        if avail == 0:
            return (
                np.full((b, k), -1, np.int64),
                np.full((b, k), -np.inf, np.float64),
            )
        k_eff = min(k, avail)
        if self._host_scan_eligible(b):
            if mask is None:
                scores, slots = self._host_scan(q64, k_eff, metric)
            else:
                scores, slots = self._host_scan_subset(
                    q64, k_eff, metric, mask
                )
        else:
            dev, _ = self._dispatch_arrays(
                q64, q, k_eff, metric, approx, mask=mask, mkey=mkey
            )
            scores, slots = jax.device_get(dev)
            scores, slots = self._finalize_device(
                q64, scores[:b], slots[:b], k_eff, metric
            )
        return self._pack_arrays(scores, slots, k, k_eff)

    def _dispatch_arrays(
        self, q64, q, k_eff, metric, approx, mask=None, mkey=None
    ):
        """Pad + dispatch one device search; returns the async device
        handles and the effective approx flag (no host sync)."""
        b = q.shape[0]
        k_pad = min(self._capacity, next_pow2(max(1, k_eff)))
        b_pad = next_pow2(b)
        if b_pad > b:
            q = np.concatenate(
                [q, np.zeros((b_pad - b, self.dim), np.float32)]
            )
        approx = self._resolve_approx(
            approx, k_pad, metric, filtered=mask is not None
        )
        k_sel = self._selection_k(k_pad, approx)
        where_dev = self._where_dev(mkey, mask) if mask is not None else None
        return (
            self._device_topk(q, k_sel, metric, approx, where_dev=where_dev),
            approx,
        )

    def _finalize_device(self, q64, scores, slots, k_eff, metric):
        """Post-fetch host work shared by the array path and the
        pipelined stream: exact re-scoring / clamping and k trimming."""
        if self._needs_rescore():
            scores, slots = self._exact_rescore(q64, scores, slots, metric)
        elif metric is SimilarityMetric.COSINE:
            # f32 device rounding can overshoot 1.0; clamp for
            # consistency with the exact-rescore path and the HNSW
            # distance clamp
            scores = np.minimum(scores, 1.0)
        return scores[:, :k_eff], slots[:, :k_eff]

    def _pack_arrays(self, scores, slots, k, k_eff):
        ids = self._ids[slots].astype(np.int64)
        ids[scores == -np.inf] = -1
        if k_eff < k:
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
            scores = np.pad(
                scores,
                ((0, 0), (0, k - k_eff)),
                constant_values=-np.inf,
            )
        return ids, scores.astype(np.float64, copy=False)

    def search_batch_stream(
        self,
        batches,
        k: int,
        metric: SimilarityMetric,
        *,
        depth: int = 2,
        group: int = 1,
        approx: Optional[bool] = None,
        where: Optional[dict] = None,
    ):
        """Pipelined batched search (VERDICT round-2 item 2): keeps up to
        ``depth`` device dispatches in flight, and fetch + host assembly
        for in-flight batches run on a ``depth``-wide worker pool, so
        batch i+1's device scan AND its ~25 ms relay fetch overlap batch
        i's — sequential fetches alone would cap throughput at
        1/RPC-latency regardless of kernel speed. ``group`` > 1
        additionally amortizes the fixed per-dispatch transport cost
        (measured ~14 ms per ``device_put`` through the relay REGARDLESS
        of payload size — bench/probe_serving_wall.py): G consecutive
        batches are concatenated into ONE query upload + ONE device scan
        + ONE result fetch, then split back per batch on the host. The
        larger effective batch also amortizes the corpus HBM read.
        Per-batch results are identical either way; grouping trades
        first-batch latency for sustained throughput. Yields
        ``(ids [B,k] int64, scores [B,k] f64)`` per input batch, in
        order — the sustained-serving analogue of
        ``search_batch_arrays`` (identical per-batch semantics).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        k = int(k)
        depth = max(1, int(depth))
        group = max(1, int(group))
        mask = mkey = None
        mcount = 0
        if where is not None:
            # one mask for the whole stream (callers hold the read lock
            # per their own discipline; a mid-stream mutation already
            # races the unfiltered stream the same way)
            mask, mcount, mkey = self._where_mask(where)
            if mcount == self._count:
                mask = None  # matches every live row: keep the fast path
        pending: deque = deque()

        def finish_device(q64, dev, k_eff, b):
            scores, slots = jax.device_get(dev)
            scores, slots = self._finalize_device(
                q64, scores[:b], slots[:b], k_eff, metric
            )
            return self._pack_arrays(scores, slots, k, k_eff)

        def dispatch_group(items):
            # ONE query upload + ONE device dispatch for the whole group.
            # Runs on the dedicated upload thread: the ~14 ms blocking
            # relay put (bench/probe_serving_wall.py) stays off the
            # generator thread AND off the fetch workers, so group i+1's
            # upload overlaps group i's scan + fetch instead of queueing
            # behind it (round-3's single-stage form serialized
            # put→scan→fetch per worker, which is why grouping lost to
            # plain pipelining — VERDICT r3 item 5).
            k_eff = items[0][2]
            q64 = np.concatenate([it[0] for it in items])
            q = np.concatenate([it[1] for it in items])
            dev, _ = self._dispatch_arrays(
                q64, q, k_eff, metric, approx, mask=mask, mkey=mkey
            )
            return q64, dev, q.shape[0]

        def finish_group(disp_fut, items):
            # fetch + row-wise finalize of the block, then per-batch
            # splits — identical math to finish_device because finalize
            # and rescore are per-row
            q64, dev, b_total = disp_fut.result()
            k_eff = items[0][2]
            scores, slots = jax.device_get(dev)
            scores, slots = self._finalize_device(
                q64, scores[:b_total], slots[:b_total], k_eff, metric
            )
            out, off = [], 0
            for _q64, _q, k_e, b, _h in items:
                out.append(
                    self._pack_arrays(
                        scores[off : off + b],
                        slots[off : off + b],
                        k,
                        k_e,
                    )
                )
                off += b
            return out

        curgroup: list = []

        def flush_group():
            if not curgroup:
                return
            items, holder = list(curgroup), curgroup[0][-1]
            curgroup.clear()
            disp_fut = upload_pool.submit(dispatch_group, items)
            holder["fut"] = pool.submit(finish_group, disp_fut, items)

        def resolve(item):
            if item[0] == "ready":
                return item[1]
            if item[0] == "fut":
                return item[1].result()
            _, holder, j = item
            if "fut" not in holder:
                # the popped batch belongs to the still-open group
                # (possible when host-scan "ready" items pad pending):
                # flush now — resolve runs on the generator thread, so
                # this cannot race a concurrent flush
                flush_group()
            return holder["fut"].result()[j]

        pool = ThreadPoolExecutor(
            max_workers=depth, thread_name_prefix="vl-stream-fetch"
        )
        upload_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="vl-stream-upload"
        )
        try:
            for queries in batches:
                q64 = np.asarray(queries, dtype=np.float64)
                q = q64.astype(np.float32)
                b = q.shape[0]
                avail = mcount if mask is not None else self._count
                if avail == 0 or k <= 0:
                    k_out = max(0, k)
                    item = (
                        "ready",
                        (
                            np.full((b, k_out), -1, np.int64),
                            np.full((b, k_out), -np.inf, np.float64),
                        ),
                    )
                else:
                    if q.shape[1] != self.dim:
                        raise DimensionMismatch(self.dim, q.shape[1])
                    k_eff = min(k, avail)
                    if self._host_scan_eligible(b):
                        if mask is None:
                            scores, slots = self._host_scan(
                                q64, k_eff, metric
                            )
                        else:
                            scores, slots = self._host_scan_subset(
                                q64, k_eff, metric, mask
                            )
                        item = (
                            "ready",
                            self._pack_arrays(scores, slots, k, k_eff),
                        )
                    elif group == 1:
                        dev, _ = self._dispatch_arrays(
                            q64, q, k_eff, metric, approx,
                            mask=mask, mkey=mkey,
                        )
                        item = (
                            "fut",
                            pool.submit(
                                finish_device, q64, dev, k_eff, b
                            ),
                        )
                    else:
                        # defer dispatch: the group concatenates into
                        # one upload/scan/fetch. A k_eff change (a
                        # mutation mid-stream) closes the open group
                        if curgroup and curgroup[0][2] != k_eff:
                            flush_group()
                        holder = curgroup[0][4] if curgroup else {}
                        item = ("g", holder, len(curgroup))
                        curgroup.append((q64, q, k_eff, b, holder))
                        if len(curgroup) >= group:
                            flush_group()
                pending.append(item)
                if len(pending) > depth * group:
                    yield resolve(pending.popleft())
            flush_group()
            while pending:
                yield resolve(pending.popleft())
        finally:
            pool.shutdown(wait=False)
            upload_pool.shutdown(wait=False)

    def __len__(self) -> int:
        return self._count

    def is_empty(self) -> bool:
        return self._count == 0

    def get_vector(
        self, id: int, *, include_values: bool = True
    ) -> Optional[Vector]:
        slot = self._id_to_slot.get(int(id))
        if slot is None:
            return None
        return Vector(
            id=int(self._ids[slot]),
            values=(
                [float(x) for x in self._values64[slot]]
                if include_values
                else []
            ),
            text=self._texts[slot] or "",
            metadata=self._metas[slot],
        )

    def update_metadata(self, id: int, metadata) -> None:
        """Replace a vector's metadata in place (TPU-native extension —
        the reference can only delete + re-add, burning a new id).
        ``None`` clears. The embedding and text are untouched, so no
        device state changes; only the filter-mask cache epoch bumps."""
        slot = self._id_to_slot.get(int(id))
        if slot is None:
            raise VectorNotFound(int(id))
        self._metas[slot] = metadata
        self._epoch += 1

    def list_vectors(
        self,
        offset: int = 0,
        limit: int = 100,
        where: Optional[dict] = None,
        include_values: bool = False,
    ) -> tuple[list[Vector], int]:
        """Page through stored vectors in insertion (slot) order,
        optionally restricted by a ``where`` clause (TPU-native
        extension — the reference offers only per-id GET). Returns
        (page, total matching count); ``include_values=False`` leaves
        ``values`` empty so listings stay light."""
        offset = max(0, int(offset))
        limit = max(0, int(limit))
        if where is not None:
            mask, total, _ = self._where_mask(where)
            slots = np.flatnonzero(mask)
        else:
            slots = np.flatnonzero(self._valid[: self._size])
            total = int(len(slots))
        page = slots[offset : offset + limit]
        out = [
            Vector(
                id=int(self._ids[s]),
                values=(
                    [float(x) for x in self._values64[s]]
                    if include_values
                    else []
                ),
                text=self._texts[s] or "",
                metadata=self._metas[s],
            )
            for s in page
        ]
        return out, total

    @property
    def dimension(self) -> int:
        return self.dim

    def metric(self) -> Optional[SimilarityMetric]:
        return None  # Flat supports all metrics (reference: src/lib.rs:332-337)

    @property
    def index_type(self) -> str:
        return "Flat"

    def max_id(self) -> Optional[int]:
        """Max live id (reference: src/index/flat.rs:76-78)."""
        if not self._id_to_slot:
            return None
        return max(self._id_to_slot)

    def _host_scan_eligible(self, b: int) -> bool:
        from ..utils import env_number

        rows = env_number("VECTORLITE_HOST_SCAN_ROWS", _HOST_SCAN_ROWS)
        return (
            self._mesh is None
            and b <= _HOST_SCAN_MAX_BATCH
            and self._size <= rows
        )

    # -------------------------------------------------- metadata filtering

    def _where_mask(self, where) -> tuple[np.ndarray, int, Optional[str]]:
        """Compile + evaluate a metadata ``where`` clause (core/filter.py)
        into a slot mask. Returns (mask [capacity] bool, already ANDed
        with the live-slot mask; match count; cache key or None).

        Raises InvalidFilter on a malformed clause. The clause is
        compiled from its canonical JSON so cache-key identity implies
        predicate identity (core/filter.py:canonicalize). Masks cache
        per clause and invalidate on the STRUCTURAL epoch (delete /
        compaction / metadata update); appends only extend the slot
        range, so an append-dirty entry re-evaluates just the new rows
        instead of walking all N — steady add+filtered-search workloads
        stay O(appended), not O(N) per search. (TPU-native extension —
        the reference has no filtered search.)

        Entry layout: [struct_epoch, evaluated_upto, mask, count, dev]."""
        from ..core.filter import canonicalize, compile_where
        from ..observability import filter_stats

        where, key = canonicalize(where)
        ent = self._where_masks.get(key)
        if ent is not None and ent[0] == self._epoch:
            if ent[1] == self._size and len(ent[2]) == self._capacity:
                filter_stats.record("hit")
                return ent[2], ent[3], key
            # append-only extension: rows [upto, size) are new; prior
            # slots are immutable under this epoch. Copy-on-extend so a
            # concurrent reader of the old mask never sees a tear.
            pred = compile_where(where)
            mask = np.zeros(self._capacity, dtype=bool)
            upto = min(ent[1], len(ent[2]), self._capacity)
            mask[:upto] = ent[2][:upto]
            count = self._eval_mask_range(pred, mask, upto, self._size)
            count += int(np.count_nonzero(mask[:upto]))
            ent = [self._epoch, self._size, mask, count, None]
            self._where_masks.put(key, ent)
            filter_stats.record("extend", self._size - upto)
            return mask, count, key
        pred = compile_where(where)
        mask = np.zeros(self._capacity, dtype=bool)
        count = self._eval_mask_range(pred, mask, 0, self._size)
        self._where_masks.put(
            key, [self._epoch, self._size, mask, count, None]
        )
        filter_stats.record("build", self._size)
        return mask, count, key

    def _eval_mask_range(self, pred, mask, lo: int, hi: int) -> int:
        """Evaluate ``pred`` over live slots [lo, hi) into ``mask``;
        returns the number of rows set."""
        metas = self._metas
        valid = self._valid
        n = 0
        for i in range(lo, hi):
            if valid[i] and pred(metas[i]):
                mask[i] = True
                n += 1
        return n

    def _where_dev(self, key: Optional[str], mask: np.ndarray):
        """Device copy of a where mask, cached alongside the host mask
        in its entry (mesh-sharded like the validity mask when the index
        is mesh-resident) so repeated filtered searches skip the
        upload. The entry's dev slot resets whenever the host mask is
        rebuilt or extended."""
        ent = self._where_masks.get(key)
        if ent is not None and ent[4] is not None and ent[2] is mask:
            return ent[4]
        if self._mesh is not None:
            from ..dist.sharding import row_sharding

            dev = jax.device_put(mask, row_sharding(self._mesh, 1))
        else:
            dev = jnp.asarray(mask)
        if ent is not None and ent[2] is mask:
            ent[4] = dev
        return dev

    def _host_scan_subset(
        self,
        q64: np.ndarray,
        k_eff: int,
        metric: SimilarityMetric,
        mask: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact f64 scan restricted to the masked slots — the filtered
        analogue of _host_scan (same score formulas via
        _exact_scores_row, same stable lowest-slot tie-break)."""
        slots = np.flatnonzero(mask)
        b = q64.shape[0]
        out_s = np.empty((b, k_eff), np.float64)
        out_i = np.empty((b, k_eff), np.int64)
        for b_i in range(b):
            s = self._exact_scores_row(q64[b_i], slots, metric)
            order = np.argsort(-s, kind="stable")[:k_eff]
            out_s[b_i] = s[order]
            out_i[b_i] = slots[order]
        return out_s, out_i

    def _host_scan(
        self, q64: np.ndarray, k_eff: int, metric: SimilarityMetric
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact f64 scan + top-k on the host — the latency path for
        single/tiny-batch queries over small corpora (module constants for
        the measured crossover vs the TPU relay RPC). Semantics match the
        device path: tombstones -inf, ties break to the lower slot,
        scores are the scalar reference formulas in f64
        (reference: src/index/flat.rs:98-119).

        Above _HOST_PREFILTER_ROWS, candidate selection runs on a cached
        f32 copy with a worst-case error margin and only the candidate
        pool is scored in f64 — same results, ~half the memory traffic
        and no O(N log N) sort (the f64 matmul + full argsort were the
        measured cost at 10-32K rows)."""
        k_eff = max(0, int(k_eff))  # defensive: public paths guard k<=0
        n = self._size
        from ..utils import env_number

        if (
            n >= _HOST_PREFILTER_ROWS
            and k_eff * 4 <= n
            and env_number("VECTORLITE_HOST_PREFILTER", 1)
        ):
            out = self._host_scan_prefiltered(q64, k_eff, metric)
            if out is not None:
                return out
        scores = self._host_scores64(q64, metric, n)
        scores = np.where(self._valid[:n][None, :], scores, -np.inf)
        return _topk_tie_safe(scores, k_eff)

    def _host_scores64(
        self, q64: np.ndarray, metric: SimilarityMetric, n: int
    ) -> np.ndarray:
        """Full [B, n] exact f64 score matrix (reference formulas).

        ``n`` is the caller's row-count snapshot: re-reading self._size
        here raced concurrent appends (the stream path searches without
        the collection lock), mismatching the score width against the
        caller's validity slice."""
        v = self._values64[:n]  # [n, D]
        if metric is SimilarityMetric.MANHATTAN:
            # chunked |v - q| reduce: a full [B, N, D] f64 broadcast would
            # be ~100 MB/query at the 32K-row threshold
            scores = np.empty((q64.shape[0], v.shape[0]))
            step = 4096
            for b_i in range(q64.shape[0]):
                for lo in range(0, v.shape[0], step):
                    chunk = v[lo : lo + step]
                    scores[b_i, lo : lo + len(chunk)] = np.abs(
                        chunk - q64[b_i]
                    ).sum(1)
            return 1.0 / (1.0 + scores)
        if metric is SimilarityMetric.EUCLIDEAN:
            # direct |v - q| form (chunked): matches the reference's
            # scalar sqrt(sum((a-b)^2)) and the rescore paths — the
            # qsq+vsq-2*dots matmul form's cancellation inflates a
            # true-zero distance to ~4e-7 at 384-d f64
            d_sq = np.empty((q64.shape[0], v.shape[0]))
            step = 4096
            for b_i in range(q64.shape[0]):
                for lo in range(0, v.shape[0], step):
                    diff = v[lo : lo + step] - q64[b_i]
                    d_sq[b_i, lo : lo + len(diff)] = np.einsum(
                        "nd,nd->n", diff, diff
                    )
            return 1.0 / (1.0 + np.sqrt(d_sq))
        dots = q64 @ v.T  # [B, N]
        if metric is SimilarityMetric.DOT_PRODUCT:
            return dots
        if metric is SimilarityMetric.COSINE:
            vn = self._host_norms()[:n]
            qn = np.linalg.norm(q64, axis=1, keepdims=True)
            denom = qn * vn[None, :]
            with np.errstate(invalid="ignore", divide="ignore"):
                scores = np.where(
                    denom > 0.0, dots / np.maximum(denom, 1e-300), 0.0
                )
            # f64 rounding can put self-similarity at 1+1ulp; the
            # device paths clamp, so clamp here for consistency
            np.minimum(scores, 1.0, out=scores)
            return scores
        raise AssertionError(f"unhandled metric {metric}")

    def _host_f32(self):
        """Lazy f32 row copy + f32 squared-norm table for the prefilter
        (watermark/lock discipline of _host_norms). The certified flag
        trips when any row's squared norm overflows/is NaN in f32 (|x| ~
        1e19+) OR underflows below the f32 normal range while the true
        f64 norm is nonzero (|x| ~ 1e-20-): in the underflow regime the
        relative-error analysis breaks (a row with f64 cosine 1.0 can
        get f32 selection score 0 and be dropped), so such corpora fall
        back to the pure f64 scan, where no error analysis is needed.
        The reference accepts any f64 values, so both extremes are
        legal inputs."""
        with self._norms_lock:
            if (
                self._host_f32v is None
                or len(self._host_f32v) != self._capacity
            ):
                self._host_f32v = np.zeros(
                    (self._capacity, self.dim), dtype=np.float32
                )
                self._host_sq32 = np.zeros(self._capacity, dtype=np.float32)
                self._host_f32_n = 0
                self._host_f32_finite = True
            if self._host_f32_n < self._size:
                lo, hi = self._host_f32_n, self._size
                with np.errstate(
                    over="ignore", invalid="ignore", under="ignore"
                ):
                    rows = self._values64[lo:hi].astype(np.float32)
                    sq = np.einsum("nd,nd->n", rows, rows)
                self._host_f32v[lo:hi] = rows
                self._host_sq32[lo:hi] = sq
                if not np.all(np.isfinite(sq)):
                    self._host_f32_finite = False
                else:
                    # underflow certification: true-nonzero rows whose
                    # f32 squared norm is zero/subnormal lose up to all
                    # relative precision in the f32 selection score
                    sq64 = np.einsum(
                        "nd,nd->n",
                        self._values64[lo:hi],
                        self._values64[lo:hi],
                    )
                    if np.any(
                        (sq64 > 0.0) & (sq < np.finfo(np.float32).tiny)
                    ):
                        self._host_f32_finite = False
                self._host_f32_n = hi
            return self._host_f32v, self._host_sq32, self._host_f32_finite

    def _host_scan_prefiltered(
        self, q64: np.ndarray, k_eff: int, metric: SimilarityMetric
    ) -> Optional[tuple[np.ndarray, np.ndarray]]:
        """f32 candidate selection + exact f64 rescore; returns None when
        the f32 regime can't be certified (non-finite rows/queries).

        Exactness argument: with thr = (k-th largest f32 selection score)
        - eps, every true top-k row is a candidate provided eps >= 2x the
        worst-case |f32 - f64| selection error: the k true winners keep
        f32 scores >= s*_k - e (so the f32 k-th largest >= s*_k - e...
        <= s*_k + e), hence each true winner's f32 score >= thr. The
        margins (_PREFILTER_EPS_*) are 2x a ~386-ulp naive-accumulation
        bound on top of that. Ties then break to the lowest slot because
        candidates are gathered in ascending-slot order and the final
        f64 sort is stable — identical to the pure f64 path."""
        n = self._size
        b = q64.shape[0]
        v32, sq32, finite = self._host_f32()
        if not finite:
            return None
        q32 = q64.astype(np.float32)
        if not np.all(np.isfinite(q32)):
            return None
        v = v32[:n]
        sq = sq32[:n]
        qn = np.linalg.norm(q64, axis=1)  # [B] f64
        vn_max = float(np.sqrt(max(float(sq.max(initial=0.0)), 0.0)))

        if metric is SimilarityMetric.MANHATTAN:
            sel = np.empty((b, n), np.float32)
            step = 16384
            for b_i in range(b):
                for lo in range(0, n, step):
                    chunk = v[lo : lo + step]
                    sel[b_i, lo : lo + len(chunk)] = -np.abs(
                        chunk - q32[b_i]
                    ).sum(1)
            eps = _PREFILTER_EPS_L1 * np.sqrt(self.dim) * (qn + vn_max)
        else:
            dots = q32 @ v.T  # [B, N] f32 sgemm
            if metric is SimilarityMetric.DOT_PRODUCT:
                sel = dots
                eps = _PREFILTER_EPS_DOT * qn * vn_max
            elif metric is SimilarityMetric.COSINE:
                qn32 = qn.astype(np.float32)
                if np.any((qn > 0.0) & (qn32 == 0.0)):
                    return None  # query-norm underflow: sel would be 0
                vn32 = np.sqrt(sq)
                # certify every nonzero x nonzero denominator stays
                # above the division clamp: below 1e-30 (or product-
                # underflowed to 0) the selection score is arbitrarily
                # under-scaled vs the true cosine and winners get lost
                q_nz = qn32[qn32 > 0.0]
                v_nz = vn32[vn32 > 0.0]
                if q_nz.size and v_nz.size:
                    if float(q_nz.min()) * float(v_nz.min()) < 1e-30:
                        return None
                denom = qn32[:, None] * vn32[None, :]
                with np.errstate(invalid="ignore", divide="ignore"):
                    sel = np.where(
                        denom > 0.0,
                        dots / np.maximum(denom, np.float32(1e-30)),
                        np.float32(0.0),
                    )
                eps = np.full(b, _PREFILTER_EPS_COS)
            else:  # euclidean: select on -d^2 (monotone in the score)
                sel = 2.0 * dots - sq[None, :]  # -d^2 + qsq (const/row)
                eps = _PREFILTER_EPS_L2 * (qn + vn_max) ** 2
        sel = np.where(self._valid[:n][None, :], sel, -np.inf)

        out_s = np.empty((b, k_eff), np.float64)
        out_i = np.empty((b, k_eff), np.int64)
        for b_i in range(b):
            srow = sel[b_i]
            srow = np.where(np.isnan(srow), -np.inf, srow)
            kth = np.partition(srow, n - k_eff)[n - k_eff]
            if kth == -np.inf:  # can't happen (k_eff <= live count)
                return None
            cand = np.flatnonzero(srow >= kth - eps[b_i])
            s64 = self._exact_scores_row(q64[b_i], cand, metric)
            order = np.argsort(-s64, kind="stable")[:k_eff]
            out_s[b_i] = s64[order]
            out_i[b_i] = cand[order]
        return out_s, out_i

    def _exact_scores_row(
        self, q64: np.ndarray, slots: np.ndarray, metric: SimilarityMetric
    ) -> np.ndarray:
        """Exact f64 reference-formula scores for one query over a slot
        subset (the prefilter's rescore; semantics of _exact_rescore)."""
        v = self._values64[slots]  # [M, D]
        if metric is SimilarityMetric.DOT_PRODUCT:
            return v @ q64
        if metric is SimilarityMetric.COSINE:
            dot = v @ q64
            vn = self._host_norms()[slots]
            qn = np.linalg.norm(q64)
            denom = vn * qn
            with np.errstate(invalid="ignore", divide="ignore"):
                s = np.where(
                    denom > 0.0, dot / np.maximum(denom, 1e-300), 0.0
                )
            np.minimum(s, 1.0, out=s)
            return s
        if metric is SimilarityMetric.EUCLIDEAN:
            return 1.0 / (1.0 + np.linalg.norm(v - q64[None, :], axis=-1))
        return 1.0 / (1.0 + np.sum(np.abs(v - q64[None, :]), axis=-1))

    def _prospective_dtype(self):
        """The device-cache dtype the next wholesale rebuild will use.

        "auto" is a capacity ladder, degrading storage precision only as
        the HBM budget demands and always re-scoring winners in exact
        f64: f32 while it fits -> bf16 (2x rows) -> int8 (4x rows).
        Recall@10 measured 1.0 at 1M for both reduced tiers with the 2x
        candidate oversample (_selection_k). While a cache is live, its
        dtype is pinned."""
        if self._quantized or not self._auto_dtype:
            return self._device_dtype
        if self._mesh is not None:
            return jnp.float32  # sharded kernels run f32 (or explicit int8)
        if self._dev_values is not None:
            return self._device_dtype
        budget = _hbm_budget_bytes()
        row_bytes = self._capacity * self.dim
        if (
            jax.default_backend() != "tpu"
            or self._capacity < _PALLAS_MIN_CAPACITY
            or row_bytes * 4 <= budget
        ):
            return jnp.float32
        if row_bytes * 2 <= budget:
            return jnp.bfloat16
        return jnp.int8

    def _scan_copy_wanted(self) -> bool:
        """Speed mode: keep a bf16 scan copy next to the f32 corpus (see
        _SCAN_COPY_BYTES_PER_ELEM) whenever the budget allows — single
        chip, auto profile, Pallas scale, f32 rung.

        Selection ranks on bf16 scores; recall@10 measured 1.0 at 1M
        with the 2x oversample on clustered cosine/euclidean, iid
        gaussian, and a 10x-norm euclidean cancellation stress (bf16
        error and score gaps both scale with |q||v| on realistic data).
        VECTORLITE_SPEED_MODE=0 opts out (falls back to exact-f32
        block selection) for adversarial corpora — huge-norm, ultra-
        tight clusters where d^2 spread << |q||v|."""
        from ..utils import env_number

        if env_number("VECTORLITE_SPEED_MODE", 1) != 1:
            return False
        if self._precision_risky:
            return False
        if (
            not self._auto_dtype
            or self._quantized
            or self._capacity < _PALLAS_MIN_CAPACITY
        ):
            return False
        if jax.default_backend() != "tpu":
            return False
        # a mesh splits rows across devices, so the f32+bf16 budget is
        # per-chip HBM x mesh size
        n_dev = 1 if self._mesh is None else self._mesh.devices.size
        return (
            self._capacity * self.dim * _SCAN_COPY_BYTES_PER_ELEM
            <= _hbm_budget_bytes() * n_dev
        )

    def _scan_copy_dtype(self):
        """Dtype of the speed-mode scan copy.

        int8 (default): the round-4/5 probes measured the s8 x s8 ->
        s32 fused selection at 1.96 ms vs bf16's 2.51 at 1M x 384
        b=256 (bench/report_int8_probe.json — the scan bytes, not the
        MXU rate, bound selection) with candidate recall@10 = 1.0 at
        k_sel=128; the exact-f32 rescore restores exact scores either
        way. bf16 remains selectable (VECTORLITE_SCAN_DTYPE=bf16) for
        corpora whose per-row dynamic range quantizes poorly — the
        same _bf16_selection_risky guard already refuses the scan copy
        outright on adversarial data."""
        import os

        name = os.environ.get("VECTORLITE_SCAN_DTYPE", "int8").lower()
        return jnp.bfloat16 if name in ("bf16", "bfloat16") else jnp.int8

    def _resolve_approx(
        self,
        approx: Optional[bool],
        k_pad: int,
        metric: SimilarityMetric,
        filtered: bool = False,
    ) -> bool:
        """Resolve the tri-state ``approx`` flag.

        ``filtered`` forces exhaustive selection: both approximate
        engines assume surviving scores are spread roughly uniformly
        across the corpus — ApproxTopK keeps ~1 winner per PartialReduce
        shard and the block kernel W=2 per 128-row block — but a where
        mask leaves islands of valid rows (same-metadata vectors are
        typically inserted together), so clustered matches beyond the
        per-shard/per-block quota would be silently unrecoverable. The
        exhaustive kernels treat -inf rows like tombstones and lose
        nothing.

        ``None`` auto-engages ApproxTopK selection at Pallas scale —
        measured ~2-3.8 ms vs 14.1 exhaustive at 1M x 384 b=256
        (BASELINE.md round 3) for every storage dtype. Reduced-precision
        candidates are 2x-oversampled (_selection_k) and exactly
        re-scored as before; manhattan always scans exactly (the L1
        kernel is VPU-bound, selection is a rounding error of its
        cost). On a mesh, ApproxTopK + exact rescore runs PER SHARD
        (dist/sharding.py sharded_search_amk) — same contract and
        auto-engage scale; the int8 capacity profile and manhattan stay
        exact under a mesh."""
        if filtered:
            return False
        if self._pq:
            # the PQ branch selects exhaustively over ADC scores; the
            # block/amk engines never see the code matrix
            return False
        if metric is SimilarityMetric.MANHATTAN:
            # no matmul form: the L1 scan is VPU-bound and selection is a
            # rounding error of its cost — always exact (pallas_l1.py)
            return False
        if self._mesh is not None:
            if self._quantized or not _amk_enabled():
                return False
            if approx is not None:
                return bool(approx)
            return _use_pallas(self._capacity, metric)
        if not _use_pallas(self._capacity, metric):
            return False
        if not self._block_selection_feasible(k_pad):
            return False
        if approx is not None:
            return bool(approx)
        return True

    def _selection_k(self, k_pad: int, approx: bool) -> int:
        """Candidate-list width for device selection.

        Reduced-precision storage (int8/bf16) ranks candidates on
        approximate scores, so a true top-k member can fall just past the
        k_pad boundary before the exact re-score re-sorts (measured
        recall 0.994 at 1M/bf16 with k_sel == k_pad). Doubling the
        candidate pool closes that gap for ~nothing: selection cost is
        dominated by the scan, and the rescore is O(B * k_sel * D)."""
        if self._pq:
            # PQ ranking error is much larger than int8's (the row
            # itself is ~16-32x compressed): a wide pool floor + 4x
            # oversample. The 4-bit profile needs the wider floor:
            # measured pool recall@10 at 30K/384-d clustered cosine is
            # 0.906/0.975 at pool 128/256 (4-bit) vs 0.950 at 128
            # (8-bit) — same code bytes, and the pool cost is a small
            # exact-ADC einsum plus the host rescore
            from ..utils import env_number

            # the floor keys off the LIVE cache's code width (frozen at
            # wholesale build), not the env knob: flipping
            # VECTORLITE_PQ_BITS after a build must not shrink the pool
            # for codes that are still 4-bit
            bits = (
                self._pq_bits_active
                if self._pq_bits_active is not None
                else _pq_bits()
            )
            # the floor also scales with corpus size: pool recall at a
            # fixed width decays as N grows (more near-ties per query —
            # measured 0.9656 recall@10 at 1M vs 0.9422 at 8M with the
            # same 256 pool, bench/report_flat8m.json r3). One doubling
            # per 8x high-water rows past 2M (8M->512, 64M->1024) keeps
            # the pool/N ratio's decay sub-linear for ~nothing: the
            # exact-ADC stage and the host f64 rescore are both
            # O(B * pool * D) on tiny operands. High-water (_size, not
            # live count) is deliberate: the pool never shrinks when
            # deletes tombstone rows, it only stops growing.
            if bits == 4:
                live, base, thresh = max(1, self._size), 256, 2 << 20
                while base < 2048 and live > thresh:
                    base, thresh = base * 2, thresh * 8
            else:
                base = 128
            floor = int(env_number("VECTORLITE_PQ_POOL_MIN", base))
            return min(self._capacity, next_pow2(max(4 * k_pad, floor)))
        if self._quantized or self._prospective_dtype() != jnp.float32:
            return min(self._capacity, next_pow2(2 * k_pad))
        return k_pad

    def _block_selection_feasible(self, k_pad: int) -> bool:
        """Block selection yields capacity/128*W candidates; top_k needs
        at least k_pad of them."""
        return k_pad * (128 // _BLOCK_WINNERS) <= self._capacity

    def _needs_rescore(self) -> bool:
        """Exact f64 host re-scoring of the k winners is required whenever
        device *scores* ran on reduced precision (int8/bf16 storage);
        returned scores then match the scalar reference formulas. Approx
        (block) selection alone needs none: its candidate scores are the
        same exact-f32 values the exact kernel returns."""
        return (
            self._quantized
            or self._pq_active
            or self._device_dtype == jnp.bfloat16
        )

    def _exact_rescore(
        self,
        q64: np.ndarray,  # [B, D] original f64 queries (unpadded)
        scores: np.ndarray,  # [B, k] approximate device scores
        slots: np.ndarray,  # [B, k] slot indices
        metric: SimilarityMetric,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Re-score the k winners in exact float64 host math and re-sort
        each row, so returned scores match the scalar reference formulas
        exactly. O(B*k*D); the native streaming kernel
        (native/hnsw_builder.cpp flat_rescore_f64) reads each candidate
        row once with no [B,k,D] gather temp — measured 2.4x over the
        numpy batched matmul at the bf16/int8-storage serving shape
        [256,128,384] (~13 ms vs ~31 ms, the single-core host cost that
        bounds sustained QPS on reduced-precision rungs)."""
        exact = self._native_rescore(q64, slots, metric)
        if exact is None:
            q = q64[:, None, :]  # [B, 1, D]
            v = self._values64[slots]  # [B, k, D]
            if metric is SimilarityMetric.DOT_PRODUCT:
                exact = np.matmul(v, q64[:, :, None])[..., 0]
            elif metric is SimilarityMetric.COSINE:
                dot = np.matmul(v, q64[:, :, None])[..., 0]
                vn = self._host_norms()[slots]
                qn = np.linalg.norm(q64, axis=-1, keepdims=True)
                denom = vn * qn
                with np.errstate(invalid="ignore", divide="ignore"):
                    exact = np.where(
                        denom > 0.0, dot / np.maximum(denom, 1e-300), 0.0
                    )
                np.minimum(exact, 1.0, out=exact)  # match device clamp
            elif metric is SimilarityMetric.EUCLIDEAN:
                exact = 1.0 / (1.0 + np.linalg.norm(v - q, axis=-1))
            else:
                exact = 1.0 / (1.0 + np.sum(np.abs(v - q), axis=-1))
        exact = np.where(scores == -np.inf, -np.inf, exact)
        # candidates arrive in device-selection-score order; re-sort by
        # slot first so the stable score argsort breaks exact-score ties
        # to the LOWEST row (insertion order), matching the host scan,
        # the device kernels, and the reference's stable sort
        slot_order = np.argsort(slots, axis=1, kind="stable")
        exact = np.take_along_axis(exact, slot_order, axis=1)
        slots = np.take_along_axis(slots, slot_order, axis=1)
        order = np.argsort(-exact, axis=1, kind="stable")
        return (
            np.take_along_axis(exact, order, axis=1),
            np.take_along_axis(slots, order, axis=1),
        )

    def _native_rescore(
        self,
        q64: np.ndarray,
        slots: np.ndarray,
        metric: SimilarityMetric,
    ) -> Optional[np.ndarray]:
        """Exact f64 candidate scores [B, k] via the streaming native
        kernel (no [B,k,D] gather temp), or None when the native lib is
        unavailable/disabled — callers fall back to the numpy path.
        Both ``_values64`` and the norm table are capacity-sized, so
        every device slot (including -inf padding rows) is in-bounds."""
        if slots.size == 0:
            return None
        from .. import native as _native

        lib = _native.load()
        if lib is None or not hasattr(lib, "flat_rescore_f64"):
            return None
        vals = self._values64
        if not vals.flags.c_contiguous:  # pragma: no cover - always C
            return None
        import ctypes

        dptr = ctypes.POINTER(ctypes.c_double)
        b, k = slots.shape
        q = np.ascontiguousarray(q64, dtype=np.float64)
        s = np.ascontiguousarray(slots, dtype=np.int64)
        out = np.empty((b, k), dtype=np.float64)
        norms_arg = None
        if metric is SimilarityMetric.COSINE:
            norms = self._host_norms()
            norms_arg = norms.ctypes.data_as(dptr)
        code = {
            SimilarityMetric.COSINE: 0,
            SimilarityMetric.EUCLIDEAN: 1,
            SimilarityMetric.DOT_PRODUCT: 2,
            SimilarityMetric.MANHATTAN: 3,
        }[metric]
        lib.flat_rescore_f64(
            vals.ctypes.data_as(dptr),
            norms_arg,
            q.ctypes.data_as(dptr),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(dptr),
            self.dim,
            b,
            k,
            code,
        )
        return out

    def _host_norms(self) -> np.ndarray:
        """Float64 row L2-norm table, extended lazily to the append
        watermark (rows are append-only; compaction resets the watermark).
        Callers hold the collection read lock, which admits siblings —
        the table mutation itself is serialized by ``_norms_lock``."""
        with self._norms_lock:
            if (
                self._host_norms64 is None
                or len(self._host_norms64) != self._capacity
            ):
                self._host_norms64 = np.zeros(
                    self._capacity, dtype=np.float64
                )
                self._host_norms_n = 0
            if self._host_norms_n < self._size:
                lo, hi = self._host_norms_n, self._size
                self._host_norms64[lo:hi] = np.linalg.norm(
                    self._values64[lo:hi], axis=1
                )
                self._host_norms_n = hi
            return self._host_norms64

    # ------------------------------------------------------- device plumbing

    def _device_topk(
        self,
        q: np.ndarray,
        k_pad: int,
        metric: SimilarityMetric,
        approx: bool = False,
        where_dev=None,
    ):
        """Dispatch to the fused Pallas tiled scan for huge corpora (no
        [B, cap] intermediate) or the plain XLA path otherwise. With
        ``approx`` (and a Pallas-eligible corpus), selection uses the
        TPU-KNN block-top-W kernel (recall ~1.0 at W=2, ~1.45x faster
        than the exact kernel); reduced-precision storage (int8/bf16) is
        re-scored exactly by the callers. Sync and dispatch are atomic
        under the device mutex; the (async) result is fetched by the
        caller outside it."""
        with self._dev_lock:
            self._sync_device()
            # auto-guard verdict from the last rebuild: f32 storage
            # serves the exact exhaustive kernel on risky corpora
            # (reduced-precision *storage* rungs keep their wider
            # oversample + exact re-score — precision there is the
            # capacity trade itself, not an optimization). Applied
            # AFTER the IVF attempt below: an active IVF layout passed
            # the window-scaled precision check in _ivf_build, so its
            # bounded bf16 ranking is blessed even when full-corpus
            # bf16 selection is not.
            risky_f32 = (
                self._precision_risky
                and not self._quantized
                and self._device_dtype == jnp.float32
            )
            # metadata filter: intersect the validity mask the kernels
            # already consume (same shape/dtype -> no recompile; the
            # sharded mask matches the mesh layout via _where_dev).
            # Approximate selection assumes uniformly-spread survivors;
            # a mask clusters them, so filtered searches always run the
            # exhaustive kernels (_resolve_approx(filtered=True) on the
            # public paths; enforced here for direct callers too).
            valid = self._dev_valid
            if where_dev is not None:
                valid = jnp.logical_and(valid, where_dev)
                approx = False
            queries = jnp.asarray(q)
            if (
                approx
                and self._ivf_active
                and where_dev is None
                and metric is not SimilarityMetric.MANHATTAN
            ):
                # IVF partitioned scan (kernels/ivf.py): reads only the
                # probed partitions + the insert tail. Falls through to
                # the brute engines when the batch is large enough that
                # one full corpus read amortizes better (see _ivf_topk).
                # Filtered searches never reach here (approx is forced
                # False), matching the clustered-survivor rule the
                # other approximate engines follow.
                res = self._ivf_topk(queries, k_pad, metric)
                if res is not None:
                    return res
            if approx and risky_f32:
                approx = False
            if self._pq_active:
                # streaming ADC over the code matrix. Approximation
                # sources, in order of measured impact: the code
                # quantization itself, approx_max_k per-chunk selection
                # (rt=0.95) on a bf16 LUT contraction, and the
                # k+_EXACT_MARGIN pool trim (kernels/pq.py). The wide
                # _selection_k pool + the caller's exact f64 rescore
                # absorb all three (measured 0.9656 recall@10 at 1M)
                from ..kernels.pq import pq_pallas_default, pq_search_topk

                sel_metric = metric
                if self._pq_rot is not None:
                    queries = queries.astype(jnp.float32) @ self._pq_rot
                    if metric is SimilarityMetric.MANHATTAN:
                        # L1 is not rotation-invariant: rotated-L1 ADC
                        # ranks a different geometry (measured pool
                        # recall 0.86 vs 0.90 for the rotation-
                        # invariant dot+norms proxy on an eigen-decay
                        # corpus). Select via the euclidean proxy; the
                        # exact L1 rescore restores true scores and
                        # order within the pool.
                        sel_metric = SimilarityMetric.EUCLIDEAN
                if self._mesh is not None:
                    # per-shard streaming ADC + all-gather merge: each
                    # chip holds only its code slice (dist/sharding.py)
                    from ..dist.sharding import sharded_search_pq

                    n_dev = int(self._mesh.devices.size)
                    rows_per_shard = self._capacity // n_dev
                    return sharded_search_pq(
                        self._dev_codes,
                        self._dev_codebooks,
                        self._dev_sqnorms,
                        valid,
                        queries,
                        metric=sel_metric,
                        k=k_pad,  # per-shard cap happens inside
                        chunk=min(_pq_scan_chunk(
                            self._pq_bits_active
                            if self._pq_bits_active is not None
                            else _pq_bits()
                        ), rows_per_shard),
                        mesh=self._mesh,
                        packed=self._pq_packed,
                        pallas=pq_pallas_default(),
                    )
                return pq_search_topk(
                    self._dev_codes,
                    self._dev_codebooks,
                    self._dev_sqnorms,
                    valid,
                    queries,
                    metric=sel_metric,
                    k=min(k_pad, self._capacity),
                    chunk=min(_pq_scan_chunk(
                        self._pq_bits_active
                        if self._pq_bits_active is not None
                        else _pq_bits()
                    ), self._capacity),
                    packed=self._pq_packed,
                    pallas=pq_pallas_default(),
                )
            if self._mesh is not None:
                # per-shard scan + all-gather merge. Speed mode rides
                # the flagship amk engine per shard (fused matmul +
                # ApproxTopK + exact-f32 rescore); int8 and manhattan
                # (and risky/amk-off corpora) stay per-shard exact.
                from ..dist.sharding import (
                    sharded_search_amk,
                    sharded_search_topk,
                    sharded_search_topk_int8,
                )

                if self._quantized:
                    return sharded_search_topk_int8(
                        self._dev_values,
                        self._dev_scales,
                        self._dev_sqnorms,
                        valid,
                        queries,
                        metric=metric,
                        k=k_pad,
                        mesh=self._mesh,
                    )
                if (
                    approx
                    and metric is not SimilarityMetric.MANHATTAN
                    and _amk_enabled()
                ):
                    from ..kernels.amk import k_sel_floor, recall_target

                    scan = (
                        self._dev_scan
                        if self._dev_scan is not None
                        else self._dev_values
                    )
                    k_sel = min(
                        self._capacity,
                        max(k_sel_floor(), next_pow2(2 * k_pad)),
                    )
                    tomb = self._count != self._size
                    return sharded_search_amk(
                        scan,
                        self._dev_values,
                        self._dev_sqnorms,
                        valid,
                        queries,
                        metric=metric,
                        k=k_pad,
                        k_sel=k_sel,
                        recall_target=recall_target(),
                        mesh=self._mesh,
                        tombstones=tomb,
                        live_hi=None if tomb else self._live_hi_scalar(),
                    )
                return sharded_search_topk(
                    self._dev_values,
                    self._dev_sqnorms,
                    valid,
                    queries,
                    metric=metric,
                    k=k_pad,
                    mesh=self._mesh,
                )
            pallas_ok = _use_pallas(self._capacity, metric)
            # safety for direct callers: _resolve_approx applies the same
            # feasibility rule on the public paths
            if approx and not self._block_selection_feasible(k_pad):
                approx = False
            if metric is SimilarityMetric.MANHATTAN:
                pallas_ok = pallas_ok and not self._quantized
            use_amk = pallas_ok and _amk_enabled()
            if self._quantized:
                if pallas_ok:
                    from ..kernels.pallas_scan import (
                        pallas_search_block_topk_int8,
                        pallas_search_topk_int8,
                    )

                    if approx and use_amk:
                        from ..kernels.amk import (
                            K_SEL_MIN,
                            amk_select_int8,
                            recall_target,
                        )

                        # int8 ranking error displaces true winners at
                        # least as far as bf16's (~100 ranks at 1M), so
                        # the candidate pool the host rescores needs the
                        # same K_SEL_MIN floor the f32/bf16 amk paths use
                        return amk_select_int8(
                            self._dev_values,
                            self._dev_scales,
                            self._dev_sqnorms,
                            valid,
                            queries,
                            metric=metric,
                            k=min(
                                self._capacity,
                                max(K_SEL_MIN, k_pad),
                            ),
                            recall_target=recall_target(),
                        )
                    if approx:
                        return pallas_search_block_topk_int8(
                            self._dev_values,
                            self._dev_scales,
                            self._dev_sqnorms,
                            valid,
                            queries,
                            metric=metric,
                            k=k_pad,
                            tile_n=_PALLAS_TILE_BLOCK,
                            winners=_BLOCK_WINNERS,
                        )
                    return pallas_search_topk_int8(
                        self._dev_values,
                        self._dev_scales,
                        self._dev_sqnorms,
                        valid,
                        queries,
                        metric=metric,
                        k=k_pad,
                        tile_n=_PALLAS_TILE_F32,
                    )
                from ..kernels.topk import search_topk_int8

                return search_topk_int8(
                    self._dev_values,
                    self._dev_scales,
                    self._dev_sqnorms,
                    valid,
                    queries,
                    metric=metric,
                    k=k_pad,
                )
            if pallas_ok:
                from ..kernels.pallas_scan import (
                    pallas_search_block_topk_rescored,
                    pallas_search_topk,
                )

                if metric is SimilarityMetric.MANHATTAN:
                    # fused L1 scan: no [B, cap] HBM intermediate (the
                    # XLA path's 1 GB at 1M x b256); exact selection
                    from ..kernels.pallas_l1 import pallas_search_topk_l1

                    return pallas_search_topk_l1(
                        self._dev_values,
                        valid,
                        queries,
                        k=k_pad,
                        tile_n=_PALLAS_TILE_F32,
                    )
                if approx and use_amk:
                    # default serving scan: fused matmul + ApproxTopK
                    # candidate selection + exact-f32 device re-score,
                    # one dispatch (kernels/amk.py; 1M x b256 measured
                    # ~2 ms vs 6.5 ms for the Pallas block path). The
                    # bf16 scan copy halves the selection reads when
                    # present; bf16-storage results are additionally
                    # f64-re-scored on the host (_needs_rescore).
                    from ..kernels.amk import (
                        amk_search_topk_rescored,
                        augment_default,
                        k_sel_floor,
                        recall_target,
                    )

                    scan = (
                        self._dev_scan
                        if self._dev_scan is not None
                        else self._dev_values
                    )
                    k_sel = min(
                        self._capacity,
                        max(k_sel_floor(), next_pow2(2 * k_pad)),
                    )
                    tomb = self._count != self._size
                    return amk_search_topk_rescored(
                        scan,
                        self._dev_values,
                        self._dev_sqnorms,
                        valid,
                        queries,
                        metric=metric,
                        k=k_pad,
                        k_sel=k_sel,
                        recall_target=recall_target(),
                        augment=augment_default(),
                        scan_scales=(
                            self._dev_scan_scales
                            if scan.dtype == jnp.int8
                            else None
                        ),
                        tombstones=tomb,
                        live_hi=None if tomb else self._live_hi_scalar(),
                    )
                if approx and self._dev_scan is not None:
                    # legacy speed mode (VECTORLITE_AMK=0): bf16 scan
                    # copy selects 2x-oversampled candidates, f32 rows
                    # re-score them exactly on device — one dispatch
                    k_sel = next_pow2(2 * k_pad)
                    if k_sel * (128 // _BLOCK_WINNERS) > self._capacity:
                        k_sel = k_pad
                    return pallas_search_block_topk_rescored(
                        self._dev_scan,
                        self._dev_values,
                        self._dev_sqnorms,
                        valid,
                        queries,
                        metric=metric,
                        k=k_pad,
                        k_sel=k_sel,
                        tile_n=_PALLAS_TILE_BLOCK,
                        winners=_BLOCK_WINNERS,
                    )
                if approx:
                    # legacy f32 block path without a scan copy: select
                    # and re-score from the same buffer so exact scores
                    # + slot-order ties hold here too (the raw block
                    # kernel's candidate order is no longer row-sorted
                    # since the lane-group fold landed)
                    k_sel = next_pow2(2 * k_pad)
                    if k_sel * (128 // _BLOCK_WINNERS) > self._capacity:
                        k_sel = k_pad
                    return pallas_search_block_topk_rescored(
                        self._dev_values,
                        self._dev_values,
                        self._dev_sqnorms,
                        valid,
                        queries,
                        metric=metric,
                        k=k_pad,
                        k_sel=k_sel,
                        tile_n=_PALLAS_TILE_BLOCK,
                        winners=_BLOCK_WINNERS,
                    )
                return pallas_search_topk(
                    self._dev_values,
                    self._dev_sqnorms,
                    valid,
                    queries,
                    metric=metric,
                    k=k_pad,
                    tile_n=(
                        _PALLAS_TILE_BF16
                        if self._device_dtype == jnp.bfloat16
                        else _PALLAS_TILE_F32
                    ),
                )
            return search_topk(
                self._dev_values,
                self._dev_sqnorms,
                valid,
                queries,
                metric=metric,
                k=k_pad,
            )

    def _mark_dirty(self, slot: int) -> None:
        if self._dirty_hi == self._dirty_lo:
            self._dirty_lo, self._dirty_hi = slot, slot + 1
        else:
            self._dirty_lo = min(self._dirty_lo, slot)
            self._dirty_hi = max(self._dirty_hi, slot + 1)
        self._mask_dirty = True

    def _grow(self, min_capacity: Optional[int] = None) -> None:
        """Double capacity — straight to the power-of-2 covering
        ``min_capacity`` when given, so a bulk insert of N rows pays ONE
        reallocation instead of log2(N) chained concatenates (a 1M .vlc
        load spent seconds re-copying the matrix per doubling)."""
        new_cap = self._capacity * 2
        if min_capacity is not None:
            while new_cap < min_capacity:
                new_cap *= 2
        growth = new_cap - self._capacity
        # np.zeros is calloc-backed (virtual zero pages): allocating the
        # full new buffer and copying only the occupied prefix touches
        # O(size) bytes, where concatenate-with-zeros touched O(new_cap)
        # twice. Slots in [size, capacity) are always zero by invariant.
        n = self._size
        new_vals = self._alloc_values(new_cap)
        new_vals[:n] = self._values64[:n]  # same-dtype slice copy: memcpy
        self._values64 = new_vals
        new_ids = np.zeros(new_cap, np.uint64)
        new_ids[:n] = self._ids[:n]
        self._ids = new_ids
        new_valid = np.zeros(new_cap, bool)
        new_valid[:n] = self._valid[:n]
        self._valid = new_valid
        self._texts.extend([None] * growth)
        self._metas.extend([None] * growth)
        if self._host_norms64 is not None:
            new_norms = np.zeros(new_cap, np.float64)
            new_norms[:n] = self._host_norms64[:n]
            self._host_norms64 = new_norms
        self._capacity = new_cap
        # Capacity changed: device buffers must be rebuilt wholesale.
        # Codebooks retrain too — each doubling re-fits them to the
        # (roughly 2x larger) corpus, so PQ drift from appends is
        # bounded by one capacity generation.
        self._dev_values = None
        self._dev_scan = None
        self._dev_scan_scales = None
        self._dev_scales = None
        self._dev_codes = None
        self._dev_codebooks = None
        self._dev_sqnorms = None
        self._dev_valid = None
        self._dirty_lo, self._dirty_hi = 0, self._size
        self._mask_dirty = True

    def _live_hi_scalar(self) -> jax.Array:
        """Device scalar of the live watermark for the no-tombstone
        rescore fast path; re-uploaded only when ``_size`` moves."""
        if self._dev_live_hi_val != self._size:
            self._dev_live_hi = jnp.asarray(np.int32(self._size))
            self._dev_live_hi_val = self._size
        return self._dev_live_hi

    def _sync_device(self) -> None:
        """Bring every device cache up to the host truth: the rung
        buffers (_sync_device_core) and, past the gate, the IVF
        partition layout. The mask/dirty flags are snapshotted first
        because the core sync consumes them."""
        mask_was_dirty = self._mask_dirty
        dirty_lo, dirty_hi = self._dirty_lo, self._dirty_hi
        self._sync_device_core()
        if self._ivf_wanted():
            self._sync_device_ivf(mask_was_dirty, dirty_lo, dirty_hi)
        elif self._ivf_rows is not None:
            self._ivf_drop()

    def _sync_device_core(self) -> None:
        from ..core.metrics import quantize_rows_int8

        if self._pq and self._sync_device_pq():
            return  # PQ cache active; below the gate falls through to
            # the plain f32 path (single-chip or mesh alike)
        if self._mesh is not None:
            self._sync_device_mesh()
            return
        if self._dev_values is None:
            # resolve "auto" on every wholesale rebuild (capacity growth
            # nulls the cache, so the profile adapts as the corpus grows —
            # no mid-buffer dtype switches). Cast/quantize on the HOST so
            # only final-dtype bytes ever transfer or stage in HBM — an
            # f32 staging copy would defeat the bf16/int8 capacity
            # profiles exactly when they matter (corpus ~ HBM size).
            self._device_dtype = self._prospective_dtype()
            if self._device_dtype == jnp.int8:
                # bottom rung of the auto capacity ladder: engage the
                # full quantized machinery (scales, int8 kernels, exact
                # re-scoring); monotonic — capacity never shrinks
                self._quantized = True
            vals32 = np.asarray(self._values64, dtype=np.float32)
            # auto-guard (VECTORLITE_SPEED_GUARD=0 disables): on corpora
            # where bf16-precision selection could displace true top-k
            # members beyond the candidate pool, refuse the scan copy
            # and approximate selection — serve the exact exhaustive
            # kernel instead (no env knowledge required of the operator)
            from ..utils import env_number

            if (
                self._capacity >= _PALLAS_MIN_CAPACITY
                and env_number("VECTORLITE_SPEED_GUARD", 1) == 1
            ):
                self._precision_risky = _bf16_selection_risky(
                    vals32, self._valid, self._size
                )
            else:
                self._precision_risky = False
            sq = np.einsum("nd,nd->n", vals32, vals32, dtype=np.float32)
            self._dev_sqnorms = jnp.asarray(sq)
            if self._quantized:
                q, scales = _quantize_rows_int8_np(vals32)
                self._dev_values = jnp.asarray(q)
                self._dev_scales = jnp.asarray(scales)
            elif self._device_dtype == jnp.bfloat16:
                import ml_dtypes

                self._dev_values = jnp.asarray(
                    vals32.astype(ml_dtypes.bfloat16)
                )
            else:
                self._dev_values = jnp.asarray(vals32)
            if (
                self._device_dtype == jnp.float32
                and self._scan_copy_wanted()
            ):
                if self._scan_copy_dtype() == jnp.int8:
                    q, scales = _quantize_rows_int8_np(vals32)
                    self._dev_scan = jnp.asarray(q)
                    self._dev_scan_scales = jnp.asarray(scales)
                else:
                    import ml_dtypes

                    self._dev_scan = jnp.asarray(
                        vals32.astype(ml_dtypes.bfloat16)
                    )
                    self._dev_scan_scales = None
            else:
                self._dev_scan = None
                self._dev_scan_scales = None
            self._dev_valid = jnp.asarray(self._valid)
            self._dirty_lo = self._dirty_hi = self._size
            self._mask_dirty = False
            return
        if self._dirty_hi > self._dirty_lo:
            lo, hi = self._dirty_lo, self._dirty_hi
            # pad the burst to a power-of-two row count so the jitted
            # row-update programs stay in a small bucketed cache; the
            # extra rows re-write host truth (a no-op)
            burst = next_pow2(hi - lo)
            hi = min(self._capacity, lo + burst)
            lo = max(0, hi - burst)
            rows32 = jnp.asarray(
                self._values64[lo:hi], dtype=jnp.float32
            )
            self._dev_sqnorms = update_rows(
                self._dev_sqnorms, row_sqnorms(rows32), lo
            )
            if self._quantized:
                rows_q, row_scales = quantize_rows_int8(rows32)
                self._dev_values = update_rows(self._dev_values, rows_q, lo)
                self._dev_scales = update_rows(
                    self._dev_scales, row_scales, lo
                )
            else:
                self._dev_values = update_rows(
                    self._dev_values, rows32.astype(self._device_dtype), lo
                )
            if self._dev_scan is not None:
                if self._dev_scan.dtype == jnp.int8:
                    s_rows, s_scales = quantize_rows_int8(rows32)
                    self._dev_scan = update_rows(
                        self._dev_scan, s_rows, lo
                    )
                    self._dev_scan_scales = update_rows(
                        self._dev_scan_scales, s_scales, lo
                    )
                else:
                    # update_rows casts to the buffer dtype internally
                    self._dev_scan = update_rows(
                        self._dev_scan, rows32, lo
                    )
            self._dirty_lo = self._dirty_hi = self._size
        if self._mask_dirty:
            self._dev_valid = jnp.asarray(self._valid)
            self._mask_dirty = False

    def _sync_device_pq(self) -> bool:
        """Maintain the PQ cache (codes + codebooks + exact sqnorms).
        Returns True when the PQ rung is serving; False below the
        training gate (the caller's plain f32 path serves instead, and
        the first sync past the gate swaps the cache wholesale)."""
        from ..kernels.pq import encode_rows
        from ..utils import env_number

        gate = max(1024, int(env_number("VECTORLITE_PQ_MIN_ROWS", 16384)))
        if self._dev_codes is None:
            if self._size < gate:
                self._pq_active = False
                return False
            if self._dev_codebooks is None:
                from ..kernels.pq import (
                    pq_subspaces,
                    rotation_matrix,
                    train_codebooks,
                )

                bits = _pq_bits()
                kc = 16 if bits == 4 else 256
                m = pq_subspaces(
                    self.dim,
                    int(
                        env_number(
                            "VECTORLITE_PQ_M",
                            max(1, self.dim // (2 if bits == 4 else 4)),
                        )
                    ),
                )
                # two 4-bit codes per stored byte (even M only)
                self._pq_packed = bits == 4 and m % 2 == 0
                self._pq_bits_active = bits
                # OPQ-lite: decided only at wholesale build time so
                # dirty-append encodes always match the live cache
                self._pq_rot = (
                    jnp.asarray(rotation_matrix(self.dim))
                    if env_number("VECTORLITE_PQ_ROTATE", 1) == 1
                    else None
                )
                sample_n = min(
                    self._size,
                    int(env_number("VECTORLITE_PQ_TRAIN_SAMPLE", 32768)),
                )
                live = np.nonzero(self._valid[: self._size])[0]
                if len(live) > sample_n:
                    sel = np.random.default_rng(0).choice(
                        live, sample_n, replace=False
                    )
                    sel.sort()
                else:
                    sel = live
                sample32 = self._values64[sel].astype(np.float32)
                if self._pq_rot is not None:
                    sample32 = np.asarray(
                        jnp.asarray(sample32) @ self._pq_rot
                    )
                self._dev_codebooks = train_codebooks(
                    sample32, m, kc=kc,
                    iters=int(env_number("VECTORLITE_PQ_TRAIN_ITERS", 16)),
                )
            # encode everything below capacity in fixed buckets. Each
            # bucket casts f64 -> f32 on its own (NO full-capacity f32
            # staging copy — at the 10M+ scales this rung exists for
            # that temp alone would cost 15+ GB of host RAM), and the
            # per-bucket [rows, 256] assignment temp stays ~134 MB.
            # Invalid slots encode zeros; the validity mask hides them.
            step = min(_PQ_ENCODE_BUCKET, self._capacity)

            def _bucket(lo):
                rows = jnp.asarray(
                    self._values64[lo : lo + step], dtype=jnp.float32
                )
                if self._pq_rot is not None:
                    rows = rows @ self._pq_rot
                codes = encode_rows(self._dev_codebooks, rows)
                if self._pq_packed:
                    from ..kernels.pq import pack_nibbles

                    codes = pack_nibbles(codes)
                return codes

            # f64 pairwise product sums reduce straight to [cap] — no
            # [cap, D] f32 matrix temp here either
            sq = np.einsum(
                "nd,nd->n", self._values64, self._values64
            ).astype(np.float32)
            if self._mesh is not None:
                # row-shard the code matrix; codebooks and the rotation
                # stay small uncommitted arrays (the sharded search jit
                # replicates them per its in_specs — ~400 KB, nothing
                # worth pinning). Codes assemble through a host buffer
                # (N·M bytes — 1/32 of the f32 corpus) so no single
                # device ever stages the whole matrix.
                from ..dist.sharding import row_sharding

                m_sub = int(self._dev_codebooks.shape[0])
                if self._pq_packed:
                    m_sub //= 2
                codes_np = np.empty(
                    (self._capacity, m_sub), dtype=np.uint8
                )
                for lo in range(0, self._capacity, step):
                    codes_np[lo : lo + step] = np.asarray(_bucket(lo))
                self._dev_codes = jax.device_put(
                    codes_np, row_sharding(self._mesh, 2)
                )
                self._dev_sqnorms = jax.device_put(
                    sq, row_sharding(self._mesh, 1)
                )
                self._dev_valid = jax.device_put(
                    self._valid, row_sharding(self._mesh, 1)
                )
            else:
                parts = [
                    _bucket(lo)
                    for lo in range(0, self._capacity, step)
                ]
                self._dev_codes = (
                    jnp.concatenate(parts, axis=0)
                    if len(parts) > 1
                    else parts[0]
                )
                self._dev_sqnorms = jnp.asarray(sq)
                self._dev_valid = jnp.asarray(self._valid)
            # free the f32 fallback cache (the whole point is capacity)
            self._dev_values = None
            self._dev_scan = None
            self._dev_scan_scales = None
            self._precision_risky = False
            self._dirty_lo = self._dirty_hi = self._size
            self._mask_dirty = False
            self._pq_active = True
            return True
        if self._dirty_hi > self._dirty_lo:
            lo, hi = self._dirty_lo, self._dirty_hi
            burst = next_pow2(hi - lo)
            hi = min(self._capacity, lo + burst)
            lo = max(0, hi - burst)
            rows32 = jnp.asarray(self._values64[lo:hi], dtype=jnp.float32)
            # appended rows use the codebooks (and rotation) from the
            # last wholesale rebuild; the next capacity doubling retrains
            enc_rows = (
                rows32 @ self._pq_rot
                if self._pq_rot is not None
                else rows32
            )
            codes_burst = encode_rows(self._dev_codebooks, enc_rows)
            if self._pq_packed:
                from ..kernels.pq import pack_nibbles

                codes_burst = pack_nibbles(codes_burst)
            if self._mesh is not None:
                from ..dist.sharding import update_rows_sharded

                self._dev_sqnorms = update_rows_sharded(
                    self._dev_sqnorms,
                    np.asarray(row_sqnorms(rows32)),
                    lo,
                    mesh=self._mesh,
                )
                self._dev_codes = update_rows_sharded(
                    self._dev_codes,
                    np.asarray(codes_burst),
                    lo,
                    mesh=self._mesh,
                )
            else:
                self._dev_sqnorms = update_rows(
                    self._dev_sqnorms, row_sqnorms(rows32), lo
                )
                self._dev_codes = update_rows(
                    self._dev_codes, codes_burst, lo
                )
            self._dirty_lo = self._dirty_hi = self._size
        if self._mask_dirty:
            if self._mesh is not None:
                from ..dist.sharding import row_sharding

                self._dev_valid = jax.device_put(
                    self._valid, row_sharding(self._mesh, 1)
                )
            else:
                self._dev_valid = jnp.asarray(self._valid)
            self._mask_dirty = False
        self._pq_active = True
        return True

    # ------------------------------------------------------ IVF scale rung

    def _ivf_wanted(self) -> bool:
        """Gate for the IVF partitioned scan (kernels/ivf.py): explicit
        opt-out via VECTORLITE_IVF=0, otherwise auto-engage on corpora
        large enough that brute-force per-batch reads dominate
        (default 2M live rows; VECTORLITE_IVF_MIN_ROWS overrides —
        frontier measurements: BASELINE.md round 5, 8M section). Serves
        the f32/bf16 rungs AND the int8 capacity rung single-chip (the
        int8 layout carries per-row scales); the PQ rung keeps its ADC
        engine, and mesh serving keeps the sharded brute engines here
        (the sharded-IVF probe stage lives in dist/sharding.py
        sharded_search_ivf, exercised by the multichip dryrun)."""
        from ..utils import env_number

        if env_number("VECTORLITE_IVF", 1) != 1:
            return False
        # NOTE: deliberately NOT vetoed by _precision_risky — that flag
        # estimates displacement against the FULL corpus, and clustered
        # geometry (IVF's home turf) trips it even where measured brute
        # bf16 recall is 1.0000 (round-5 8M drive). IVF selection only
        # competes within the probed window, so _ivf_build re-runs the
        # same displacement statistic scaled to the window instead.
        if self._mesh is not None or self._pq:
            return False
        if jax.default_backend() not in ("tpu", "cpu"):
            return False
        if jax.default_backend() == "cpu" and not os.environ.get(
            "VECTORLITE_IVF_FORCE"
        ):
            return False  # CPU: tests only (the XLA gather formulation)
        min_rows = int(env_number("VECTORLITE_IVF_MIN_ROWS", 2_000_000))
        if self._count < max(min_rows, 4 * 128):
            return False
        # measured-recall refusal cache: the guard (_ivf_guard_nprobe)
        # found the corpus geometry unservable within the probe budget.
        # Retry only after the corpus doubles (distribution may change).
        if self._ivf_refused_at and self._count < 2 * self._ivf_refused_at:
            return False
        return True

    def _ivf_drop(self) -> None:
        self._ivf_rows = None
        self._ivf_scales = None
        self._ivf_slots = None
        self._ivf_sq = None
        self._ivf_valid = None
        self._ivf_extra = ()
        self._ivf_active = False
        self._ivf_hi = 0
        self._ivf_slots_np = None
        self._ivf_extra_slots_np = None
        self._ivf_nprobe_floor = 0
        # _ivf_refused_at intentionally survives drops: the refusal
        # cache is what keeps _ivf_wanted from re-running k-means every
        # sync on a corpus the guard already measured as unservable.

    def _sync_device_ivf(
        self, mask_was_dirty: bool, dirty_lo: int, dirty_hi: int
    ) -> None:
        """Maintain the IVF layout next to the rung buffers.

        Invariants: slots below ``_ivf_hi`` live in the partition
        layout (or its overflow extras); slots in ``[_ivf_hi, _size)``
        are the *tail*, brute-scanned by every IVF query. Appends
        therefore never touch the layout; the layout rebuilds wholesale
        when the tail outgrows its budget, when a dirty burst rewrote a
        row *below* the watermark (in-place update — rare), or after
        compaction renumbers slots (_compact drops the cache).
        Tombstone flips only refresh the gathered validity tables."""
        from ..utils import env_number

        if self._ivf_rows is not None:
            if dirty_hi > dirty_lo and dirty_lo < self._ivf_hi:
                self._ivf_drop()  # in-place rewrite below the watermark
            else:
                tail = self._size - self._ivf_hi
                tail_max = max(
                    int(env_number("VECTORLITE_IVF_TAIL_MAX", 131072)),
                    int(0.05 * self._count),
                )
                if tail > tail_max:
                    self._ivf_drop()
        if self._ivf_rows is None:
            self._ivf_build()
            return
        if mask_was_dirty:
            self._ivf_refresh_valid()

    def _ivf_guard_nprobe(
        self, live: np.ndarray, assign: np.ndarray
    ) -> Optional[int]:
        """Measured cell-recall auto-guard (the IVF analogue of
        `_bf16_selection_risky`). ``assign`` is the per-live-row cell
        the built layout actually stores each row in (spill-aware;
        -1 = extras, counted as unconditional hits since every probe
        scans the extras matrix). Partitioning only preserves recall
        when the corpus has locality structure — on iid high-D data the
        true neighbors' cells are nearly uncorrelated with the query's
        (measured 0.23 cell-recall at nprobe=16/C=512-rows-per-cell on
        iid gaussian vs 1.00 on clustered, round-4 bench), so engaging
        IVF there silently trades the brute engine's 0.998 recall for
        garbage. Before activating, sample live rows, compute their
        exact cosine top-k *within the sample*, and measure what
        fraction of those neighbors' cells the coarse quantizer ranks
        inside the probe window. Returns the smallest nprobe on the
        (default, 2x, 4x) ladder whose measured cell-recall clears
        ``VECTORLITE_IVF_GUARD_RECALL`` (default 0.985), or None to
        refuse activation. ``VECTORLITE_IVF_GUARD=0`` skips the guard
        (operators who have measured their own frontier)."""
        from ..kernels import ivf as _ivf
        from ..utils import env_number

        if env_number("VECTORLITE_IVF_GUARD", 1) != 1:
            return 0
        thr = float(env_number("VECTORLITE_IVF_GUARD_RECALL", 0.985))
        n_live = len(live)
        rng = np.random.default_rng(1)
        # Truth MUST come from the full corpus, not a sample: a 65K
        # sample of 8M leaves ~8 rows per locality neighborhood, so a
        # sampled row's "within-sample top-10" is mostly cross-cluster
        # near-strangers whose cells are uncorrelated with the probe
        # window — the guard then refuses valid geometry at exactly
        # the scale IVF exists for (round-5 8M drive: active=False on
        # the clustered corpus that measures cell-recall 1.0 against
        # full-corpus truth). 64 queries x n_live blocked f32 matmul
        # costs ~10-20 s on one core — noise next to the k-means build.
        nq = int(np.clip(n_live // 8, 1, 64))
        qsel = rng.choice(n_live, nq, replace=False)
        qrows = self._values64[live[qsel]].astype(np.float32)
        qn = np.maximum(np.linalg.norm(qrows, axis=1, keepdims=True),
                        1e-30)
        q = qrows / qn
        k_t = min(10, n_live - 1)
        step = 1 << 20
        top_s = np.full((nq, 0), 0.0, np.float32)
        top_p = np.full((nq, 0), 0, np.int64)
        for lo in range(0, n_live, step):
            blk = self._values64[live[lo : lo + step]].astype(np.float32)
            bn = np.maximum(np.linalg.norm(blk, axis=1), 1e-30)
            s = (q @ blk.T) / bn[None, :]
            m = s.shape[1]
            kk = min(k_t + 1, m)  # +1 so the self-hit can be dropped
            part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
            top_s = np.concatenate(
                [top_s, np.take_along_axis(s, part, axis=1)], axis=1
            )
            top_p = np.concatenate([top_p, part + lo], axis=1)
        # drop self-hits, keep the global top-k_t positions (into live)
        top_s = np.where(top_p == qsel[:, None], -np.inf, top_s)
        keep = np.argpartition(-top_s, k_t - 1, axis=1)[:, :k_t]
        truth = np.take_along_axis(top_p, keep, axis=1)
        truth_cells = assign[truth]  # [nq, k_t]
        # query -> ranked cells by the serving surrogate (cosine)
        cents = np.asarray(self._ivf_centroids, dtype=np.float32)
        csq = np.maximum(np.einsum("cd,cd->c", cents, cents), 1e-30)
        crank = (q @ cents.T) / np.sqrt(csq)[None, :]
        order = np.argsort(-crank, axis=1)
        c = cents.shape[0]
        base = int(
            np.clip(int(env_number("VECTORLITE_IVF_NPROBE", _ivf.NPROBE)),
                    1, c)
        )
        for mult in (1, 2, 4):
            l_probe = min(base * mult, c)
            window = order[:, :l_probe]
            # cell -1 = the row lives in the extras matrix, which every
            # probe brute-scans — an unconditional hit
            hits = sum(
                float(
                    (
                        np.isin(truth_cells[i], window[i])
                        | (truth_cells[i] < 0)
                    ).sum()
                )
                for i in range(nq)
            )
            if hits / (nq * k_t) >= thr:
                return l_probe if mult > 1 else 0
            if l_probe == c:
                break
        return None

    def _ivf_build(self) -> None:
        """Wholesale layout build: k-means coarse centroids (trained on
        a live-row sample, retrained only when the partition count
        changes), nearest-centroid assignment of every live row, then
        the partition-contiguous bf16 copy uploaded in bounded chunks
        (no full-corpus staging temp — same rule as the PQ encoder)."""
        from ..kernels import ivf as _ivf
        from ..utils import env_number

        import ml_dtypes

        live = np.nonzero(self._valid[: self._size])[0]
        n_live = len(live)
        part_rows = max(64, int(env_number("VECTORLITE_IVF_PART_ROWS", 512)))
        c = int(np.clip(next_pow2(max(1, n_live // part_rows)), 64, 65536))
        if (
            self._ivf_centroids is None
            or int(self._ivf_centroids.shape[0]) != c
        ):
            sample_n = min(
                n_live,
                max(
                    int(env_number("VECTORLITE_IVF_TRAIN_SAMPLE", 262144)),
                    2 * c,
                ),
            )
            if sample_n < n_live:
                sel = np.random.default_rng(0).choice(
                    live, sample_n, replace=False
                )
                sel.sort()
            else:
                sel = live
            sample32 = self._values64[sel].astype(np.float32)
            self._ivf_centroids = _ivf.train_centroids(
                sample32,
                c,
                iters=int(env_number("VECTORLITE_IVF_ITERS", 8)),
            )
            self._ivf_cent_sq = jnp.sum(
                self._ivf_centroids * self._ivf_centroids, axis=1
            )
        # top-2 assignment: build_layout spills over-full cells' rows
        # to their runner-up cell before falling to the brute-scanned
        # extras (k-means skew on tight clusters measured 25% of a 2M
        # corpus in extras under single assignment, round 5)
        assign2 = _ivf.assign_rows(
            self._values64, live, self._ivf_centroids, top2=True
        )
        part_slots, extra_slots = _ivf.build_layout(
            assign2,
            live,
            c,
            pad_factor=float(env_number("VECTORLITE_IVF_PAD", 1.25)),
        )
        cp, p_width = part_slots.shape[0] * part_slots.shape[1], (
            part_slots.shape[1]
        )
        # the guard measures the layout that will actually serve:
        # per-row placement derived from part_slots (spilled rows sit
        # in their runner-up cell; -1 = extras, which every probe
        # scans, so the guard counts them as unconditional hits)
        cells_of = np.repeat(
            np.arange(c, dtype=np.int32), p_width
        )
        flat_tmp = part_slots.reshape(-1)
        in_layout = flat_tmp >= 0
        slot_cell = np.full(self._size, -1, dtype=np.int32)
        slot_cell[flat_tmp[in_layout]] = cells_of[in_layout]
        floor = self._ivf_guard_nprobe(live, slot_cell[live])
        if floor is None:
            # measured cell-recall can't reach the bar within the probe
            # budget (e.g. iid high-D corpora, where ANY partitioning
            # scheme must scan a large fraction for high recall —
            # measured 0.23 cell-recall at nprobe=16 on iid gaussian vs
            # 1.0 on clustered, bench round 4). Brute amk keeps serving
            # at its measured 0.998+ recall; retry once the corpus
            # doubles (_ivf_wanted).
            self._ivf_refused_at = self._count
            self._ivf_drop()
            logger.info(
                "IVF guard: cell-recall below target within the probe "
                "budget at %d rows; keeping the brute engine",
                self._count,
            )
            return
        self._ivf_nprobe_floor = floor
        if self._precision_risky:
            # The full-corpus displacement estimate refused reduced-
            # precision selection, but IVF ranks within ~nprobe*P rows;
            # re-run the same statistic with the window as the
            # competing population (round-5: the clustered 8M corpus
            # estimates risky at 8M competitors yet measures brute
            # bf16 recall 1.0000 — the estimate is pessimistic by the
            # density ratio). Refuse only if even the window fails.
            base_np = int(
                np.clip(
                    int(env_number("VECTORLITE_IVF_NPROBE", _ivf.NPROBE)),
                    1,
                    c,
                )
            )
            window_rows = max(base_np, floor) * p_width
            if _bf16_selection_risky(
                self._values64,
                self._valid,
                self._size,
                competitor_rows=window_rows,
            ):
                self._ivf_refused_at = self._count
                self._ivf_drop()
                logger.info(
                    "IVF guard: window-scaled precision displacement "
                    "still above target at %d rows; keeping the exact "
                    "engine",
                    self._count,
                )
                return
        ps_flat = part_slots.reshape(-1)
        # layout dtype follows the rung: the int8 capacity rung gets an
        # int8 partition copy + per-row scales (capacity AND partitioned
        # speed at 8M+ — VERDICT r4 item 5); f32/bf16 rungs keep bf16
        # UNLESS storage + a bf16 layout would bust the HBM budget — at
        # the 8M bf16 rung the 1.25x-padded bf16 layout is ~7.9 GB on
        # top of 6 GB storage and XLA OOMed at 17.1/15.75 GB (round-5
        # drive). The layout only RANKS within the probed window (the
        # int8 1M frontier measured 0.9998 with the same 128-pool exact
        # rescore, and windows are ~1000x smaller populations), so int8
        # is the right fallback: half the bytes, candidates still
        # rescore from the full-precision rows.
        layout_i8 = bool(self._quantized)
        if not layout_i8:
            storage_bytes = self._capacity * self.dim * (
                2 if self._device_dtype == jnp.bfloat16 else 4
            )
            if self._dev_scan is not None:
                storage_bytes += self._dev_scan.size * (
                    self._dev_scan.dtype.itemsize
                )
            layout_bf16_bytes = cp * self.dim * 2
            layout_i8 = (
                storage_bytes + layout_bf16_bytes > _hbm_budget_bytes()
            )
        rows_dev = jnp.zeros(
            (cp, self.dim), dtype=jnp.int8 if layout_i8 else jnp.bfloat16
        )
        scales_np = np.zeros(cp, dtype=np.float32) if layout_i8 else None
        sq_np = np.zeros(cp, dtype=np.float32)
        chunk = 262144
        for lo in range(0, cp, chunk):
            sl = ps_flat[lo : lo + chunk]
            cl = np.maximum(sl, 0)
            rows32 = self._values64[cl].astype(np.float32)
            rows32[sl < 0] = 0.0
            sq_np[lo : lo + chunk] = np.einsum(
                "nd,nd->n", rows32, rows32
            )
            if layout_i8:
                q8, qs = _quantize_rows_int8_np(rows32)
                scales_np[lo : lo + chunk] = qs
                rows_dev = update_rows(rows_dev, jnp.asarray(q8), lo)
            else:
                rows_dev = update_rows(
                    rows_dev,
                    jnp.asarray(rows32.astype(ml_dtypes.bfloat16)),
                    lo,
                )
        self._ivf_rows = rows_dev
        self._ivf_scales = (
            jnp.asarray(scales_np) if layout_i8 else None
        )
        self._ivf_slots = jnp.asarray(ps_flat.astype(np.int32))
        self._ivf_sq = jnp.asarray(sq_np)
        self._ivf_slots_np = ps_flat
        # overflow extras, padded to a lane multiple
        e = len(extra_slots)
        e_pad = max(128, next_pow2(e)) if e else 0
        if e_pad:
            ex32 = np.zeros((e_pad, self.dim), dtype=np.float32)
            ex32[:e] = self._values64[extra_slots].astype(np.float32)
            ex_slots = np.zeros(e_pad, dtype=np.int32)
            ex_slots[:e] = extra_slots
            ex_valid = np.zeros(e_pad, dtype=bool)
            ex_valid[:e] = self._valid[extra_slots]
            if layout_i8:
                ex8, ex_sc = _quantize_rows_int8_np(ex32)
                ex_rows_dev = jnp.asarray(ex8)
                ex_scales_dev = jnp.asarray(ex_sc)
            else:
                ex_rows_dev = jnp.asarray(ex32.astype(ml_dtypes.bfloat16))
                ex_scales_dev = None
            self._ivf_extra = (
                ex_rows_dev,
                jnp.asarray(ex_slots),
                jnp.asarray(np.einsum("nd,nd->n", ex32, ex32)),
                jnp.asarray(ex_valid),
                ex_scales_dev,
            )
        else:
            self._ivf_extra = (
                jnp.zeros(
                    (0, self.dim),
                    dtype=jnp.int8 if layout_i8 else jnp.bfloat16,
                ),
                jnp.zeros(0, dtype=jnp.int32),
                jnp.zeros(0, dtype=jnp.float32),
                jnp.zeros(0, dtype=bool),
                jnp.zeros(0, dtype=jnp.float32) if layout_i8 else None,
            )
        self._ivf_extra_slots_np = extra_slots
        self._ivf_p = p_width
        self._ivf_hi = self._size
        self._ivf_valid = jnp.asarray(
            (ps_flat >= 0) & self._valid[np.maximum(ps_flat, 0)]
        )
        self._ivf_active = True
        self._ivf_refused_at = 0

    def _ivf_refresh_valid(self) -> None:
        """Tombstone flips: re-gather the layout validity tables from
        the host mask (the layout itself is untouched)."""
        ps = self._ivf_slots_np
        self._ivf_valid = jnp.asarray(
            (ps >= 0) & self._valid[np.maximum(ps, 0)]
        )
        ex = self._ivf_extra_slots_np
        if len(ex):
            rows, slots, sq, old_valid, ex_sc = self._ivf_extra
            e_pad = int(old_valid.shape[0])
            ex_valid = np.zeros(e_pad, dtype=bool)
            ex_valid[: len(ex)] = self._valid[ex]
            self._ivf_extra = (
                rows, slots, sq, jnp.asarray(ex_valid), ex_sc
            )

    def _ivf_topk(
        self, queries: jax.Array, k_pad: int, metric: SimilarityMetric
    ):
        """Dispatch the IVF serving step, or return None when brute
        amk is the better program for this batch (probed bytes would
        exceed ~half the corpus read: IVF probe traffic scales with
        B * nprobe * P while brute's one corpus read amortizes over
        the whole batch)."""
        from ..kernels import ivf as _ivf
        from ..kernels.amk import K_SEL_MIN
        from ..utils import env_number

        b = int(queries.shape[0])
        c = int(self._ivf_cent_sq.shape[0])
        nprobe = int(
            np.clip(
                max(
                    int(env_number("VECTORLITE_IVF_NPROBE", _ivf.NPROBE)),
                    self._ivf_nprobe_floor,  # guard-measured recall floor
                ),
                1,
                c,
            )
        )
        if b * nprobe * self._ivf_p > max(1, self._count) // 2:
            return None
        tail_len = self._size - self._ivf_hi
        tail_pad = 0 if tail_len <= 0 else max(256, next_pow2(tail_len))
        k_sel = min(
            nprobe * self._ivf_p, max(K_SEL_MIN, next_pow2(2 * k_pad))
        )
        tomb = self._count != self._size
        ex_rows, ex_slots, ex_sq, ex_valid, ex_scales = self._ivf_extra
        return _ivf.ivf_search_topk_rescored(
            self._ivf_rows,
            self._ivf_slots,
            self._ivf_sq,
            self._ivf_valid,
            self._ivf_centroids,
            self._ivf_cent_sq,
            ex_rows,
            ex_slots,
            ex_sq,
            ex_valid,
            self._dev_values,
            self._dev_valid,
            queries,
            jnp.int32(self._ivf_hi),
            jnp.int32(self._size),
            part_scales=self._ivf_scales,
            extra_scales=ex_scales,
            values_scales=self._dev_scales if self._quantized else None,
            metric=metric,
            k=k_pad,
            k_sel=k_sel,
            nprobe=nprobe,
            p_width=self._ivf_p,
            tail_pad=tail_pad,
            use_pallas=jax.default_backend() == "tpu",
            tombstones=tomb,
        )

    def _sync_device_mesh(self) -> None:
        """Mesh placement: full builds device_put host slices shard-by-shard
        (no single-device staging, so corpora larger than one chip's HBM
        work); insert bursts ride a per-shard scatter (no re-placement)."""
        from ..dist.sharding import row_sharding, update_rows_sharded

        mesh = self._mesh
        if self._dev_values is None:
            v32 = self._values64.astype(np.float32)
            # same bf16-selection auto-guard as single-chip: risky
            # corpora refuse the scan copy and serve per-shard exact
            from ..utils import env_number

            if (
                self._capacity >= _PALLAS_MIN_CAPACITY
                and env_number("VECTORLITE_SPEED_GUARD", 1) == 1
            ):
                self._precision_risky = _bf16_selection_risky(
                    v32, self._valid, self._size
                )
            else:
                self._precision_risky = False
            sq = np.einsum("nd,nd->n", v32, v32).astype(np.float32)
            if self._quantized:
                q, scales = _quantize_rows_int8_np(v32)
                self._dev_values = jax.device_put(q, row_sharding(mesh, 2))
                self._dev_scales = jax.device_put(
                    scales, row_sharding(mesh, 1)
                )
            else:
                self._dev_values = jax.device_put(
                    v32.astype(self._device_dtype), row_sharding(mesh, 2)
                )
            if (
                not self._quantized
                and self._device_dtype == jnp.float32
                and self._scan_copy_wanted()
            ):
                import ml_dtypes

                self._dev_scan = jax.device_put(
                    v32.astype(ml_dtypes.bfloat16), row_sharding(mesh, 2)
                )
            else:
                self._dev_scan = None
                self._dev_scan_scales = None
            self._dev_sqnorms = jax.device_put(sq, row_sharding(mesh, 1))
            self._dev_valid = jax.device_put(
                self._valid, row_sharding(mesh, 1)
            )
            self._dirty_lo = self._dirty_hi = self._size
            self._mask_dirty = False
            return
        if self._dirty_hi > self._dirty_lo:
            lo, hi = self._dirty_lo, self._dirty_hi
            burst = next_pow2(hi - lo)
            hi = min(self._capacity, lo + burst)
            lo = max(0, hi - burst)
            rows32 = self._values64[lo:hi].astype(np.float32)
            sq = np.einsum("nd,nd->n", rows32, rows32).astype(np.float32)
            self._dev_sqnorms = update_rows_sharded(
                self._dev_sqnorms, sq, lo, mesh=mesh
            )
            if self._quantized:
                rows_q, row_scales = _quantize_rows_int8_np(rows32)
                self._dev_values = update_rows_sharded(
                    self._dev_values, rows_q, lo, mesh=mesh
                )
                self._dev_scales = update_rows_sharded(
                    self._dev_scales, row_scales, lo, mesh=mesh
                )
            else:
                self._dev_values = update_rows_sharded(
                    self._dev_values,
                    rows32.astype(self._device_dtype),
                    lo,
                    mesh=mesh,
                )
                if self._dev_scan is not None:
                    import ml_dtypes

                    self._dev_scan = update_rows_sharded(
                        self._dev_scan,
                        rows32.astype(ml_dtypes.bfloat16),
                        lo,
                        mesh=mesh,
                    )
            self._dirty_lo = self._dirty_hi = self._size
        if self._mask_dirty:
            self._dev_valid = jax.device_put(
                self._valid, row_sharding(mesh, 1)
            )
            self._mask_dirty = False

    # ----------------------------------------------------------- persistence

    def index_to_json(self) -> dict:
        """Reference serde shape: ``{"dim": D, "data": [Vector...]}``
        (reference: src/index/flat.rs:59-65), vectors in insertion order.

        ``data`` is a :class:`FlatRowsView` — a lazy, list-compatible
        snapshot that references the truth matrix instead of copying
        every row: a save never holds a second copy of the corpus in
        RAM (the point of the VECTORLITE_HOST_TRUTH_DIR memmap mode,
        where the matrix may exceed host RAM). Rendering after the read
        lock drops is safe because the matrix generation captured here
        is immutable below the captured size (appends write past it;
        grow and compact swap in fresh buffers; delete/update only
        touch the id/text/meta tables, which ARE copied here)."""
        live = np.nonzero(self._valid[: self._size])[0]
        return {
            "dim": self.dim,
            "data": FlatRowsView(
                ids=self._ids[live],
                slots=live,
                values=self._values64,
                texts=[self._texts[s] or "" for s in live],
                metas=[self._metas[s] for s in live],
            ),
        }

    @classmethod
    def index_from_json(cls, obj: dict, **kwargs) -> "FlatIndex":
        dim = int(obj["dim"])
        rows = obj.get("data", [])
        # Bulk path: the native .vlc parser (persist/vlc.py) delivers
        # values as f64 ndarrays — one stack + one add_batch_arrays
        # instead of N Python-level add() calls (matters at 1M rows).
        # Validation semantics (dimension, duplicate ids) are identical.
        if rows and all(
            isinstance(r.get("values"), np.ndarray)
            and r["values"].ndim == 1
            and r["values"].shape[0] == dim
            for r in rows
        ):
            index = cls(dim, **kwargs)
            vals = [r["values"] for r in rows]
            mat = _rows_as_matrix(vals, dim)
            if mat is None:
                mat = np.stack(vals).astype(np.float64, copy=False)
            index.add_batch_arrays(
                [int(r["id"]) for r in rows],
                mat,
                texts=[r["text"] for r in rows],
                metadatas=[r.get("metadata") for r in rows],
            )
            return index
        # np.asarray converts each values list at C speed; Vector accepts
        # array values everywhere (add() re-asarrays into the f64 store)
        vectors = [
            Vector(
                id=int(v["id"]),
                values=np.asarray(v["values"], dtype=np.float64),
                text=v["text"],
                metadata=v.get("metadata"),
            )
            for v in rows
        ]
        return cls(dim, vectors, **kwargs)
