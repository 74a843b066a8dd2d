"""Product-quantization serving rung: codebook training, encoding, and
MXU one-hot ADC search.

Extends the Flat index capacity ladder (f32 -> bf16 -> int8, see
index/flat.py) with a ~16x-compressed rung. Two code widths:

* **4-bit (default)** — kc=16 centroids over dsub=2-dim subspaces
  (M = dim/2), two codes nibble-packed per byte: 96 bytes/row at
  384-d. The ScaNN-style config (see PAPERS.md): same bytes/row as
  8-bit at M=dim/4 but a 16x-smaller one-hot contraction, which is
  what makes the MXU formulation fast.
* **8-bit** — kc=256 over dsub=4 subspaces, one byte per code
  (VECTORLITE_PQ_BITS=8).

10M rows fit in ~1 GB of HBM; winners are ALWAYS re-scored in exact
f64 on the host from the uncompressed truth (the same `_exact_rescore`
contract the int8 rung uses), so returned scores match the scalar
reference formulas (reference: src/lib.rs:425-572) and only *ranking*
is approximate.

TPU mapping (round-3 hardware lesson: per-element LUT *gathers* and
per-chunk sorts are the two things the VPU cannot do — the textbook
CPU-ADC loop measured 861 ms/batch at 1M x 384 b=256; this design
replaced it):

* **Training** is Lloyd's k-means scanned over subspaces — assignment
  and the centroid update are both matmuls ([S,kc] distance +
  one-hot.T @ X), so the whole trainer runs on the MXU under one jit.
* **Encoding** is the same assignment matmul, chunked to a fixed shape.
* **Search** (`pq_search_topk`) builds a per-query LUT ([B, M, kc],
  one einsum), evaluates every lookup as ONE bf16 matmul per chunk
  against the on-the-fly one-hot of the codes, selects with
  ``approx_max_k`` fused onto the matmul epilogue (the amk engine's
  PartialReduce), and exact-f32-rescores the merged pool — no [B, N]
  intermediate, no sort, no gather on the scan path.
* Cosine/euclidean rank on the ADC dot plus the EXACT stored f32
  squared norms (4 bytes/row; better than reconstruction norms).
  Manhattan uses a per-subspace L1 LUT — all four metrics are ADC-able.
"""

from __future__ import annotations

import os
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.metrics import SimilarityMetric

NEG_INF = float("-inf")

#: codes per codebook; one uint8 per subspace.
K_CODES = 256


def rotation_matrix(dim: int, seed: int = 0) -> np.ndarray:
    """Seeded random orthonormal rotation [D, D] f32, applied before the
    subspace split (OPQ-lite). Real embedding corpora are anisotropic —
    a few dominant directions concentrate variance in a few subspaces
    and plain PQ's recall collapses there (measured 0.76 -> 1.0 on an
    eigen-decay corpus at 384-d/M=96, tests/test_pq.py). A random
    rotation spreads variance evenly across subspaces, is
    data-independent (stable under corpus drift, nothing to retrain),
    and preserves dot/cosine/euclidean exactly (orthogonal invariance;
    the stored exact norms stay valid). Manhattan is NOT rotation-
    invariant, so with rotation active the index selects manhattan
    candidates via the rotation-invariant dot+norms (euclidean) proxy
    instead of rotated-L1 (measured pool recall 0.90 vs 0.86 on an
    eigen-decay corpus; plain unrotated L1 ADC is dim-separable and
    scores 1.0 there — VECTORLITE_PQ_ROTATE=0 is the right call for
    L1-dominated workloads, documented)."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    return q.astype(np.float32)


def pq_subspaces(dim: int, m_requested: int) -> int:
    """Largest divisor of ``dim`` that is <= m_requested (every subspace
    must get an equal, whole number of dims)."""
    m = max(1, min(int(m_requested), dim))
    while dim % m:
        m -= 1
    return m


def _kmeans_subspace(x, init, key, *, iters: int):
    """Lloyd's iterations for one subspace: x [S, d], init [kc, d].
    Empty clusters are re-seeded from random sample rows (a common
    PQ-codebook refinement; without it dead centroids waste code
    space)."""
    s = x.shape[0]
    kc = init.shape[0]
    xsq = jnp.sum(x * x, axis=1)  # [S]

    def step(carry, key_i):
        c = carry
        csq = jnp.sum(c * c, axis=1)  # [kc]
        # [S, kc] squared distances via the MXU
        d2 = xsq[:, None] - 2.0 * (x @ c.T) + csq[None, :]
        assign = jnp.argmin(d2, axis=1)  # [S]
        onehot = (
            assign[:, None] == jnp.arange(kc)[None, :]
        ).astype(x.dtype)
        counts = jnp.sum(onehot, axis=0)  # [kc]
        sums = onehot.T @ x  # [kc, d]
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # dead centroid -> random row (keeps all kc codes useful)
        reseed = x[jax.random.randint(key_i, (kc,), 0, s)]
        new_c = jnp.where((counts > 0)[:, None], new_c, reseed)
        return new_c, None

    keys = jax.random.split(key, iters)
    final, _ = jax.lax.scan(step, init, keys)
    return final


@partial(jax.jit, static_argnames=("iters",))
def _kmeans_all(x, init, keys, *, iters: int):
    """Sequential scan over subspaces (NOT vmap: M concurrent lanes
    would materialize an [M, S, 256] assignment temp; one lane's
    [S, 256] at a time keeps the trainer's footprint flat)."""
    def one(carry, xs):
        x_m, init_m, key_m = xs
        return carry, _kmeans_subspace(x_m, init_m, key_m, iters=iters)

    _, cbs = jax.lax.scan(one, None, (x, init, keys))
    return cbs


def train_codebooks(
    sample32: np.ndarray,  # [S, D] f32 live-row sample
    m: int,
    *,
    kc: int = K_CODES,
    iters: int = 10,
    seed: int = 0,
) -> jax.Array:
    """Learn per-subspace codebooks [M, kc, dsub] (f32, on device).

    Init is a random distinct-row draw per subspace; S should be >= a
    few thousand (the index gates the PQ rung on a minimum corpus
    size). ``kc`` is the codebook size: 256 for classic byte codes,
    16 for the 4-bit profile (two codes per stored byte)."""
    s, dim = sample32.shape
    dsub = dim // m
    x = jnp.asarray(sample32, dtype=jnp.float32).reshape(s, m, dsub)
    x = jnp.transpose(x, (1, 0, 2))  # [M, S, dsub]
    key = jax.random.PRNGKey(seed)
    k_init, k_seed = jax.random.split(key)
    # distinct init rows per subspace (with replacement only when S<kc,
    # which the caller's minimum-size gate prevents)
    idx = jax.random.permutation(k_init, s)[:kc]
    init = x[:, idx % s, :]  # [M, kc, dsub]
    return _kmeans_all(
        x, init, jax.random.split(k_seed, m), iters=iters
    )


def pack_nibbles(codes) -> jax.Array:
    """[N, M] 4-bit codes (values 0..15) -> [N, M/2] packed bytes.

    Byte j holds code 2j in the high nibble and 2j+1 in the low one.
    M must be even (the index keeps codes unpacked for odd M)."""
    codes = jnp.asarray(codes, jnp.uint8)
    n, m = codes.shape
    pairs = codes.reshape(n, m // 2, 2)
    return (pairs[:, :, 0] << 4) | pairs[:, :, 1]


def _unpack_nibbles(packed):
    """[N, M/2] packed bytes -> [N, M] codes; inverse of pack_nibbles."""
    n = packed.shape[0]
    hi = packed >> 4
    lo = packed & jnp.uint8(0xF)
    return jnp.stack([hi, lo], axis=2).reshape(n, -1)


@jax.jit
def encode_rows(codebooks: jax.Array, rows32: jax.Array) -> jax.Array:
    """Nearest-centroid codes: rows [N, D] f32 -> uint8 [N, M].

    Scanned over subspaces (one [N, 256] distance temp at a time; a
    vmap would batch all M). Callers chunk N — the index encodes in
    fixed 131072-row buckets so the temp stays ~134 MB and the jit
    cache stays small."""
    n = rows32.shape[0]
    m, _k, dsub = codebooks.shape
    x = rows32.reshape(n, m, dsub)
    x = jnp.transpose(x, (1, 0, 2))  # [M, N, dsub]

    def sub(carry, xc):
        xs, cs = xc  # [N, dsub], [256, dsub]
        d2 = (
            jnp.sum(xs * xs, axis=1)[:, None]
            - 2.0 * (xs @ cs.T)
            + jnp.sum(cs * cs, axis=1)[None, :]
        )
        return carry, jnp.argmin(d2, axis=1).astype(jnp.uint8)

    _, codes = jax.lax.scan(sub, None, (x, codebooks))
    return jnp.transpose(codes)  # [N, M]


def _adc_lut(queries, codebooks, metric):
    """Per-query lookup tables [B, M, 256]: dot tables for the matmul
    metrics, |q - c| L1 tables for manhattan."""
    b = queries.shape[0]
    m, _k, dsub = codebooks.shape
    q = queries.reshape(b, m, dsub)
    if metric is SimilarityMetric.MANHATTAN:
        # [B, M, 256, dsub] reduces immediately; at B=256/M=48 the
        # peak temp is ~100 MB — fine, it never scales with N
        return jnp.sum(
            jnp.abs(q[:, :, None, :] - codebooks[None]), axis=-1
        )
    return jnp.einsum("bmd,mcd->bmc", q, codebooks)


#: extra surrogate-ranked candidates carried into the exact-f32 ADC
#: rescore so bf16 selection error at the pool boundary cannot evict a
#: true ADC top-k member (same margin idea as amk.K_SEL_MIN, but the
#: displacement here is only bf16 LUT rounding, not corpus rounding)
_EXACT_MARGIN = 32


#: corpus-tile rows per Pallas grid step (must divide the chunk width)
_PQ_TILE = 1024

#: Mosaic's default scoped-VMEM limit (16 MiB) is too small for the
#: one-hot expansion value; mirror pallas_scan's raised budget.
_PQ_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024
)


def pq_pallas_default() -> bool:
    """Whether PQ selection should ride the fused Pallas rank kernel:
    real TPU backend (the XLA formulation is correct everywhere; the
    Pallas kernel exists to kill the one-hot HBM materialization, a
    TPU-only cost) and not explicitly disabled."""
    if os.environ.get("VECTORLITE_PQ_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _lut_flat_pallas(lut_sel_bf16: jax.Array, *, packed: bool) -> jax.Array:
    """Permute the [B, M, kc] selection LUT into the flat lane order the
    Pallas rank kernel's on-the-fly one-hot uses.

    The kernel expands a codes tile by LANE-TILING the stored byte
    matrix (``jnp.tile`` — the only cheap whole-row broadcast on the
    VPU), so one-hot column ``j`` decomposes as ``rblk = j // ms_pad``,
    ``m = j % ms_pad`` with the CENTROID in the major position:

      packed:   rblk = 2*c + h  ->  column j <-> lut[:, 2*m + h, c]
                (h = 0 selects the byte's HIGH nibble = even subspace,
                 matching pack_nibbles' ``code_{2j} << 4`` order)
      unpacked: rblk = c        ->  column j <-> lut[:, m, c]

    Stored-byte columns are zero-padded up to a 128 multiple so every
    VMEM layout in the kernel is lane-aligned; the padded LUT columns
    are zero, so padding bytes (nibbles 0/0) contribute exactly 0 to
    the ADC sum for every metric."""
    b, m, kc = lut_sel_bf16.shape
    if packed:
        ms = m // 2
        ms_pad = _round_up(ms, 128)
        lr = lut_sel_bf16.reshape(b, ms, 2, kc)
        lr = jnp.pad(lr, ((0, 0), (0, ms_pad - ms), (0, 0), (0, 0)))
        # -> [B, kc, 2, ms_pad]; flat column = (2c + h) * ms_pad + m
        return jnp.transpose(lr, (0, 3, 2, 1)).reshape(
            b, kc * 2 * ms_pad
        )
    m_pad = _round_up(m, 128)
    lr = jnp.pad(lut_sel_bf16, ((0, 0), (0, m_pad - m), (0, 0)))
    return jnp.transpose(lr, (0, 2, 1)).reshape(b, kc * m_pad)


def _pq_rank_kernel(
    lut_ref,  # [B, reps * ms_pad] bf16 (permuted; negated for manhattan)
    codes_ref,  # [TILE, ms_pad] uint8
    sq_ref,  # [TILE // 128, 128] f32 exact squared norms, lane-packed
    valid_ref,  # [TILE // 128, 128] int8 validity, lane-packed
    out_ref,  # [B, TILE] f32 selection rank
    *,
    metric: SimilarityMetric,
    kc: int,
    packed: bool,
    tile_n: int,
):
    """One corpus tile of the PQ selection rank, fused in VMEM.

    The XLA formulation materializes the [chunk, M*kc] one-hot operand
    in HBM (kOutput fusion feeding the convolution — ~2x the whole
    kernel's HBM traffic; see pq_search_topk's docstring). Here the
    expansion lives and dies in VMEM: lane-tile the raw code bytes
    (jnp.tile — the proven fold-kernel broadcast), decode the nibble
    arithmetically, compare against the lane's (centroid, half) id, and
    feed the bf16 one-hot straight into the MXU contraction with the
    permuted LUT. The selection surrogate (kernels/amk.py derivation)
    and the validity mask fuse into the same step, so the only HBM
    traffic is the code bytes in and the [B, chunk] rank out."""
    u = codes_ref[:].astype(jnp.int32)  # [T, ms_pad]
    ms_pad = u.shape[1]
    reps = 2 * kc if packed else kc
    u_rep = jnp.tile(u, (1, reps))  # [T, reps * ms_pad]
    j = jax.lax.broadcasted_iota(jnp.int32, u_rep.shape, 1)
    rblk = j // ms_pad
    if packed:
        c = rblk >> 1
        nib = jnp.where(rblk & 1 == 0, (u_rep >> 4) & 0xF, u_rep & 0xF)
        oh = (nib == c).astype(jnp.bfloat16)
    else:
        oh = (u_rep == rblk).astype(jnp.bfloat16)
    adc = jax.lax.dot_general(
        lut_ref[:],
        oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, T]
    rank = _rank_surrogate(adc, metric, sq_ref[:].reshape(1, tile_n))
    ok = valid_ref[:].reshape(1, tile_n) != 0
    out_ref[:] = jnp.where(ok, rank, NEG_INF)


def _pallas_chunk_rank(
    lut_flat,  # [B, reps * ms_pad] bf16
    codes_chunk,  # [chunk, ms_pad] uint8 (lane-padded)
    sq_chunk,  # [chunk] f32
    valid_chunk,  # [chunk] bool
    *,
    metric: SimilarityMetric,
    kc: int,
    packed: bool,
    tile_n: int,
    interpret: bool,
):
    """[B, chunk] selection rank via the fused Pallas kernel."""
    chunk, ms_pad = codes_chunk.shape
    b, lanes = lut_flat.shape
    kernel = partial(
        _pq_rank_kernel, metric=metric, kc=kc, packed=packed,
        tile_n=tile_n,
    )
    return pl.pallas_call(
        kernel,
        grid=(chunk // tile_n,),
        in_specs=[
            pl.BlockSpec(
                (b, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, ms_pad),
                lambda j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n // 128, 128),
                lambda j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n // 128, 128),
                lambda j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, chunk), jnp.float32),
        compiler_params=_PQ_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * chunk * lanes,
            bytes_accessed=chunk * ms_pad + b * lanes * 2 + b * chunk * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        lut_flat,
        codes_chunk,
        sq_chunk.reshape(chunk // 128, 128),
        valid_chunk.astype(jnp.int8).reshape(chunk // 128, 128),
    )


def _rank_surrogate(adc, metric, sq):
    """Monotonic selection surrogate on the ADC dot (see kernels/amk.py
    for the derivation; PQ ranks the same way — division/sqrt never
    ride the [B, chunk] fusion). `sq` must already be 2-D ([1, chunk]).

    MANHATTAN passes through: the -L1 sign is baked into the bf16 LUT
    operand upstream (pq_search_topk), so the ADC dot is already the
    rank — negating again here would be wrong.
    """
    if metric is SimilarityMetric.COSINE:
        return adc * jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
    if metric is SimilarityMetric.EUCLIDEAN:
        return adc - 0.5 * sq
    return adc  # DOT_PRODUCT, or MANHATTAN on the pre-negated LUT


@partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "chunk", "packed", "pallas", "tile_n", "interpret"
    ),
)
def pq_search_topk(
    codes: jax.Array,  # [cap, M] uint8 (or [cap, M/2] when packed)
    codebooks: jax.Array,  # [M, kc, dsub] f32
    sqnorms: jax.Array,  # [cap] f32 EXACT row squared norms
    valid: jax.Array,  # [cap] bool
    queries: jax.Array,  # [B, D] f32
    *,
    metric: SimilarityMetric,
    k: int,
    chunk: int = 65536,
    packed: bool = False,
    pallas: bool = False,
    tile_n: int = _PQ_TILE,
    interpret: bool = False,
):
    """MXU ADC top-k: (scores [B, k], slots [B, k]).

    Round-3 hardware finding: the textbook per-subspace LUT *gather*
    formulation is pathological on TPU (lane-axis dynamic gathers, and
    lax.top_k's full sort per chunk — measured 861 ms/batch at
    1M x 384 b=256). The TPU-native formulation is matmul-as-lookup:

    * **Selection** — per chunk, ONE ``[B, M*kc] x [chunk, M*kc]``
      bf16 contraction where the corpus operand is the flattened
      one-hot of the codes (built on the fly from the uint8 code
      matrix; XLA fuses the compare-cast into the matmul operand
      stream) — the MXU evaluates every subspace LUT lookup as part of
      a dense product. ``approx_max_k`` (the same PartialReduce engine
      the amk scan uses) selects per-chunk winners fused onto that
      matmul's epilogue; no [B, N] intermediate and no sort.
    * **Exact stage** — the merged surrogate pool (plus
      ``_EXACT_MARGIN``) is re-scored in exact f32: row-gather of the
      winners' codes, small one-hot einsum against the f32 LUT, the
      full metric formula, slot-sorted tie-break. Returned scores are
      therefore f32-accurate ADC values (= reconstruction similarity),
      and callers still exact-rescore in f64 from host truth.

    4-bit codes (kc=16, ``packed=True``: two codes per byte) make the
    one-hot contraction affordable — M*kc = dim*8 lanes at dsub=2 —
    and halve the HBM code bytes; kc=256 remains supported for the
    classic byte-code profile. Invalid slots are -inf. Ties break
    toward the lower slot, matching every other kernel here."""
    b = queries.shape[0]
    m, kc, dsub = codebooks.shape
    cap = codes.shape[0]
    # a chunk narrower than k would silently drop true winners (each
    # chunk can contribute at most its full width to the merge)
    chunk = min(max(chunk, k), cap)
    n_chunks = -(-cap // chunk)
    pad = n_chunks * chunk - cap
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        sqnorms = jnp.pad(sqnorms, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    # the fused Pallas rank path (selection only; the exact stage below
    # is shared): requires lane-tileable chunks and a small codebook
    # (kc <= 32 keeps the expanded operand within VMEM; the 8-bit
    # kc=256 profile stays on the XLA formulation)
    # scoped-VMEM footprint of one grid step (ADVICE r3): the kernel's
    # int32 lane-tiled codes + bf16 one-hot intermediates scale with
    # b and the code width; exceeding the raised budget is a
    # compile-time Mosaic failure, so estimate it in the gate and keep
    # oversized configs on the XLA formulation instead.
    _ms = (codes.shape[1])  # stored byte columns (already /2 if packed)
    _ms_pad = _round_up(_ms, 128)
    _lanes = (2 * kc if packed else kc) * _ms_pad
    vmem_est = (
        b * _lanes * 2  # resident LUT block (bf16)
        + tile_n * _ms_pad  # codes tile (uint8)
        + tile_n * _lanes * 6  # lane-tiled int32 codes + bf16 one-hot
        + b * tile_n * 4  # rank tile out (f32)
    )
    vmem_ok = vmem_est <= _PQ_COMPILER_PARAMS.vmem_limit_bytes
    use_pallas = (
        pallas
        and kc <= 32
        and chunk % tile_n == 0
        and tile_n % 128 == 0
        and vmem_ok
    )
    if pallas and kc <= 32 and not vmem_ok:
        warnings.warn(
            "pq_search_topk: pallas=True ignored (estimated per-step "
            f"VMEM footprint {vmem_est / 2**20:.0f} MiB exceeds the "
            f"{_PQ_COMPILER_PARAMS.vmem_limit_bytes / 2**20:.0f} MiB "
            "scoped budget; shrink the query batch or tile_n); using "
            "the XLA formulation",
            RuntimeWarning,
            stacklevel=2,
        )
    elif pallas and not use_pallas and kc <= 32:
        # the kc > 32 fallback is documented design (the 8-bit profile
        # stays on XLA: its expanded one-hot operand would blow VMEM),
        # but a tiling violation is a caller surprise — say so
        # (trace-time, once per compiled config) instead of silently
        # measuring the XLA formulation under a "pallas" label
        warnings.warn(
            "pq_search_topk: pallas=True ignored (needs "
            f"chunk % tile_n == 0 and tile_n % 128 == 0; got "
            f"chunk={chunk}, tile_n={tile_n}); using the XLA "
            "formulation",
            RuntimeWarning,
            stacklevel=2,
        )
    queries = queries.astype(jnp.float32)
    lut = _adc_lut(queries, codebooks, metric)  # [B, M, kc] f32
    if metric is SimilarityMetric.MANHATTAN:
        # surrogate ranks on -L1; bake the sign into the bf16 operand
        # so selection is a pure max either way
        lut_sel3 = (-lut).astype(jnp.bfloat16)
    else:
        lut_sel3 = lut.astype(jnp.bfloat16)
    if use_pallas:
        lut_sel = _lut_flat_pallas(lut_sel3, packed=packed)
    else:
        lut_sel = lut_sel3.reshape(b, m * kc)
    qsq = jnp.sum(queries * queries, axis=1, keepdims=True)  # [B, 1]

    codes_c = codes.reshape(n_chunks, chunk, codes.shape[1])
    sq_c = sqnorms.reshape(n_chunks, chunk)
    valid_c = valid.reshape(n_chunks, chunk)
    k_chunk = min(chunk, k + _EXACT_MARGIN)
    iota = jnp.arange(kc, dtype=jnp.uint8)

    def onehot_flat(codes_chunk):
        u = _unpack_nibbles(codes_chunk) if packed else codes_chunk
        oh = (u[:, :, None] == iota[None, None, :])
        return oh.astype(jnp.bfloat16).reshape(chunk, m * kc)

    def select_chunk(carry, xs):
        codes_chunk, sq_chunk, valid_chunk, base = xs
        if use_pallas:
            # pad stored-byte columns to the kernel's lane multiple
            # INSIDE the scan body (per-chunk, never a whole-corpus
            # copy); zero bytes hit the zeroed LUT pad columns -> +0
            ms = codes_chunk.shape[1]
            ms_pad = _round_up(ms, 128)
            cc = (
                codes_chunk
                if ms_pad == ms
                else jnp.pad(codes_chunk, ((0, 0), (0, ms_pad - ms)))
            )
            rank = _pallas_chunk_rank(
                lut_sel, cc, sq_chunk, valid_chunk,
                metric=metric, kc=kc, packed=packed, tile_n=tile_n,
                interpret=interpret,
            )
        else:
            adc = jax.lax.dot_general(
                lut_sel,
                onehot_flat(codes_chunk),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, chunk] (negated already for manhattan)
            rank = _rank_surrogate(adc, metric, sq_chunk[None, :])
            rank = jnp.where(valid_chunk[None, :], rank, NEG_INF)
        cs, ci = jax.lax.approx_max_k(rank, k_chunk, recall_target=0.95)
        return carry, (cs, ci + base)

    _, (pool_s, pool_i) = jax.lax.scan(
        select_chunk, None, (codes_c, sq_c, valid_c,
                             jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    )
    # [B, n_chunks * k_chunk] merged surrogate pool
    pool_s = jnp.moveaxis(pool_s, 0, 1).reshape(b, -1)
    pool_i = jnp.moveaxis(pool_i, 0, 1).reshape(b, -1)
    p0 = min(pool_s.shape[1], k + _EXACT_MARGIN)
    if pool_s.shape[1] > p0:
        _, top_pos = jax.lax.top_k(pool_s, p0)
        pool_i = jnp.take_along_axis(pool_i, top_pos, axis=1)

    # ---- exact-f32 ADC stage over the pool -------------------------
    # slot-sort first: coalesced gather + lowest-slot tie-break in one
    # move (duplicates are impossible — chunks are disjoint and
    # approx_max_k returns distinct indices within a chunk)
    pool_i = jnp.sort(pool_i, axis=1)
    cand = codes[pool_i]  # [B, P, M_stored] row gather
    u = _unpack_nibbles(cand.reshape(-1, cand.shape[-1])) if packed \
        else cand.reshape(-1, cand.shape[-1])
    oh = (u[:, :, None] == iota[None, None, :]).astype(jnp.float32)
    adc = jnp.einsum(
        "bpc,bc->bp",
        oh.reshape(b, p0, m * kc),
        lut.reshape(b, m * kc),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, P] exact-f32 ADC dot (or L1 distance for manhattan)
    sq_cand = sqnorms[pool_i]
    if metric is SimilarityMetric.DOT_PRODUCT:
        exact = adc
    elif metric is SimilarityMetric.COSINE:
        denom = jnp.sqrt(qsq) * jnp.sqrt(sq_cand)
        exact = jnp.where(denom > 0.0, adc / jnp.maximum(denom, 1e-30), 0.0)
    elif metric is SimilarityMetric.EUCLIDEAN:
        d2 = jnp.maximum(qsq - 2.0 * adc + sq_cand, 0.0)
        exact = 1.0 / (1.0 + jnp.sqrt(d2))
    else:  # MANHATTAN
        exact = 1.0 / (1.0 + adc)
    exact = jnp.where(valid[pool_i], exact, NEG_INF)
    s_top, pos = jax.lax.top_k(exact, min(k, p0))
    i_top = jnp.take_along_axis(pool_i, pos, axis=1)
    if s_top.shape[1] < k:  # cap smaller than k after clamping
        padw = k - s_top.shape[1]
        s_top = jnp.pad(s_top, ((0, 0), (0, padw)), constant_values=NEG_INF)
        i_top = jnp.pad(i_top, ((0, 0), (0, padw)))
    return s_top, i_top
