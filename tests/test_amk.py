"""ApproxTopK scan engine (kernels/amk.py) vs f64 ground truth.

On CPU approx_max_k lowers to an exact sort, so these tests pin the
surrounding machinery — rank surrogates, validity masking, exact
re-scoring, tie-breaks, int8 dequant — not the TPU PartialReduce
(measured on-chip by bench.py / bench/kernel_sweep.py).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.kernels.amk import (
    amk_search_topk_rescored,
    amk_select_int8,
)
from vectorlite_tpu.kernels.topk import search_topk

METRICS = [
    SimilarityMetric.COSINE,
    SimilarityMetric.EUCLIDEAN,
    SimilarityMetric.DOT_PRODUCT,
]


def _corpus(rng, n, d, invalid_frac=0.0):
    values = rng.normal(size=(n, d)).astype(np.float32)
    valid = rng.random(n) >= invalid_frac
    return values, valid


@pytest.mark.parametrize("metric", METRICS)
def test_rescored_matches_xla_reference(metric, rng):
    n, d, b, k = 1024, 64, 8, 10
    values, valid = _corpus(rng, n, d, invalid_frac=0.1)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    s1, i1 = amk_search_topk_rescored(
        vj,
        vj,
        sq,
        jnp.asarray(valid),
        jnp.asarray(queries),
        metric=metric,
        k=k,
        k_sel=64,
    )
    s2, i2 = search_topk(
        vj, sq, jnp.asarray(valid), jnp.asarray(queries),
        metric=metric, k=k,
    )
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
    )


def test_rescored_bf16_scan_copy_recovers_exact_scores(rng):
    n, d, b, k = 2048, 64, 4, 5
    values, valid = _corpus(rng, n, d)
    queries = values[:b] + 0.01
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    s, i = amk_search_topk_rescored(
        vj.astype(jnp.bfloat16),  # selection on the reduced copy
        vj,  # exact rows for the re-score
        sq,
        jnp.asarray(valid),
        jnp.asarray(queries),
        metric=SimilarityMetric.COSINE,
        k=k,
        k_sel=64,
    )
    i = np.asarray(i)
    # exact f64 truth
    q64 = queries.astype(np.float64)
    v64 = values.astype(np.float64)
    truth = np.argsort(
        -(q64 @ v64.T)
        / (
            np.linalg.norm(q64, axis=1, keepdims=True)
            * np.linalg.norm(v64, axis=1)[None, :]
        ),
        axis=1,
        kind="stable",
    )[:, :k]
    assert np.array_equal(i, truth)
    # scores are f32-exact (not bf16): self-similarity ~1 to f32 precision
    assert np.all(np.asarray(s)[:, 0] > 0.999)


def test_tie_break_lowest_row(rng):
    n, d, b, k = 512, 32, 4, 4
    base = rng.normal(size=(1, d)).astype(np.float32)
    values = rng.normal(size=(n, d)).astype(np.float32) * 10
    for row in (5, 200, 400):
        values[row] = base
    queries = np.repeat(base, b, axis=0)
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    s, i = amk_search_topk_rescored(
        vj, vj, sq, jnp.ones(n, bool), jnp.asarray(queries),
        metric=SimilarityMetric.COSINE, k=k, k_sel=32,
    )
    i = np.asarray(i)
    for row in range(b):
        assert list(i[row, :3]) == [5, 200, 400]


def test_all_invalid_rows_masked(rng):
    n, d, b, k = 256, 16, 2, 3
    values, _ = _corpus(rng, n, d)
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    s, i = amk_search_topk_rescored(
        vj, vj, sq, jnp.zeros(n, bool),
        jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        metric=SimilarityMetric.COSINE, k=k, k_sel=16,
    )
    assert np.all(np.asarray(s) == -np.inf)


@pytest.mark.parametrize("metric", METRICS)
def test_int8_select_candidates_contain_truth(metric, rng):
    from vectorlite_tpu.core.metrics import quantize_rows_int8

    n, d, b, k = 1024, 64, 4, 8
    values, valid = _corpus(rng, n, d)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    vq, scales = quantize_rows_int8(vj)
    s_sel, i_sel = amk_select_int8(
        vq, scales, sq, jnp.asarray(valid), jnp.asarray(queries),
        metric=metric, k=4 * k,
    )
    i_sel = np.asarray(i_sel)
    # int8 candidates sorted ascending by row (host tie-break contract)
    assert np.all(np.diff(i_sel, axis=1) >= 0)
    # the exact top-k should sit inside the 4x-oversampled int8 pool
    _, i_true = search_topk(
        vj, sq, jnp.asarray(valid), jnp.asarray(queries),
        metric=metric, k=k,
    )
    i_true = np.asarray(i_true)
    hit = np.mean(
        [
            len(set(i_true[r]) & set(i_sel[r])) / k
            for r in range(b)
        ]
    )
    assert hit >= 0.95, hit


@pytest.mark.parametrize("metric", METRICS)
def test_watermark_fast_path_matches_gather_path(metric, rng):
    """tombstones=False + live_hi (the no-validity-gather rescore fast
    path, round-3 rescore probes) must equal the gather path on a
    contiguous live prefix with dead tail capacity."""
    n, live, d, b, k = 1024, 700, 64, 8, 10
    values = rng.normal(size=(n, d)).astype(np.float32)
    values[live:] = 0.0  # dead capacity tail (host truth is calloc'd)
    valid = np.zeros(n, bool)
    valid[:live] = True
    queries = rng.normal(size=(b, d)).astype(np.float32)
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    s1, i1 = amk_search_topk_rescored(
        vj, vj, sq, jnp.asarray(valid), jnp.asarray(queries),
        metric=metric, k=k, k_sel=64,
    )
    s2, i2 = amk_search_topk_rescored(
        vj, vj, sq, jnp.asarray(valid), jnp.asarray(queries),
        metric=metric, k=k, k_sel=64,
        tombstones=False, live_hi=jnp.int32(live),
    )
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
    )


def test_watermark_masks_augmented_tail_neighbors(rng):
    """Augmentation neighborhoods of a candidate at the watermark edge
    cross into dead tail slots; the arithmetic validity must exclude
    them even when the tail rows hold garbage (not zeros)."""
    n, live, d, k = 512, 300, 32, 8
    values = rng.normal(size=(n, d)).astype(np.float32)
    base = rng.normal(size=d).astype(np.float32)
    values[live - 1] = base  # top hit right at the edge
    # garbage tail rows that would dominate scoring if unmasked
    values[live:] = base * 100.0
    valid = np.zeros(n, bool)
    valid[:live] = True
    queries = base[None, :].astype(np.float32)
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    s, i = amk_search_topk_rescored(
        vj, vj, sq, jnp.asarray(valid), jnp.asarray(queries),
        metric=SimilarityMetric.DOT_PRODUCT, k=k, k_sel=64,
        tombstones=False, live_hi=jnp.int32(live),
    )
    i = np.asarray(i)[0]
    s = np.asarray(s)[0]
    assert i[0] == live - 1
    assert np.all(i[s > -np.inf] < live)


def test_duplicate_burst_augmentation(rng):
    """A run of consecutively-inserted near-duplicates must all be
    returnable: locality augmentation + dedupe in the rescore pool
    (the ADVICE round-2 block-collision scenario)."""
    n, d, k = 2048, 32, 8
    values = rng.normal(size=(n, d)).astype(np.float32) * 5
    base = rng.normal(size=d).astype(np.float32)
    # 6 distinct near-duplicates at consecutive rows 700..705
    for j in range(6):
        values[700 + j] = base + 1e-3 * rng.normal(size=d).astype(
            np.float32
        )
    queries = base[None, :].repeat(2, axis=0)
    vj = jnp.asarray(values)
    sq = jnp.sum(vj * vj, axis=-1)
    s, i = amk_search_topk_rescored(
        vj, vj, sq, jnp.ones(n, bool), jnp.asarray(queries),
        metric=SimilarityMetric.COSINE, k=k, k_sel=64,
    )
    i = np.asarray(i)
    for row in range(2):
        got = set(i[row, :6])
        assert got == set(range(700, 706)), got
    # no duplicated rows in any result
    for row in i:
        assert len(set(row.tolist())) == len(row)
