"""Pallas fused tiled distance+top-k kernel vs the XLA reference path.

Runs in interpreter mode on CPU (real lowering is exercised on TPU by
bench.py); checks exact agreement of indices and scores including
tombstones, ties, and all matmul-form metrics.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.kernels.pallas_scan import pallas_search_topk
from vectorlite_tpu.kernels.topk import search_topk

MATMUL_METRICS = [
    SimilarityMetric.COSINE,
    SimilarityMetric.EUCLIDEAN,
    SimilarityMetric.DOT_PRODUCT,
]


def make_corpus(rng, n, d, invalid_frac=0.0):
    values = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.asarray(rng.random(n) >= invalid_frac)
    return values, sqnorms, valid


@pytest.mark.parametrize("metric", MATMUL_METRICS)
def test_matches_xla_path(metric, rng):
    n, d, b, k = 2048, 128, 8, 10
    values, sqnorms, valid = make_corpus(rng, n, d, invalid_frac=0.1)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    s1, i1 = pallas_search_topk(
        values, sqnorms, valid, queries,
        metric=metric, k=k, tile_n=512, interpret=True,
    )
    s2, i2 = search_topk(values, sqnorms, valid, queries, metric=metric, k=k)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
    )


def test_tie_break_lowest_row(rng):
    # duplicate rows: winners must come back in ascending row order
    n, d, b, k = 1024, 64, 8, 4
    base = rng.normal(size=(1, d)).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32) * 10
    for row in (7, 300, 900):
        data[row] = base
    values = jnp.asarray(data)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(n, dtype=bool)
    queries = jnp.asarray(np.repeat(base, b, axis=0))
    s, i = pallas_search_topk(
        values, sqnorms, valid, queries,
        metric=SimilarityMetric.COSINE, k=k, tile_n=256, interpret=True,
    )
    assert list(np.asarray(i)[0][:3]) == [7, 300, 900]


def test_k_larger_than_tile(rng):
    # k is clamped to the tile size per tile; global merge still exact
    n, d, b, k = 512, 32, 8, 96
    values, sqnorms, valid = make_corpus(rng, n, d)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    s1, i1 = pallas_search_topk(
        values, sqnorms, valid, queries,
        metric=SimilarityMetric.DOT_PRODUCT, k=k, tile_n=128,
        interpret=True,
    )
    s2, i2 = search_topk(
        values, sqnorms, valid, queries,
        metric=SimilarityMetric.DOT_PRODUCT, k=k,
    )
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
    )


def test_all_invalid_returns_neg_inf(rng):
    n, d, b, k = 512, 32, 8, 4
    values, sqnorms, _ = make_corpus(rng, n, d)
    valid = jnp.zeros(n, dtype=bool)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    s, i = pallas_search_topk(
        values, sqnorms, valid, queries,
        metric=SimilarityMetric.COSINE, k=k, tile_n=256, interpret=True,
    )
    assert np.all(np.asarray(s) == -np.inf)


@pytest.mark.parametrize(
    "metric",
    [SimilarityMetric.COSINE, SimilarityMetric.EUCLIDEAN,
     SimilarityMetric.DOT_PRODUCT],
)
def test_int8_kernel_matches_xla_int8(metric, rng):
    from vectorlite_tpu.core.metrics import quantize_rows_int8
    from vectorlite_tpu.kernels.pallas_scan import pallas_search_topk_int8
    from vectorlite_tpu.kernels.topk import search_topk_int8

    n, d, b, k = 1024, 128, 8, 10
    values, sqnorms, valid = make_corpus(rng, n, d, invalid_frac=0.05)
    values_q, scales = quantize_rows_int8(values)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    s1, i1 = pallas_search_topk_int8(
        values_q, scales, sqnorms, valid, queries,
        metric=metric, k=k, tile_n=256, interpret=True,
    )
    s2, i2 = search_topk_int8(
        values_q, scales, sqnorms, valid, queries, metric=metric, k=k
    )
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
    )


class TestBlockTopW:
    """Block-top-W approx kernel (TPU-KNN partial reduction, W winners per
    128-lane block) in interpreter mode."""

    def test_w1_matches_exact_when_no_collisions(self, rng):
        from vectorlite_tpu.kernels.pallas_scan import pallas_search_block_topk

        # top-k spread across distinct 128-blocks -> block-top1 is exact
        n, d, b, k = 1024, 64, 4, 4
        data = rng.normal(size=(n, d)).astype(np.float32) * 0.01
        q = rng.normal(size=(b, d)).astype(np.float32)
        for j, row in enumerate((5, 200, 500, 900)):  # distinct blocks
            data[row] = q[0] * (2.0 - 0.1 * j)
        values = jnp.asarray(data)
        sqnorms = jnp.sum(values * values, axis=-1)
        valid = jnp.ones(n, dtype=bool)
        s, i = pallas_search_block_topk(
            values, sqnorms, valid, jnp.asarray(q),
            metric=SimilarityMetric.DOT_PRODUCT, k=k, tile_n=256,
            interpret=True, winners=1,
        )
        assert list(np.asarray(i)[0]) == [5, 200, 500, 900]

    def test_w2_recovers_block_collision(self, rng):
        from vectorlite_tpu.kernels.pallas_scan import pallas_search_block_topk

        # two of the true top-k in the SAME 128-block: W=1 misses one,
        # W=2 finds both
        n, d, b, k = 1024, 64, 4, 2
        data = rng.normal(size=(n, d)).astype(np.float32) * 0.01
        q = rng.normal(size=(b, d)).astype(np.float32)
        data[130] = q[0] * 2.0  # block 1
        data[140] = q[0] * 1.9  # block 1 as well
        values = jnp.asarray(data)
        sqnorms = jnp.sum(values * values, axis=-1)
        valid = jnp.ones(n, dtype=bool)
        for w, expected in ((1, {130}), (2, {130, 140})):
            s, i = pallas_search_block_topk(
                values, sqnorms, valid, jnp.asarray(q),
                metric=SimilarityMetric.DOT_PRODUCT, k=k, tile_n=256,
                interpret=True, winners=w,
            )
            got = set(np.asarray(i)[0])
            assert expected <= got, (w, got)

    @pytest.mark.parametrize("metric", MATMUL_METRICS)
    def test_w2_matches_exact_topk(self, metric, rng):
        from vectorlite_tpu.kernels.pallas_scan import pallas_search_block_topk

        # random corpus, k=1: block selection is exact for the top hit
        n, d, b = 512, 32, 8
        values, sqnorms, valid = make_corpus(rng, n, d, invalid_frac=0.1)
        queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        s1, i1 = pallas_search_block_topk(
            values, sqnorms, valid, queries,
            metric=metric, k=1, tile_n=256, interpret=True, winners=2,
        )
        s2, i2 = search_topk(
            values, sqnorms, valid, queries, metric=metric, k=1
        )
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
        )

    def test_w2_tie_break_lowest_row(self, rng):
        from vectorlite_tpu.kernels.pallas_scan import pallas_search_block_topk

        # identical vectors at 130, 140 (same block) and 300 (later
        # block): equal scores must come back in ascending row order
        n, d, b, k = 1024, 64, 2, 3
        base = rng.normal(size=d).astype(np.float32)
        data = rng.normal(size=(n, d)).astype(np.float32) * 0.01
        for row in (130, 140, 300):
            data[row] = base
        values = jnp.asarray(data)
        sqnorms = jnp.sum(values * values, axis=-1)
        valid = jnp.ones(n, dtype=bool)
        q = jnp.asarray(np.repeat(base[None, :], b, axis=0))
        s, i = pallas_search_block_topk(
            values, sqnorms, valid, q,
            metric=SimilarityMetric.COSINE, k=k, tile_n=256,
            interpret=True, winners=2,
        )
        assert list(np.asarray(i)[0]) == [130, 140, 300]

    @pytest.mark.parametrize("metric", MATMUL_METRICS)
    def test_rescored_matches_exhaustive(self, metric, rng):
        """Speed mode (bf16 scan copy + device exact-f32 rescore) must
        find planted well-separated neighbors and score them exactly.
        (At the tiny n used here, fully random data would make >W-per-
        block collisions likely; production engages this path only at
        >=128K rows where that probability is ~2e-5 — the 1M on-chip
        check measured 100% index agreement with the exhaustive kernel.)
        """
        from vectorlite_tpu.kernels.pallas_scan import (
            pallas_search_block_topk_rescored,
        )

        n, d, b, k = 2048, 64, 4, 4
        data = rng.normal(size=(n, d)).astype(np.float32) * 0.01
        q_np = rng.normal(size=(b, d)).astype(np.float32)
        hits = (5, 300, 900, 1500)  # distinct 128-blocks
        pert = rng.normal(size=(4, d)).astype(np.float32)
        pert /= np.linalg.norm(pert, axis=1, keepdims=True)
        for j, row in enumerate(hits):
            # planted rows sit NEAR the query with strictly increasing
            # perturbation and a slight magnitude ramp, so every metric
            # (cosine: angle; euclidean: distance; dot: magnitude) ranks
            # them as the strict top-4 in the same planted order, well
            # separated from the 0.01-scale noise rows
            data[row] = (q_np[0] + 0.3 * (j + 1) * pert[j]) * (
                1.0 - 0.05 * j
            )
        values = jnp.asarray(data)
        sqnorms = jnp.sum(values * values, axis=-1)
        valid = jnp.ones(n, dtype=bool)
        vbf = values.astype(jnp.bfloat16)
        queries = jnp.asarray(np.repeat(q_np[:1], b, axis=0))
        s1, i1 = pallas_search_block_topk_rescored(
            vbf, values, sqnorms, valid, queries,
            metric=metric, k=k, k_sel=16, tile_n=256,
            interpret=True, winners=2,
        )
        s2, i2 = search_topk(
            values, sqnorms, valid, queries, metric=metric, k=k
        )
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
        )
