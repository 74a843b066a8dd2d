"""Metric math parity tests (mirrors reference: src/lib.rs:574-667)."""

import numpy as np
import pytest

from vectorlite_tpu import (
    SimilarityMetric,
    cosine_similarity,
    dot_product,
    euclidean_similarity,
    manhattan_similarity,
)
from vectorlite_tpu.core.metrics import batched_scores_jit

import jax.numpy as jnp


class TestScalarParity:
    def test_cosine_identical(self):
        assert abs(cosine_similarity([1, 2, 3], [1, 2, 3]) - 1.0) < 1e-10

    def test_cosine_orthogonal(self):
        assert abs(cosine_similarity([1, 0], [0, 1])) < 1e-10

    def test_cosine_opposite(self):
        assert abs(cosine_similarity([1, 2, 3], [-1, -2, -3]) + 1.0) < 1e-10

    def test_cosine_zero_norm(self):
        # reference: src/lib.rs:439-443
        assert cosine_similarity([0, 0, 0], [1, 2, 3]) == 0.0
        assert cosine_similarity([1, 2, 3], [0, 0, 0]) == 0.0

    def test_euclidean_identical(self):
        assert abs(euclidean_similarity([1, 2, 3], [1, 2, 3]) - 1.0) < 1e-10

    def test_euclidean_known(self):
        expected = 1.0 / (1.0 + 5.0)
        assert abs(euclidean_similarity([0, 0], [3, 4]) - expected) < 1e-10

    def test_manhattan_identical(self):
        assert abs(manhattan_similarity([1, 2, 3], [1, 2, 3]) - 1.0) < 1e-10

    def test_manhattan_known(self):
        expected = 1.0 / (1.0 + 7.0)
        assert abs(manhattan_similarity([0, 0], [3, 4]) - expected) < 1e-10

    def test_dot_identical(self):
        assert abs(dot_product([1, 2, 3], [1, 2, 3]) - 14.0) < 1e-10

    def test_dot_orthogonal(self):
        assert abs(dot_product([1, 0], [0, 1])) < 1e-10

    def test_dot_opposite(self):
        assert abs(dot_product([1, 2, 3], [-1, -2, -3]) + 14.0) < 1e-10

    def test_enum_dispatch(self):
        a, b = [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]
        assert abs(SimilarityMetric.COSINE.calculate(a, b) - 1.0) < 1e-10
        assert abs(SimilarityMetric.EUCLIDEAN.calculate(a, b) - 1.0) < 1e-10
        assert abs(SimilarityMetric.MANHATTAN.calculate(a, b) - 1.0) < 1e-10
        assert abs(SimilarityMetric.DOT_PRODUCT.calculate(a, b) - 14.0) < 1e-10

    def test_default_metric(self):
        assert SimilarityMetric.default() is SimilarityMetric.COSINE

    def test_length_mismatch_asserts(self):
        with pytest.raises(AssertionError):
            SimilarityMetric.COSINE.calculate([1.0], [1.0, 2.0])

    def test_parse_case_insensitive(self):
        assert SimilarityMetric.parse("Cosine") is SimilarityMetric.COSINE
        assert SimilarityMetric.parse("DOTPRODUCT") is (
            SimilarityMetric.DOT_PRODUCT
        )

    def test_parse_invalid(self):
        from vectorlite_tpu.errors import InvalidSimilarityMetric

        with pytest.raises(InvalidSimilarityMetric):
            SimilarityMetric.parse("hamming")


class TestBatchedDeviceScores:
    """Device [B,N] scoring vs float64 numpy ground truth."""

    @pytest.mark.parametrize("metric", list(SimilarityMetric))
    def test_matches_scalar_reference(self, metric, rng):
        n, d, b = 37, 16, 5
        values = rng.normal(size=(n, d)).astype(np.float32)
        queries = rng.normal(size=(b, d)).astype(np.float32)
        sqnorms = np.sum(values.astype(np.float64) ** 2, axis=-1).astype(
            np.float32
        )

        got = np.asarray(
            batched_scores_jit(
                jnp.asarray(values),
                jnp.asarray(sqnorms),
                jnp.asarray(queries),
                metric,
            )
        )
        want = np.array(
            [
                [metric.calculate(values[j], queries[i]) for j in range(n)]
                for i in range(b)
            ]
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_cosine_zero_norm_row(self):
        values = np.array([[0.0, 0.0], [1.0, 0.0]], np.float32)
        sqnorms = np.array([0.0, 1.0], np.float32)
        queries = np.array([[1.0, 1.0]], np.float32)
        got = np.asarray(
            batched_scores_jit(
                jnp.asarray(values),
                jnp.asarray(sqnorms),
                jnp.asarray(queries),
                SimilarityMetric.COSINE,
            )
        )
        assert got[0, 0] == 0.0

    def test_manhattan_tiling_odd_sizes(self, rng):
        # force the chunked path to exercise padding
        n, d, b = 1030, 8, 3
        values = rng.normal(size=(n, d)).astype(np.float32)
        queries = rng.normal(size=(b, d)).astype(np.float32)
        sqnorms = np.sum(values**2, axis=-1)
        got = np.asarray(
            batched_scores_jit(
                jnp.asarray(values),
                jnp.asarray(sqnorms),
                jnp.asarray(queries),
                SimilarityMetric.MANHATTAN,
            )
        )
        dists = np.abs(values[None] - queries[:, None]).sum(-1)
        np.testing.assert_allclose(got, 1.0 / (1.0 + dists), rtol=1e-4)
