"""Quantify the HNSW score deviation from the reference's fixed-point
pipeline (VERDICT round-2 missing item 5).

The reference quantizes HNSW distances to u64 = trunc(raw * 1000)
(reference: src/index/hnsw.rs:113-174) and double-divides cosine/dot on
conversion (hnsw.rs:51-75 + 478). Our default returns exact scores; the
tests below measure the drift, pin the documented bounds, and verify
VECTORLITE_REFERENCE_SCORES=1 reproduces the reference numbers
bit-faithfully.
"""

import numpy as np
import pytest

from vectorlite_tpu import HNSWIndex, SimilarityMetric, Vector
from vectorlite_tpu.index.hnsw import (
    convert_distance_to_similarity,
    reference_score,
)


def _rust_pipeline(raw, metric):
    """Literal transcription of the Rust math for the test's own
    independent check: u64 trunc, /1000, convert (hnsw.rs:51-75)."""
    d = float(int(raw * 1000.0)) / 1000.0
    if metric is SimilarityMetric.EUCLIDEAN:
        return 1.0 / (1.0 + d)
    if metric is SimilarityMetric.COSINE:
        return 1.0 - d / 1000.0
    if metric is SimilarityMetric.MANHATTAN:
        return 1.0 / (1.0 + d)
    return min(max((1000.0 - d) / 1000.0, 0.0), 1.0)


class TestReferenceScoreHelper:
    @pytest.mark.parametrize(
        "metric",
        [
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.COSINE,
            SimilarityMetric.MANHATTAN,
            SimilarityMetric.DOT_PRODUCT,
        ],
    )
    def test_matches_independent_transcription(self, metric, rng):
        for raw in np.abs(rng.normal(size=200)) * 3:
            assert reference_score(float(raw), metric) == _rust_pipeline(
                float(raw), metric
            )

    def test_drift_bounds_euclidean_manhattan(self, rng):
        """|our - reference| <= quantization step (1e-3) for the
        1/(1+d) metrics — the drift VERDICT asked to quantify."""
        for metric in (
            SimilarityMetric.EUCLIDEAN,
            SimilarityMetric.MANHATTAN,
        ):
            raws = np.abs(rng.normal(size=2000)) * 5
            ours = np.array(
                [convert_distance_to_similarity(r, metric) for r in raws]
            )
            refs = np.array([reference_score(r, metric) for r in raws])
            drift = np.abs(ours - refs)
            assert drift.max() <= 1e-3 + 1e-12, drift.max()

    def test_cosine_dot_are_compressed_monotone_transforms(self, rng):
        """Cosine/dot reference scores live in ~[0.998, 1]: a different
        scale, not a drift — but order agrees up to 1e-3 raw-distance
        ties (the quantization collapses only near-equal pairs)."""
        # cosine distances live in [0, 2]
        raws = np.sort(np.clip(np.abs(rng.normal(size=1000)), 0.0, 2.0))
        refs = np.array(
            [reference_score(r, SimilarityMetric.COSINE) for r in raws]
        )
        assert refs.min() >= 0.998 - 1e-9
        assert refs.max() <= 1.0
        # monotone non-increasing with raw distance
        assert np.all(np.diff(refs) <= 1e-12)
        # ties only within one quantization step
        tie_mask = np.diff(refs) == 0.0
        assert np.all(np.diff(raws)[tie_mask] < 1e-3 + 1e-9)


class TestReferenceScoreServing:
    def test_env_mode_end_to_end(self, rng, monkeypatch):
        d, n = 16, 300
        data = rng.normal(size=(n, d))
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        idx = HNSWIndex(d, SimilarityMetric.COSINE, seed=2)
        for i in range(n):
            idx.add(Vector(id=i, values=list(data[i]), text=""))
        q = list(data[42])

        res_exact = idx.search(q, 5, SimilarityMetric.COSINE)
        monkeypatch.setenv("VECTORLITE_REFERENCE_SCORES", "1")
        res_ref = idx.search(q, 5, SimilarityMetric.COSINE)

        assert [r.id for r in res_exact] == [r.id for r in res_ref]
        # default mode: true cosine (self-hit ~ 1.0, others spread out)
        assert res_exact[0].score == pytest.approx(1.0, abs=1e-5)
        # reference mode: scores compressed into [0.998, 1]
        for r in res_ref:
            assert 0.998 <= r.score <= 1.0
        # and bit-faithful to the pipeline given the raw distance
        raw0 = 1.0 - float(np.dot(data[42], data[42]))
        assert res_ref[0].score == reference_score(
            max(raw0, 0.0), SimilarityMetric.COSINE
        )
