"""Native streaming rescore (flat_rescore_f64) parity vs the numpy
_exact_rescore math — the serving-path host cost for reduced-precision
storage rungs (reference score semantics: src/lib.rs:498-560)."""

import numpy as np
import pytest

from vectorlite_tpu import native
from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.core.types import Vector
from vectorlite_tpu.index.flat import FlatIndex

pytestmark = pytest.mark.skipif(
    native.load() is None
    or not hasattr(native.load(), "flat_rescore_f64"),
    reason="native lib unavailable",
)


def _numpy_rescore(idx, q64, slots, metric):
    """Transcription of the pure-numpy _exact_rescore score math (the
    fallback path) for an independent comparison point."""
    v = idx._values64[slots]
    q = q64[:, None, :]
    if metric is SimilarityMetric.DOT_PRODUCT:
        return np.matmul(v, q64[:, :, None])[..., 0]
    if metric is SimilarityMetric.COSINE:
        dot = np.matmul(v, q64[:, :, None])[..., 0]
        vn = idx._host_norms()[slots]
        qn = np.linalg.norm(q64, axis=-1, keepdims=True)
        denom = vn * qn
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(
                denom > 0.0, dot / np.maximum(denom, 1e-300), 0.0
            )
        return np.minimum(out, 1.0)
    if metric is SimilarityMetric.EUCLIDEAN:
        return 1.0 / (1.0 + np.linalg.norm(v - q, axis=-1))
    return 1.0 / (1.0 + np.sum(np.abs(v - q), axis=-1))


def _make_index(data):
    return FlatIndex(
        data.shape[1],
        [
            Vector(id=i, values=list(map(float, data[i])), text="")
            for i in range(data.shape[0])
        ],
    )


class TestNativeRescoreParity:
    @pytest.mark.parametrize("metric", list(SimilarityMetric))
    def test_matches_numpy_math(self, metric, rng):
        n, d, b, k = 300, 48, 16, 24
        data = rng.normal(size=(n, d)) * 3.0
        idx = _make_index(data)
        q64 = rng.normal(size=(b, d))
        slots = rng.integers(0, n, size=(b, k))
        got = idx._native_rescore(q64, slots, metric)
        assert got is not None
        want = _numpy_rescore(idx, q64, slots, metric)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_cosine_zero_norm_guard_and_clamp(self, rng):
        d = 32
        data = rng.normal(size=(4, d))
        data[1] = 0.0  # zero row: denom == 0 -> score 0.0
        idx = _make_index(data)
        q64 = data[2:3].copy()  # self-similarity row: clamp to <= 1.0
        slots = np.array([[0, 1, 2, 3]])
        got = idx._native_rescore(q64, slots, SimilarityMetric.COSINE)
        assert got[0, 1] == 0.0
        assert got[0, 2] <= 1.0
        assert got[0, 2] == pytest.approx(1.0, abs=1e-12)

    def test_zero_norm_query(self, rng):
        d = 16
        data = rng.normal(size=(3, d))
        idx = _make_index(data)
        q64 = np.zeros((1, d))
        got = idx._native_rescore(
            q64, np.array([[0, 1, 2]]), SimilarityMetric.COSINE
        )
        np.testing.assert_array_equal(got, 0.0)

    @pytest.mark.parametrize("metric", list(SimilarityMetric))
    def test_exact_rescore_end_to_end(self, metric, rng):
        """_exact_rescore (which now rides the native kernel) returns
        scores matching the scalar reference formulas, with -inf rows
        preserved and rows re-sorted descending."""
        n, d, k = 64, 24, 8
        data = rng.normal(size=(n, d))
        idx = _make_index(data)
        q64 = rng.normal(size=(2, d))
        slots = rng.integers(0, n, size=(2, k))
        scores_in = np.zeros((2, k))
        scores_in[1, -2:] = -np.inf  # padded misses must stay -inf
        out_scores, out_slots = idx._exact_rescore(
            q64, scores_in.copy(), slots.copy(), metric
        )
        assert np.isinf(out_scores[1, -2:]).all()
        for row in range(2):
            finite = out_scores[row][np.isfinite(out_scores[row])]
            assert list(finite) == sorted(finite, reverse=True)
            for j, slot in enumerate(out_slots[row]):
                if out_scores[row, j] == -np.inf:
                    continue
                want = metric.calculate(data[slot], q64[row])
                if metric is SimilarityMetric.COSINE:
                    want = min(want, 1.0)
                assert out_scores[row, j] == pytest.approx(
                    want, abs=1e-9
                )

    def test_fallback_when_disabled(self, rng, monkeypatch):
        """VECTORLITE_NO_NATIVE path: _native_rescore yields None and
        _exact_rescore still produces identical results via numpy."""
        n, d, k = 50, 16, 6
        data = rng.normal(size=(n, d))
        idx = _make_index(data)
        q64 = rng.normal(size=(3, d))
        slots = rng.integers(0, n, size=(3, k))
        scores_in = np.zeros((3, k))
        native_out = idx._exact_rescore(
            q64, scores_in.copy(), slots.copy(), SimilarityMetric.COSINE
        )
        monkeypatch.setattr(
            "vectorlite_tpu.native.load", lambda: None
        )
        assert idx._native_rescore(
            q64, slots, SimilarityMetric.COSINE
        ) is None
        numpy_out = idx._exact_rescore(
            q64, scores_in.copy(), slots.copy(), SimilarityMetric.COSINE
        )
        np.testing.assert_allclose(
            native_out[0], numpy_out[0], rtol=1e-12, atol=1e-12
        )
        np.testing.assert_array_equal(native_out[1], numpy_out[1])
