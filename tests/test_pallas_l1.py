"""Pallas fused Manhattan scan vs f64 ground truth and the XLA path.

Interpreter mode on CPU (TPU lowering measured by bench/kernel_sweep).
Reference semantics: 1/(1+sum|q-v|), ties to the lowest row
(reference: src/lib.rs:521-532, src/index/flat.rs:116).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.kernels.pallas_l1 import pallas_search_topk_l1
from vectorlite_tpu.kernels.topk import search_topk


def _truth(values, queries, valid, k):
    l1 = np.abs(
        queries[:, None, :].astype(np.float64)
        - values[None].astype(np.float64)
    ).sum(-1)
    ref = 1.0 / (1.0 + l1)
    ref[:, ~valid] = -np.inf
    order = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(ref, order, axis=1), order


def test_matches_f64_truth(rng):
    n, d, b, k = 2048, 128, 8, 10
    values = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    valid = rng.random(n) >= 0.1
    s, i = pallas_search_topk_l1(
        jnp.asarray(values), jnp.asarray(valid), jnp.asarray(queries),
        k=k, tile_n=512, interpret=True,
    )
    ref_s, ref_i = _truth(values, queries, valid, k)
    assert np.array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=2e-5, atol=2e-6)


def test_matches_xla_path(rng):
    n, d, b, k = 1024, 96, 4, 8
    values = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    sqnorms = jnp.sum(jnp.asarray(values) ** 2, axis=-1)
    s1, i1 = pallas_search_topk_l1(
        jnp.asarray(values), jnp.asarray(valid), jnp.asarray(queries),
        k=k, tile_n=256, interpret=True,
    )
    s2, i2 = search_topk(
        jnp.asarray(values), sqnorms, jnp.asarray(valid),
        jnp.asarray(queries), metric=SimilarityMetric.MANHATTAN, k=k,
    )
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6
    )


def test_tie_break_lowest_row(rng):
    n, d, b, k = 1024, 64, 4, 4
    base = rng.normal(size=(1, d)).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32) * 10
    for row in (7, 300, 900):
        data[row] = base
    queries = np.repeat(base, b, axis=0)
    s, i = pallas_search_topk_l1(
        jnp.asarray(data), jnp.ones(n, bool), jnp.asarray(queries),
        k=k, tile_n=256, interpret=True,
    )
    i = np.asarray(i)
    for row in range(b):
        assert list(i[row, :3]) == [7, 300, 900]


def test_non_multiple_dim_chunk(rng):
    # d not a multiple of _DIM_CHUNK exercises the remainder loop
    n, d, b, k = 512, 12, 2, 5
    values = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    s, i = pallas_search_topk_l1(
        jnp.asarray(values), jnp.asarray(valid), jnp.asarray(queries),
        k=k, tile_n=256, interpret=True,
    )
    ref_s, ref_i = _truth(values, queries, valid, k)
    assert np.array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=2e-5, atol=2e-6)
