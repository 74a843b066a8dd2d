"""Distributed (mesh-sharded) search tests on the 8-virtual-device CPU mesh.

The reference has no distributed backend (SURVEY §2); this layer is the
TPU-native scale-out: corpus rows sharded over a 1-D mesh, per-shard
top-k, all-gather merge over ICI. Tests verify exactness of the merge
against the single-device kernel.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.dist.sharding import (
    ShardedFlatIndex,
    make_mesh,
    shard_corpus,
    sharded_search_topk,
)
from vectorlite_tpu.kernels.topk import search_topk


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


@pytest.mark.parametrize(
    "metric",
    [
        SimilarityMetric.COSINE,
        SimilarityMetric.EUCLIDEAN,
        SimilarityMetric.DOT_PRODUCT,
        SimilarityMetric.MANHATTAN,
    ],
)
def test_sharded_matches_single_device(metric, mesh, rng):
    n, d, b, k = 1024, 64, 8, 10
    values = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.asarray(rng.random(n) > 0.1)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

    s_ref, i_ref = search_topk(
        values, sqnorms, valid, queries, metric=metric, k=k
    )
    sv, ss, svd = shard_corpus(mesh, values, sqnorms, valid)
    s_sh, i_sh = sharded_search_topk(
        sv, ss, svd, queries, metric=metric, k=k, mesh=mesh
    )
    assert np.array_equal(np.asarray(i_sh), np.asarray(i_ref))
    np.testing.assert_allclose(
        np.asarray(s_sh), np.asarray(s_ref), rtol=1e-5, atol=1e-6
    )


def test_sharded_tie_break_global_row_order(mesh, rng):
    n, d, b, k = 1024, 32, 8, 4
    base = rng.normal(size=d).astype(np.float32)
    data = rng.normal(size=(n, d)).astype(np.float32) * 10
    for row in (5, 400, 900):  # rows on different shards
        data[row] = base
    values = jnp.asarray(data)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(n, dtype=bool)
    queries = jnp.asarray(np.repeat(base[None, :], b, axis=0))
    sv, ss, svd = shard_corpus(mesh, values, sqnorms, valid)
    s, i = sharded_search_topk(
        sv, ss, svd, queries, metric=SimilarityMetric.COSINE, k=k, mesh=mesh
    )
    assert list(np.asarray(i)[0][:3]) == [5, 400, 900]


class TestShardedFlatIndex:
    def test_add_and_search(self, mesh, rng):
        n, d = 500, 32
        data = rng.normal(size=(n, d)).astype(np.float32)
        idx = ShardedFlatIndex(d, mesh)
        idx.add_batch(np.arange(n) * 7, data)  # non-trivial ids
        ids, scores = idx.search_batch_arrays(
            data[:16] + 1e-4, 3, SimilarityMetric.EUCLIDEAN
        )
        assert list(ids[:, 0]) == [i * 7 for i in range(16)]

    def test_growth(self, mesh, rng):
        d = 16
        idx = ShardedFlatIndex(d, mesh)
        data = rng.normal(size=(600, d)).astype(np.float32)
        idx.add_batch(np.arange(300), data[:300])
        idx.search_batch_arrays(data[:4], 2, SimilarityMetric.COSINE)
        idx.add_batch(np.arange(300, 600), data[300:])  # forces regrow
        ids, _ = idx.search_batch_arrays(
            data[590:592], 1, SimilarityMetric.COSINE
        )
        assert list(ids[:, 0]) == [590, 591]
