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
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.metrics import SimilarityMetric, batched_scores
from ..kernels.topk import NEG_INF

SHARD_AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    """1-D corpus-sharding mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def shard_corpus(mesh: Mesh, values, sqnorms, valid):
    """Place corpus arrays row-sharded across the mesh; queries replicate."""
    vs = NamedSharding(mesh, P(SHARD_AXIS, None))
    ss = NamedSharding(mesh, P(SHARD_AXIS))
    return (
        jax.device_put(values, vs),
        jax.device_put(sqnorms, ss),
        jax.device_put(valid, ss),
    )


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

    Returns (scores [B, k], global_row_indices [B, k]), replicated. Ties
    break toward the lower global row index (shard-major order), matching
    the single-device kernel's insertion-order tie-break.
    """

    def local_shard(v, sq, va, q):
        rows_per_shard = v.shape[0]
        scores = batched_scores(v, sq, q, metric)
        scores = jnp.where(va[None, :], scores, NEG_INF)
        k_local = min(k, rows_per_shard)
        s, i = jax.lax.top_k(scores, k_local)
        shard_id = jax.lax.axis_index(SHARD_AXIS)
        gi = i + shard_id * rows_per_shard
        # merge: gather every shard's candidates, reduce to global top-k
        s_all = jax.lax.all_gather(s, SHARD_AXIS, axis=1, tiled=True)
        gi_all = jax.lax.all_gather(gi, SHARD_AXIS, axis=1, tiled=True)
        k_merge = min(k, s_all.shape[1])
        s_top, pos = jax.lax.top_k(s_all, k_merge)
        gi_top = jnp.take_along_axis(gi_all, pos, axis=1)
        return s_top, gi_top

    return jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(values, sqnorms, valid, queries)


class ShardedFlatIndex:
    """A corpus-sharded exact index for multi-chip serving.

    Thin data-parallel wrapper: host-side bookkeeping mirrors FlatIndex, but
    device state is placed row-sharded across the mesh and searches run the
    collective merge kernel. Capacity is always a multiple of the mesh size.
    """

    def __init__(self, dim: int, mesh: Mesh | None = None, dtype=jnp.float32):
        self.dim = int(dim)
        self.mesh = mesh or make_mesh()
        self.dtype = dtype
        n_dev = self.mesh.devices.size
        # capacity must split evenly across the mesh
        self._capacity = -(-max(256, n_dev) // n_dev) * n_dev
        self._host = np.zeros((self._capacity, self.dim), np.float32)
        self._valid = np.zeros(self._capacity, bool)
        self._ids = np.zeros(self._capacity, np.int64)
        self._size = 0
        self._dev = None  # (values, sqnorms, valid)

    def add_batch(self, ids: np.ndarray, values: np.ndarray) -> None:
        n = len(ids)
        while self._size + n > self._capacity:
            self._grow()
        lo = self._size
        self._host[lo : lo + n] = values
        self._ids[lo : lo + n] = ids
        self._valid[lo : lo + n] = True
        self._size += n
        self._dev = None  # re-place on next search

    def _grow(self):
        n_dev = self.mesh.devices.size
        new_cap = -(-self._capacity * 2 // n_dev) * n_dev
        grow = new_cap - self._capacity
        self._host = np.concatenate(
            [self._host, np.zeros((grow, self.dim), np.float32)]
        )
        self._ids = np.concatenate([self._ids, np.zeros(grow, np.int64)])
        self._valid = np.concatenate([self._valid, np.zeros(grow, bool)])
        self._capacity = new_cap

    def _sync(self):
        if self._dev is None:
            values = jnp.asarray(self._host, dtype=self.dtype)
            sqnorms = jnp.sum(
                jnp.asarray(self._host) ** 2, axis=-1
            ).astype(jnp.float32)
            self._dev = shard_corpus(
                self.mesh, values, sqnorms, jnp.asarray(self._valid)
            )

    def search_batch_arrays(self, queries, k: int, metric: SimilarityMetric):
        self._sync()
        values, sqnorms, valid = self._dev
        q = jnp.asarray(np.asarray(queries, np.float32))
        # per-shard candidate pool is rows/shard; clamp k so the final
        # merge's top_k never exceeds the gathered candidate count
        k = min(int(k), self._capacity)
        scores, rows = sharded_search_topk(
            values, sqnorms, valid, q, metric=metric, k=k, mesh=self.mesh
        )
        rows = np.asarray(rows)
        scores = np.asarray(scores)
        ids = self._ids[rows]
        ids[scores == NEG_INF] = -1
        return ids, scores
