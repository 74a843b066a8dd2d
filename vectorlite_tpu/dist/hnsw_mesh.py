"""Multi-chip HNSW: replicated graph, query-sharded beam search.

The reference's HNSW is single-process, single-threaded per query
(reference: src/index/hnsw.rs:415-496) — it has no distributed analogue
(SURVEY §2), so this module is an exceed-the-reference capability: the
level-0 graph arrays (vectors, squared norms, CSR adjacency) are
**replicated** on every device of a 1-D ``jax.sharding.Mesh`` and query
batches are **sharded** along the batch axis. Each device runs the
batched beam (kernels/beam.py) over its query shard against its local
graph replica — embarrassingly parallel SPMD, zero collectives in the
hot loop (XLA inserts only the final output gather when the host
fetches).

Serving policy (unchanged, measured round 2 / README "Which path
serves"): on a single host the native C++ ef-search wins at every
measured scale (10-26x over the device beam), so the mesh beam serves
when explicitly requested (``use_device=True`` on a mesh-configured
index) — the scaling path for batch-heavy workloads where chips outrun
the host's cores. A graph replica must fit one device's HBM; the graph
build itself stays on the host (native C++), exactly as in the
single-chip design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.metrics import SimilarityMetric
from ..kernels.beam import beam_search_l0


@functools.partial(
    jax.jit,
    static_argnames=("metric", "ef", "max_iters", "mesh_axis"),
)
def _sharded_beam(
    vecs,
    sqnorms,
    adj,
    entries,
    queries,
    *,
    metric: SimilarityMetric,
    ef: int,
    max_iters: int,
    mesh_axis: str,
):
    return beam_search_l0(
        vecs, sqnorms, adj, entries, queries,
        metric=metric, ef=ef, max_iters=max_iters,
    )


def replicate_graph(mesh, vecs, sqnorms, adj):
    """Place the level-0 graph arrays replicated on every mesh device.

    Called from the index's device-sync (under its device lock) so the
    placement happens once per graph mutation burst, not per query.
    """
    repl = NamedSharding(mesh, P())
    return (
        jax.device_put(vecs, repl),
        jax.device_put(sqnorms, repl),
        jax.device_put(adj, repl),
    )


def mesh_beam_search(
    mesh,
    vecs,
    sqnorms,
    adj,
    entries,  # [B] int32 per-query level-0 entry nodes (host descent)
    queries,  # [B, D] f32; B must be a multiple of the mesh size
    *,
    metric: SimilarityMetric,
    ef: int,
    max_iters: int,
):
    """Returns (beam_ids [B, ef], beam_dist [B, ef]) — per-query beams
    identical to the single-chip beam (each query's search touches only
    its own state), just computed n_devices at a time."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    b = queries.shape[0]
    if b % n_dev:
        raise ValueError(
            f"batch {b} must be a multiple of the mesh size {n_dev}"
        )
    qsh = NamedSharding(mesh, P(axis))
    queries = jax.device_put(jnp.asarray(queries, jnp.float32), qsh)
    entries = jax.device_put(jnp.asarray(entries, jnp.int32), qsh)
    return _sharded_beam(
        vecs, sqnorms, adj, entries, queries,
        metric=metric, ef=ef, max_iters=max_iters, mesh_axis=axis,
    )
