"""Multi-process (multi-host) mesh support — the DCN-analogue regime.

One process per host, each addressing only its local devices, joined by
``jax.distributed.initialize`` into one global mesh. Everything jitted
in :mod:`.sharding` is already multi-process-safe (``shard_map`` +
collectives compile identically under GSPMD whether the mesh spans one
process or many); what a single-process program *does* assume is

* ``jax.device_put(host_array, sharding)`` — rejects shardings with
  non-addressable devices, and
* ``np.asarray(global_array)`` — requires every shard to be local.

These helpers are the two replacements. They are no-ops in cost terms
on a single process (``place_global`` falls back to plain
``device_put``), so ``FlatIndex(mesh=...)`` and the dryruns share one
code path across both regimes.

The reference has no distributed story at all (single process, RwLock
concurrency — src/client.rs:243-247); this subsystem is TPU-pod scale
the reference cannot reach.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def place_global(mesh: Mesh, spec: P, host: np.ndarray) -> jax.Array:
    """Place a host array onto a (possibly multi-process) mesh.

    Every process passes the same full global array; each uploads only
    the slices its local devices own and the results are stitched into
    one global ``jax.Array``. On a fully-addressable mesh this is
    exactly ``jax.device_put`` (one call, XLA does the slicing)."""
    sharding = NamedSharding(mesh, spec)
    host = np.asarray(host)
    if sharding.is_fully_addressable:
        return jax.device_put(host, sharding)
    local = [
        jax.device_put(host[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            host.shape
        ).items()
    ]
    return jax.make_array_from_single_device_arrays(
        host.shape, sharding, local
    )


def fetch_replicated(arr: jax.Array) -> np.ndarray:
    """Host copy of a replicated global array (e.g. the merged top-k
    that :func:`..dist.sharding.sharded_search_topk` returns with
    ``P(None, None)`` out_specs): every process holds full copies on
    its local devices, so the fetch never needs a collective."""
    if arr.is_fully_addressable:
        return np.asarray(arr)
    return np.asarray(arr.addressable_data(0))


def barrier(name: str = "vectorlite") -> None:
    """Cross-process sync point (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
