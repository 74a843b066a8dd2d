"""Multi-process (DCN-analogue) mesh regime: the dryrun spawns 2 OS
processes x 4 virtual CPU devices each, joins them with
``jax.distributed``, and runs the corpus-sharded serving step through
the addressability-safe placement helpers (dist/multihost.py). This is
the one sharding regime the in-process 8-device dryrun cannot cover —
no process here can address the whole corpus."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from vectorlite_tpu.dist import multihost
from vectorlite_tpu.dist.sharding import SHARD_AXIS, make_mesh


def test_place_and_fetch_single_process_paths():
    """On a fully-addressable mesh the helpers are plain device_put /
    np.asarray — same values, same sharding."""
    mesh = make_mesh(jax.devices()[:4])
    host = np.arange(4 * 8 * 3, dtype=np.float32).reshape(4 * 8, 3)
    arr = multihost.place_global(mesh, P(SHARD_AXIS, None), host)
    assert arr.shape == host.shape
    np.testing.assert_array_equal(multihost.fetch_replicated(arr), host)
    rep = multihost.place_global(mesh, P(None, None), host[:2])
    np.testing.assert_array_equal(
        multihost.fetch_replicated(rep), host[:2]
    )
    multihost.barrier("noop-single-process")


def test_place_global_stitches_per_device_shards():
    """The stitched (make_array_from_single_device_arrays) construction
    must agree with plain device_put on every shard."""
    mesh = make_mesh(jax.devices()[:4])
    host = np.random.default_rng(0).normal(size=(64, 16)).astype(
        np.float32
    )
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
    local = [
        jax.device_put(host[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            host.shape
        ).items()
    ]
    stitched = jax.make_array_from_single_device_arrays(
        host.shape, sharding, local
    )
    np.testing.assert_array_equal(np.asarray(stitched), host)


@pytest.mark.slow
def test_dryrun_multihost_2x4():
    """End-to-end: 2 real processes, jax.distributed coordination, the
    full serving step (exact scan + amk speed mode + in-place insert)
    validated in every process. ~1-2 min (two cold JAX starts)."""
    import __graft_entry__ as g

    g.dryrun_multihost(2, 4)
