"""Runtime configuration profiles.

The reference selects HNSW graph degree and dtype behavior at **compile
time** via Cargo features (reference: Cargo.toml:15-22,
src/index/hnsw.rs:95-109). Here profiles are runtime parameters:

==================  ====  ====  ==========================================
profile              M     M0   flat device dtype
==================  ====  ====  ==========================================
default (fast)       16    32   auto (f32; bf16 + exact rescore at scale)
memory-optimized      8    16   bfloat16
high-accuracy        32    64   float32
quantized            16    32   int8 (+ exact rescore)
pq                   16    32   uint8 PQ codes (+ exact rescore)
==================  ====  ====  ==========================================

Select via ``VectorLiteConfig.profile("memory-optimized")`` or the
``VECTORLITE_PROFILE`` environment variable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp

_PROFILES = {
    # "auto": f32 below the Pallas threshold; at large scale on TPU the
    # flat device cache switches to bf16 with exact f64 host re-scoring
    # of the winners (measured-fastest composition, BASELINE.md)
    "default": dict(hnsw_m=16, hnsw_m0=32, device_dtype="auto"),
    "fast": dict(hnsw_m=16, hnsw_m0=32, device_dtype="auto"),
    "memory-optimized": dict(hnsw_m=8, hnsw_m0=16, device_dtype=jnp.bfloat16),
    "high-accuracy": dict(hnsw_m=32, hnsw_m0=64, device_dtype=jnp.float32),
    # int8 corpus on the flat index (int8 MXU scoring + exact host
    # re-score of the k winners); 4x less HBM than f32
    "quantized": dict(hnsw_m=16, hnsw_m0=32, device_dtype="int8"),
    # product-quantization rung (kernels/pq.py): uint8 codes + learned
    # codebooks, ~16x less HBM than f32 at the default M = dim/4 —
    # 10M x 384 rows in ~1 GB. ADC selection with a wide exactly-
    # re-scored pool; engages above VECTORLITE_PQ_MIN_ROWS (16384).
    "pq": dict(hnsw_m=16, hnsw_m0=32, device_dtype="pq"),
}


@dataclass
class VectorLiteConfig:
    hnsw_m: int = 16
    hnsw_m0: int = 32
    hnsw_ef_construction: int = 100
    hnsw_ef_search: int = 128
    device_dtype: object = "auto"
    profile_name: str = "default"
    #: Multi-chip serving: number of devices to shard Flat corpora over
    #: (``VECTORLITE_MESH`` env var; 0/1 = single-chip). Flat indexes are
    #: row-sharded over a 1-D mesh with an all-gather top-k merge
    #: (dist/sharding.py); HNSW stays single-chip (graph traversal does
    #: not shard row-wise).
    mesh_devices: int = 0

    @classmethod
    def profile(cls, name: str, **overrides) -> "VectorLiteConfig":
        params = _PROFILES.get(name)
        if params is None:
            raise ValueError(
                f"Unknown profile '{name}'. "
                f"Available: {sorted(_PROFILES)}"
            )
        return cls(profile_name=name, **{**params, **overrides})

    @classmethod
    def from_env(cls) -> "VectorLiteConfig":
        name = os.environ.get("VECTORLITE_PROFILE", "default")
        cfg = cls.profile(name)
        ef_c = os.environ.get("VECTORLITE_EF_CONSTRUCTION")
        ef_s = os.environ.get("VECTORLITE_EF_SEARCH")
        if ef_c:
            cfg.hnsw_ef_construction = int(ef_c)
        if ef_s:
            cfg.hnsw_ef_search = int(ef_s)
        mesh = os.environ.get("VECTORLITE_MESH")
        if mesh:
            cfg.mesh_devices = int(mesh)
        return cfg
