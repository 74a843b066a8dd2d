"""Decompose the 1M scan: raw matmul ceiling vs select cost.

python -m bench.decompose
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
)

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, B, N = 384, 256, 1 << 20


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope(fn, iters=16):
    def chain(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn()
        np.asarray(out).ravel()[:1]
        return time.perf_counter() - t0

    chain(2)
    a = min(chain(3) for _ in range(2))
    b_ = min(chain(3 + iters) for _ in range(2))
    return max((b_ - a) / iters, 1e-9)


rng = np.random.default_rng(0)
v32 = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
vb = v32.astype(jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
qb = q.astype(jnp.bfloat16)


# 1. pure XLA matmul + global argmax (no pallas): ceiling check
@jax.jit
def xla_dot_max(qb, vb):
    s = jax.lax.dot_general(
        qb, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, N]
    return jnp.max(s, axis=1)


t = slope(lambda: xla_dot_max(qb, vb))
log(f"XLA dot+rowmax (full [B,N] in HBM): {t*1e3:7.3f} ms  "
    f"{2*B*N*D/t/1e12:5.1f} TF/s  {N*D*2/t/1e9:6.1f} GB/s")


# 2. pallas matmul only, discard scores (write [B,128] per-tile max-fold)
def mk_kernel(select: str, tile: int, winners: int = 2):
    def kern(q_ref, v_ref, o_s, o_i):
        dot = jax.lax.dot_general(
            q_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        b = dot.shape[0]
        if select == "none":
            o_s[0] = dot[:, :128]
            o_i[0] = jnp.zeros((b, 128 * winners), jnp.int32)[:, :128]
            return
        scores = dot
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        n_rep = tile // 128
        tile_base = pl.program_id(0) * tile
        for w in range(winners):
            s = scores
            while s.shape[1] > 128:
                h = s.shape[1] // 2
                s = jnp.maximum(s[:, :h], s[:, h:])
            if select == "maxonly":
                o_s[0, :, pl.ds(w * 128, 128)] = s
                o_i[0, :, pl.ds(w * 128, 128)] = jnp.zeros(
                    (b, 128), jnp.int32
                )
                if w + 1 < winners:
                    scores = jnp.where(
                        scores >= jnp.tile(s, (1, n_rep)), -jnp.inf, scores
                    )
                continue
            s_b = jnp.tile(s, (1, n_rep))
            cand = jnp.where(scores >= s_b, col_ids, tile)
            while cand.shape[1] > 128:
                h = cand.shape[1] // 2
                cand = jnp.minimum(cand[:, :h], cand[:, h:])
            o_s[0, :, pl.ds(w * 128, 128)] = s
            o_i[0, :, pl.ds(w * 128, 128)] = cand + tile_base
            if w + 1 < winners:
                scores = jnp.where(
                    col_ids == jnp.tile(cand, (1, n_rep)), -jnp.inf, scores
                )

    n_out = 128 * (1 if select == "none" else winners)

    @jax.jit
    def run(qx, vx):
        return pl.pallas_call(
            kern,
            grid=(N // tile,),
            in_specs=[
                pl.BlockSpec((B, D), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, D), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B, n_out), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, n_out), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N // tile, B, n_out), jnp.float32),
                jax.ShapeDtypeStruct((N // tile, B, n_out), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * N * D,
                bytes_accessed=N * D * 2,
                transcendentals=0,
            ),
        )(qx, vx)[0]

    return run


for tile in (8192, 16384):
    for sel in ("none", "maxonly", "full"):
        try:
            f = mk_kernel(sel, tile)
            f(q, vb)
            t = slope(lambda: f(q, vb))
            log(f"pallas tile={tile:6d} select={sel:8s}: {t*1e3:7.3f} ms  "
                f"{2*B*N*D/t/1e12:5.1f} TF/s  {N*D*2/t/1e9:6.1f} GB/s")
        except Exception as e:
            log(f"pallas tile={tile} select={sel}: FAILED {e}")
