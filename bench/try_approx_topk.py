"""Measure jax.lax.approx_max_k fused onto the distance matmul at 1M.

python -m bench.try_approx_topk
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
sq = jnp.sum(v32 * v32, axis=-1)
inv_norm = jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
qb = q.astype(jnp.bfloat16)

# f64 ground truth (cosine) for recall check
qn = np.asarray(q, np.float64)
vn = np.asarray(v32, np.float64)
s_true = (qn @ vn.T) / (
    np.linalg.norm(qn, axis=1, keepdims=True) * np.linalg.norm(vn, axis=1)
)
i_true = np.argsort(-s_true, axis=1)[:, :10]


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def cos_approx(qb, vb, inv_norm, k, recall_target=0.95):
    dot = jax.lax.dot_general(
        qb, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = dot * inv_norm[None, :]
    return jax.lax.approx_max_k(s, k, recall_target=recall_target)


@functools.partial(jax.jit, static_argnames=("k",))
def cos_exact_topk(qb, vb, inv_norm, k):
    dot = jax.lax.dot_general(
        qb, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = dot * inv_norm[None, :]
    return jax.lax.top_k(s, k)


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def cos_approx_rescored(qb, vb, v32, inv_norm, q, k_final, k=32,
                        recall_target=0.95):
    _, i_sel = cos_approx(qb, vb, inv_norm, k, recall_target)
    rows = v32[i_sel]  # [B, k, D]
    dot = jnp.einsum("bkd,bd->bk", rows, q,
                     precision=jax.lax.Precision.HIGHEST)
    qsq = jnp.sum(q * q, axis=-1, keepdims=True)
    exact = dot * (jax.lax.rsqrt(jnp.maximum(qsq, 1e-30))
                   * inv_norm[i_sel])
    order = jnp.argsort(i_sel, axis=1)
    i_sel = jnp.take_along_axis(i_sel, order, axis=1)
    exact = jnp.take_along_axis(exact, order, axis=1)
    s_top, pos = jax.lax.top_k(exact, k_final)
    return s_top, jnp.take_along_axis(i_sel, pos, axis=1)


for rt in (0.9, 0.95, 0.99):
    for k in (32, 64, 128):
        f = lambda: cos_approx(qb, vb, inv_norm, k, rt)[0]
        f()
        t = slope(f)
        _, idx = cos_approx(qb, vb, inv_norm, k, rt)
        idx = np.asarray(idx)
        rec = np.mean([
            len(set(idx[b]) & set(i_true[b])) / 10 for b in range(B)
        ])
        log(f"approx_max_k rt={rt} k={k:4d}: {t*1e3:7.3f} ms "
            f"{B/t:9,.0f} QPS  {2*B*N*D/t/1e12:5.1f} TF/s "
            f"cand-recall@10={rec:.4f}")

f = lambda: cos_exact_topk(qb, vb, inv_norm, 16)[0]
f()
t = slope(f)
log(f"exact lax.top_k k=16       : {t*1e3:7.3f} ms {B/t:9,.0f} QPS")

for k in (32, 64):
    f = lambda: cos_approx_rescored(qb, vb, v32, inv_norm, q, 10, k, 0.95)[0]
    f()
    t = slope(f)
    s_got, i_got = cos_approx_rescored(qb, vb, v32, inv_norm, q, 10, k, 0.95)
    i_got = np.asarray(i_got)
    rec = np.mean([
        len(set(i_got[b]) & set(i_true[b])) / 10 for b in range(B)
    ])
    log(f"approx+rescore k_sel={k:3d}  : {t*1e3:7.3f} ms {B/t:9,.0f} QPS  "
        f"recall@10={rec:.4f}")
