"""Where do the 3.4 ms of cosine augmentation overhead go?

Sweeps rescore-pool compositions at 1M x 384 b=256 cosine:
  pool128        augment=0                      (fast point, ~1.1 ms)
  pool200        augment=8, radius 4            (current default, ~4.5 ms)
  pool200pad256  same + pad pool to 256 with duplicate rows
  pool168        augment=8, radius 2
  pool256        augment=8, radius 4, k_sel widened... (cliff: skip)
  nosort200      augment, but skip the ascending sort (tie-break off)
  gather_half    augment, gather from bf16 scan copy instead of f32

Each timed by the slope method (chain of 8, fetch once).
"""
import os, sys, json, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import numpy as np
import jax
import jax.numpy as jnp

from vectorlite_tpu.core.metrics import SimilarityMetric
from vectorlite_tpu.kernels.amk import (
    NEG_INF, _matmul, _rank_scores, _exact_rescore_device,
)

N, D, B, K = 1 << 20, 384, 256, 16
COSINE = SimilarityMetric.COSINE


def log(m): print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("augment", "radius", "pad_to", "sort", "rescore_dtype"))
def run(values_scan, values_exact, sqnorms, valid, queries, *,
        augment=8, radius=4, pad_to=0, sort=True, rescore_dtype="f32"):
    n = values_scan.shape[0]
    dot = _matmul(queries, values_scan)
    rank = jnp.where(valid[None, :], _rank_scores(dot, COSINE, sqnorms), NEG_INF)
    _, i_sel = jax.lax.approx_max_k(rank, 128, recall_target=0.99)
    if augment > 0:
        top = i_sel[:, :augment]
        offs = jnp.arange(-radius, radius + 1)
        aug = jnp.clip(top[:, :, None] + offs[None, None, :], 0, n - 1)
        aug = aug.reshape(top.shape[0], -1)
        i_sel = jnp.concatenate([i_sel, aug], axis=1)
    if pad_to and i_sel.shape[1] < pad_to:
        pad = pad_to - i_sel.shape[1]
        i_sel = jnp.concatenate([i_sel, i_sel[:, :pad]], axis=1)
    # inline rescore so we can toggle the sort / gather dtype
    if sort:
        i_sel = jnp.sort(i_sel, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((i_sel.shape[0], 1), bool), i_sel[:, 1:] == i_sel[:, :-1]],
        axis=1)
    src = values_exact if rescore_dtype == "f32" else values_scan
    rows = src[i_sel].astype(jnp.float32)
    q = queries.astype(jnp.float32)
    dotp = jnp.einsum("bkd,bd->bk", rows, q, precision=jax.lax.Precision.HIGHEST)
    qsq = jnp.sum(q * q, axis=-1, keepdims=True)
    denom = jnp.sqrt(qsq) * jnp.sqrt(sqnorms[i_sel])
    exact = jnp.where(denom > 0.0, dotp / jnp.maximum(denom, 1e-30), 0.0)
    exact = jnp.where(valid[i_sel] & ~dup, exact, NEG_INF)
    s_top, pos = jax.lax.top_k(exact, K)
    return s_top, jnp.take_along_axis(i_sel, pos, axis=1)


def main():
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    values = jnp.asarray(vals)
    values_scan = values.astype(jnp.bfloat16)
    sqnorms = jnp.sum(values * values, axis=-1)
    valid = jnp.ones(N, bool)
    queries = jnp.asarray(q)

    variants = {
        "pool128_aug0": dict(augment=0),
        "pool200_default": dict(augment=8, radius=4),
        "pool200_pad256": dict(augment=8, radius=4, pad_to=256),
        "pool168_r2": dict(augment=8, radius=2),
        "pool200_nosort": dict(augment=8, radius=4, sort=False),
        "pool200_bf16gather": dict(augment=8, radius=4, rescore_dtype="bf16"),
        "selection_only": None,
    }

    @jax.jit
    def sel_only(values_scan, sqnorms, valid, queries):
        dot = _matmul(queries, values_scan)
        rank = jnp.where(valid[None, :], _rank_scores(dot, COSINE, sqnorms), NEG_INF)
        return jax.lax.approx_max_k(rank, 128, recall_target=0.99)

    def time_fn(fn, m=8):
        fn()[0].block_until_ready()  # warm
        def chain(mm):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(mm)]
            np.asarray(outs[-1][0])
            return time.perf_counter() - t0
        t_small = min(chain(2) for _ in range(2))
        t_large = min(chain(2 + m) for _ in range(2))
        return (t_large - t_small) / m * 1e3

    out = {}
    for name, kw in variants.items():
        if name == "selection_only":
            f = lambda: sel_only(values_scan, sqnorms, valid, queries)
        else:
            f = lambda kw=kw: run(values_scan, values, sqnorms, valid, queries, **kw)
        ms = time_fn(f)
        out[name] = round(ms, 3)
        log(f"{name:22s}: {ms:7.3f} ms/batch  ({B/ms*1e3:,.0f} QPS)")
    print(json.dumps(out))
    with open("bench/report_aug_variants.json", "w") as fjs:
        json.dump(out, fjs, indent=2)


if __name__ == "__main__":
    main()
