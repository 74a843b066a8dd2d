"""int8-on-the-MXU probe (VERDICT round-2 item 6).

Question: can an int8 x int8 -> int32 contraction at 1M x 384 b=256 beat
the bf16 scan (~1.2 ms selection / ~2-4 ms with rescore), unlocking the
v5e's 394 TOPS int8 peak? Round 2 found the s8 dot lowering off the MXU
on this Mosaic stack (kernels/pallas_scan.py history); this probe retries
with current XLA patterns:

  A. plain XLA ``dot_general`` int8 x int8 with
     ``preferred_element_type=int32`` + approx_max_k on the int32 ranks
  B. the shipped convert-fused path (s8 -> f32 convert riding the matmul
     operand stream, 1 byte/elem HBM) — the capacity-rung baseline
  C. bf16 scan (the speed-mode reference point)

Each timed with the slope method (two different iteration counts, delta /
delta-iters) so the fixed relay-fetch cost cancels. Also dumps the
compiled HLO of (A) so a miss can be written off with the lowering cited
(VERDICT: "or a written-off experiment with the lowered HLO cited").

Run on the TPU:  python -m bench.probe_int8
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N, D, B, K_SEL = 1_000_000, 384, 256, 128


def slope_time(fn, reps=(4, 24)):
    """ms per call via a two-point slope. Sync is a HOST FETCH of the
    last result — through the axon relay block_until_ready can return
    before the work drains (bench.py timing note)."""
    def chain(m):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(m)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
        return time.perf_counter() - t0

    chain(2)  # warm/compile
    t_small = min(chain(reps[0]) for _ in range(2))
    t_large = min(chain(reps[1]) for _ in range(2))
    return (t_large - t_small) / (reps[1] - reps[0]) * 1e3


def main():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((N, D), dtype=np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    q = rng.standard_normal((B, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # symmetric per-row int8 quantization (the FlatIndex int8 rung's
    # scheme: scale = max|row| / 127)
    scale = np.abs(v).max(axis=1) / 127.0
    v_q = np.clip(np.rint(v / scale[:, None]), -127, 127).astype(np.int8)
    q_scale = np.abs(q).max(axis=1) / 127.0
    q_q = np.clip(np.rint(q / q_scale[:, None]), -127, 127).astype(np.int8)

    dv_q = jax.device_put(jnp.asarray(v_q))
    dq_q = jax.device_put(jnp.asarray(q_q))
    dv_bf = jax.device_put(jnp.asarray(v, jnp.bfloat16))
    dq_f = jax.device_put(jnp.asarray(q))
    dscale = jax.device_put(jnp.asarray(scale.astype(np.float32)))
    dqscale = jax.device_put(jnp.asarray(q_scale.astype(np.float32)))

    @jax.jit
    def int8_dot_amk(qq, vv, sc, qsc):
        dot = jax.lax.dot_general(
            qq, vv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rank = dot.astype(jnp.float32) * (qsc[:, None] * sc[None, :])
        return jax.lax.approx_max_k(rank, K_SEL, recall_target=0.99)

    @jax.jit
    def int8_convert_amk(qf, vv, sc):
        dot = jax.lax.dot_general(
            qf, vv.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rank = dot * sc[None, :]
        return jax.lax.approx_max_k(rank, K_SEL, recall_target=0.99)

    @jax.jit
    def bf16_amk(qf, vv):
        dot = jax.lax.dot_general(
            qf.astype(jnp.bfloat16), vv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.approx_max_k(dot, K_SEL, recall_target=0.99)

    results = {}
    results["A_int8xint8_int32"] = round(
        slope_time(lambda: int8_dot_amk(dq_q, dv_q, dscale, dqscale)), 3
    )
    results["B_int8_convert_f32"] = round(
        slope_time(lambda: int8_convert_amk(dq_f, dv_q, dscale)), 3
    )
    results["C_bf16"] = round(slope_time(lambda: bf16_amk(dq_f, dv_bf)), 3)

    # candidate recall of A vs f64 truth (does s8xs8 rank well enough?)
    truth = np.argsort(-(q.astype(np.float64) @ v.astype(np.float64).T),
                       axis=1)[:, :10]
    _, i_a = int8_dot_amk(dq_q, dv_q, dscale, dqscale)
    i_a = np.asarray(i_a)
    hits = sum(len(set(i_a[b]) & set(truth[b])) for b in range(B))
    results["A_candidate_recall10"] = round(hits / (B * 10), 4)

    hlo = jax.jit(int8_dot_amk).lower(
        dq_q, dv_q, dscale, dqscale
    ).compile().as_text()
    # grep the dominant fusion/convert lines for the verdict record
    keep = [ln.strip() for ln in hlo.splitlines()
            if ("convert" in ln and "s8" in ln) or "dot" in ln.lower()]
    results["A_hlo_dot_lines"] = keep[:12]

    print(json.dumps(results, indent=2))
    with open("bench/report_int8_probe.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
