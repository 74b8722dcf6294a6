"""q_chunk sweep for the TRAINING path (value+grad, remat=True) on the chip.

The inference sweep (bench_attn_sweep.py) found q_chunk=64 fastest for the
pure forward (5.9 vs 6.7 ms/iter at 32).  Training wraps each chunk in
jax.checkpoint and differentiates, which changes the working set; this
script times value+grad of a scalar loss through the batched attention with
remat=True to pick the training-path default.

Run on the real TPU:  python scripts/bench_attn_grad.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ITERS = 10
H = W = 64
K = 64
C = 256


def timed(q_chunk, remat=True, iters=ITERS):
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.epipolar_attention import AttentionParams
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        epipolar_attention_matmul_batch,
    )

    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1.0 / np.sqrt(K))
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    o1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    s = jnp.asarray((rng.rand(BATCH, K, H, W, 2) * 2.2 - 1.1).astype(
        np.float32))

    def loss(q, o):
        out, _, _ = epipolar_attention_matmul_batch(
            q, o, o, s, params, q_chunk=q_chunk, remat=remat)
        return jnp.sum(out.astype(jnp.float32))

    vg = jax.value_and_grad(loss, argnums=(0, 1))

    def step(carry, _):
        q, o = carry
        v, (gq, go) = vg(q, o)
        scale = (v * 1e-30).astype(q.dtype)
        return (q + gq * 0 + scale, o + go * 0 + scale), None

    chained = jax.jit(
        lambda q, o: jax.lax.scan(step, (q, o), None, length=iters)[0][0])
    _ = np.asarray(jnp.sum(chained(f1, o1)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(chained(f1, o1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    for q, remat in ((32, True), (64, True), (128, True), (64, False),
                     (32, False)):
        ms = timed(q, remat)
        print(json.dumps({"q_chunk": q, "remat": remat,
                          "ms_per_grad_iter": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
