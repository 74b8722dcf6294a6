"""Fused Pallas attention vs the XLA matmul path on the real chip.

Chained-dependency methodology (bench.py).  Flagship shape, bf16 inputs
(the production eval mode), plus an f32 row and a q_block sweep.

Run on the real TPU:  python scripts/bench_attn_pallas.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ITERS = 20
H = W = 64
K = 64
C = 256


def timed(impl, dtype, q=64, iters=ITERS):
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.epipolar_attention import AttentionParams
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        epipolar_attention_matmul_batch,
    )
    from epipolar_transformers_tpu.ops.epipolar_attention_pallas import (
        epipolar_attention_pallas_batch,
    )

    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1.0 / np.sqrt(K))
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(dtype)
    o1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(dtype)
    s = jnp.asarray((rng.rand(BATCH, K, H, W, 2) * 2.2 - 1.1).astype(
        np.float32))

    if impl == "pallas":
        def attn(q_feat):
            return epipolar_attention_pallas_batch(
                q_feat, o1, o1, s, params, q_block=q)[0]
    else:
        def attn(q_feat):
            return epipolar_attention_matmul_batch(
                q_feat, o1, o1, s, params, q_chunk=q, remat=False)[0]

    def step(carry, _):
        out = attn(carry)
        r = jnp.sum(out.astype(jnp.float32))
        return carry + (r * 1e-30).astype(carry.dtype), None

    chained = jax.jit(lambda f: jax.lax.scan(step, f, None, length=iters)[0])
    _ = np.asarray(jnp.sum(chained(f1)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(chained(f1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def check_parity():
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.epipolar_attention import AttentionParams
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        epipolar_attention_matmul_batch,
    )
    from epipolar_transformers_tpu.ops.epipolar_attention_pallas import (
        epipolar_attention_pallas_batch,
    )

    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1.0 / np.sqrt(K))
    rng = np.random.RandomState(1)
    f1 = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    o1 = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    s = jnp.asarray((rng.rand(2, K, H, W, 2) * 2.2 - 1.1).astype(np.float32))
    a = epipolar_attention_matmul_batch(f1, o1, o1, s, params, remat=False)
    b = epipolar_attention_pallas_batch(f1, o1, o1, s, params)
    errs = {n: float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                     - y.astype(jnp.float32))))
            for n, x, y in zip(("out", "corr", "depth"), a, b)}
    print(json.dumps({"parity_f32_on_tpu": errs}), flush=True)


def main():
    check_parity()
    rows = [
        ("matmul", "bfloat16", 64),
        ("pallas", "bfloat16", 64),
        ("pallas", "bfloat16", 128),
        ("pallas", "bfloat16", 32),
        ("pallas", "float32", 64),
        ("matmul", "float32", 64),
    ]
    import jax.numpy as jnp
    for impl, dt, q in rows:
        ms = timed(impl, jnp.dtype(dt), q)
        print(json.dumps({"impl": impl, "dtype": dt, "q": q,
                          "ms_per_iter": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
