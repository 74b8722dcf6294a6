"""Bench the POOLING (param) configuration's attention implementations.

The keypoint_h36m_param recipe (reference configs/epipolar/
keypoint_h36m_param.yaml: PARAMETERIZED ('z','theta','phi','g'),
POOLING=True, BOTTLENECK=2) cannot use the gather-free matmul attention
(feature-max is non-linear in the source features), so it rides either the
streaming scan or the materialized corner-table path
(ops/epipolar_attention_pooled.py).  This script times both at the param
shape on the chip, plus the full fused forward through ModelBuilder, and
prints one JSON line per measurement for PERF.md.

Run on the real TPU (a few minutes):  python scripts/bench_param.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ITERS = 12


def _sync_bench(fn, args, iters, blocks=3):
    import jax.numpy as jnp

    _ = np.asarray(jnp.sum(fn(*args)[0]))  # compile + sync
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = np.asarray(jnp.sum(fn(*args)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.epipolar_attention import (
        AttentionParams,
    )
    from epipolar_transformers_tpu.ops.epipolar_attention_pooled import (
        epipolar_attention_pooled,
    )
    from epipolar_transformers_tpu.ops.epipolar_attention_streaming import (
        epipolar_attention_streaming,
    )

    # param shape: 64x64 features, K=64 samples (32 pooled), C=128 after
    # the BOTTLENECK=2 theta/phi/g projections
    H = W = 64
    K = 64
    C = 128
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32))
    o1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32))
    o2 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32))
    locs = jnp.asarray(
        (rng.rand(BATCH, K, H, W, 2) * 2.2 - 1.1).astype(np.float32))
    params = AttentionParams(attention="avg", similarity="dot", pooling=True,
                             softmax_scale=1.0 / np.sqrt(K))

    # floor: host-sync round trip
    tiny = jax.device_put(np.ones((8, 8), np.float32))
    floor = _sync_bench(jax.jit(lambda a: (a * 2.0,)), (tiny,), ITERS)

    pooled = jax.jit(jax.vmap(
        lambda a, b, c, s: epipolar_attention_pooled(a, b, c, s, params)))
    streaming = jax.jit(jax.vmap(
        lambda a, b, c, s: epipolar_attention_streaming(
            a, b, c, s, params, shared_kv=False)))

    for name, fn in (("pooled_materialized", pooled),
                     ("streaming_scan", streaming)):
        t = _sync_bench(fn, (f1, o1, o2, locs), ITERS)
        ms = max(t - floor, 0.0) * 1e3
        print(json.dumps({
            "metric": f"param_attention_{name}",
            "value": round(ms, 2), "unit": f"ms/iter (batch {BATCH})",
        }))


if __name__ == "__main__":
    main()
