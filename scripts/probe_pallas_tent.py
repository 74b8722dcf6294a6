"""Probe: does the tent-profile Pallas kernel lower on the real toolchain?

Round-2 finding (PERF.md "Pallas fused-kernel investigation"): the original
kernel's profile construction (iota-compare + lane-broadcast feeding
dot_general) crashes the Mosaic backend.  The tent reformulation
(ops/epipolar_attention_pallas.py _kernel_tent) was designed around that
crash class: profiles are relu(1 - |iota - x|), broadcasts ride rank-1
dot_generals against ones refs, no compares.

Run on the real TPU:  python scripts/probe_pallas_tent.py
Prints COMPILED/CRASHED, then (if compiled) parity vs the matmul path and
timing at the flagship shape.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ITERS = 12


def main():
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.epipolar_attention import (
        AttentionParams,
    )
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        epipolar_attention_matmul_batch,
    )
    from epipolar_transformers_tpu.ops.epipolar_attention_pallas import (
        epipolar_attention_pallas,
    )

    H = W = K = 64
    C = 256
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32))
    locs = jnp.asarray(
        (rng.rand(BATCH, K, H, W, 2) * 2.2 - 1.1).astype(np.float32))
    params = AttentionParams(softmax_scale=1.0 / np.sqrt(K))

    try:
        out, corr, depth = epipolar_attention_pallas(
            f1, f2, locs, params, profile_mode="tent")
        _ = np.asarray(out)
        print("COMPILED: tent kernel lowered and executed")
    except Exception:
        print("CRASHED: tent kernel failed to lower/run")
        traceback.print_exc()
        return 1

    r_out, r_corr, r_depth = epipolar_attention_matmul_batch(
        f1, f2, f2, locs, params)
    err = float(np.max(np.abs(np.asarray(out) - np.asarray(r_out))))
    derr = float(np.max(np.abs(np.asarray(depth) - np.asarray(r_depth))))
    print(json.dumps({"parity_max_abs_err": {"out": err, "depth": derr}}))

    # Attribute the residual: exact-f32 CPU run of the same matmul path.
    cpu = jax.devices("cpu")[0]
    c_out, _, c_depth = jax.jit(
        lambda a, b, c: epipolar_attention_matmul_batch(a, b, b, c, params),
        device=cpu)(*jax.device_put((f1, f2, locs), cpu))
    for name, a in [("pallas_highest", (out, depth)),
                    ("xla_matmul_tpu", (r_out, r_depth))]:
        e = float(np.max(np.abs(np.asarray(a[0]) - np.asarray(c_out))))
        de = float(np.max(np.abs(np.asarray(a[1]) - np.asarray(c_depth))))
        print(json.dumps({"vs_exact_f32_cpu": name,
                          "out_err": round(e, 6), "depth_err": round(de, 6)}))

    def bench(fn, args):
        _ = np.asarray(jnp.sum(fn(*args)[0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                _ = np.asarray(jnp.sum(fn(*args)[0]))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best

    tiny = jax.device_put(np.ones((8, 8), np.float32))
    floor = bench(jax.jit(lambda a: (a * 2.0,)), (tiny,))
    t_pallas = bench(
        lambda a, b, c: epipolar_attention_pallas(
            a, b, c, params, profile_mode="tent"), (f1, f2, locs))
    t_pallas_bf16 = bench(
        lambda a, b, c: epipolar_attention_pallas(
            a, b, c, params, profile_mode="tent",
            mxu_precision="default"), (f1, f2, locs))
    matmul_jit = jax.jit(
        lambda a, b, c: epipolar_attention_matmul_batch(a, b, b, c, params))
    t_matmul = bench(matmul_jit, (f1, f2, locs))
    print(json.dumps({
        "pallas_tent_ms": round(max(t_pallas - floor, 0) * 1e3, 2),
        "pallas_tent_bf16_ms": round(max(t_pallas_bf16 - floor, 0) * 1e3, 2),
        "xla_matmul_ms": round(max(t_matmul - floor, 0) * 1e3, 2),
        "batch": BATCH,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
