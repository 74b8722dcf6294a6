"""Stage breakdown of the gather-free matmul attention on the real chip.

PERF.md (round 2) measured the full fused attention at ~5.7 ms/iter at the
flagship shape but noted ~2x overhead XLA-side that op-level profiling
(unavailable over the tunnel) could not attribute.  This script dissects the
chunk body by cutting it at successive stages — each variant returns a
reduction of the last live intermediate so XLA cannot dead-code the stage —
and times each with the chained-dependency methodology (bench.py): iteration
i+1's input carries a denormal-scaled reduction of iteration i's output, one
fetch at the end, divide once.

Stages (cumulative):
  profiles  — _axis_slot_weights + one-hot profile construction only
  gram      — + the (Q, HW) x (HW, C) Gram matmul
  sim       — + the T/sim separable profile contractions (x then y)
  weights   — + mask/softmax
  full      — + n_mat contraction and the (Q, HW) x (HW, C) output matmul

Run on the real TPU:  python scripts/bench_attn_stages.py
"""

from __future__ import annotations

import functools
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
Q_CHUNK = 32


def build_stage_fn(stage: str, q_chunk: int = Q_CHUNK):
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.epipolar_attention import (
        NEG_INF, AttentionParams,
    )
    from epipolar_transformers_tpu.ops.quad_gather import _axis_slot_weights
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        _largest_divisor, _profiles,
    )

    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1.0 / np.sqrt(K))

    def one_item(feat1, other1, other2, sample_locs):
        HW = H * W
        prof_dtype = jnp.bfloat16
        locs = sample_locs.reshape(K, HW, 2).transpose(1, 0, 2).astype(
            jnp.float32)
        x = (locs[..., 0] + 1.0) / 2.0 * (W - 1)
        y = (locs[..., 1] + 1.0) / 2.0 * (H - 1)
        xb, wx0, wx1 = _axis_slot_weights(x, W)
        yb, wy0, wy1 = _axis_slot_weights(y, H)
        f1 = feat1.reshape(HW, -1)
        f2k = other1.reshape(HW, -1)
        f2v = other2.reshape(HW, -1).astype(jnp.bfloat16)
        Q = _largest_divisor(HW, q_chunk)
        nc = HW // Q

        def as_chunks(a):
            return a.reshape((nc, Q) + a.shape[1:])

        xs = {
            "f1": as_chunks(f1),
            "xb": as_chunks(xb), "wx0": as_chunks(wx0), "wx1": as_chunks(wx1),
            "yb": as_chunks(yb), "wy0": as_chunks(wy0), "wy1": as_chunks(wy1),
        }

        def chunk(c):
            xprof = _profiles(c["xb"], c["wx0"], c["wx1"], W, prof_dtype)
            yprof = _profiles(c["yb"], c["wy0"], c["wy1"], H, prof_dtype)
            if stage == "profiles":
                return (jnp.sum(xprof, axis=(1, 2))
                        + jnp.sum(yprof, axis=(1, 2)))
            G = jnp.einsum("qc,pc->qp", c["f1"], f2k,
                           preferred_element_type=jnp.float32
                           ).reshape(Q, H, W)
            if stage == "gram":
                return (jnp.sum(G, axis=(1, 2))
                        + jnp.sum(xprof, axis=(1, 2))
                        + jnp.sum(yprof, axis=(1, 2)))
            T = jnp.einsum("qyx,qkx->qky", G.astype(prof_dtype), xprof,
                           preferred_element_type=jnp.float32)
            sim = jnp.einsum("qky,qky->qk", T.astype(prof_dtype), yprof,
                             preferred_element_type=jnp.float32)
            if stage == "sim":
                return jnp.sum(sim, axis=1)
            masked = jnp.where(sim == 0.0, NEG_INF, sim)
            w = jax.nn.softmax(
                masked * jnp.float32(params.softmax_scale), axis=-1)
            if stage == "weights":
                return jnp.sum(w, axis=1)
            n_mat = jnp.einsum(
                "qky,qkx->qyx", (yprof * w[..., None]).astype(prof_dtype),
                xprof, preferred_element_type=jnp.float32,
            ).reshape(Q, HW).astype(jnp.bfloat16)
            out_c = jnp.einsum("qp,pc->qc", n_mat, f2v,
                               preferred_element_type=jnp.float32)
            return jnp.sum(out_c, axis=1)

        red = jax.lax.map(chunk, xs)  # (nc, Q)
        return jnp.sum(red)

    return jax.jit(
        lambda f1, o1, o2, s: jax.vmap(one_item)(f1, o1, o2, s).sum()
    )


def chained_time(fn, f1, o1, o2, s, iters=ITERS):
    """Chain: fold a denormal-scaled reduction of step i into step i+1's
    query input; one final fetch — the tunnel cannot ack without computing."""
    import jax.numpy as jnp

    def step(carry_f1, _):
        r = fn(carry_f1, o1, o2, s)
        return carry_f1 + (r * 1e-30).astype(carry_f1.dtype), None

    import jax
    chained = jax.jit(
        lambda f: jax.lax.scan(step, f, None, length=iters)[0])
    _ = np.asarray(jnp.sum(chained(f1)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(chained(f1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    o1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    o2 = o1
    s = jnp.asarray((rng.rand(BATCH, K, H, W, 2) * 2.2 - 1.1).astype(
        np.float32))

    prev = 0.0
    for stage in ("profiles", "gram", "sim", "weights", "full"):
        fn = build_stage_fn(stage)
        ms = chained_time(fn, f1, o1, o2, s) * 1e3
        print(json.dumps({
            "stage": stage, "ms_per_iter": round(ms, 3),
            "ms_delta": round(ms - prev, 3), "batch": BATCH,
            "shape": f"H=W=K={K},C={C},q_chunk={Q_CHUNK}",
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
