"""Layout experiment: profile tensors built in canonical dot layouts.

Hypothesis (from bench_attn_sweep.py's flat C-scaling): the XLA matmul
attention path spends most of its time NOT on MXU FLOPs but on relayouts —
the T/n_mat batched einsums receive profile operands in layouts that force
transposes.  This script re-expresses the chunk body with profiles built
directly in canonical (batch, K, N) / A.B^T forms:

    xprofT: (Q, W, K)  — T       = einsum('qyx,qxk->qyk', G, xprofT)
    yprofT: (Q, H, K)  — sim     = reduce_y(T * yprofT)
                       — n_mat   = einsum('qyk,qxk->qyx', w*yprofT, xprofT)

so every contraction is already in the form the TPU dot emitter wants.

Run on the real TPU:  python scripts/bench_attn_layout.py
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


def build_layout_fn(q_chunk=64, prof_f32=False):
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.epipolar_attention import NEG_INF
    from epipolar_transformers_tpu.ops.quad_gather import _axis_slot_weights
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        _largest_divisor,
    )

    scale = 1.0 / np.sqrt(K)

    def one_item(feat1, other1, other2, sample_locs):
        HW = H * W
        prof_dtype = jnp.float32 if prof_f32 else jnp.bfloat16
        locs = sample_locs.reshape(K, HW, 2).transpose(1, 0, 2).astype(
            jnp.float32)
        x = (locs[..., 0] + 1.0) / 2.0 * (W - 1)
        y = (locs[..., 1] + 1.0) / 2.0 * (H - 1)
        xb, wx0, wx1 = _axis_slot_weights(x, W)  # (HW, K)
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

        def profT(base, w0, w1, size):
            # (Q, size, K) one-hot profile: iota over the SUBLANE dim
            i = jax.lax.broadcasted_iota(jnp.int32, (1, size, 1), 1)
            b = base[:, None, :]  # (Q, 1, K)
            zero = jnp.zeros((), jnp.float32)
            prof = jnp.where(i == b, w0[:, None, :], zero) + jnp.where(
                i == b + 1, w1[:, None, :], zero
            )
            return prof.astype(prof_dtype)

        def chunk(c):
            xprofT = profT(c["xb"], c["wx0"], c["wx1"], W)  # (Q, W, K)
            yprofT = profT(c["yb"], c["wy0"], c["wy1"], H)  # (Q, H, K)
            G = jnp.einsum(
                "qc,pc->qp", c["f1"], f2k, preferred_element_type=jnp.float32
            ).reshape(Q, H, W)
            T = jnp.einsum(
                "qyx,qxk->qyk", G.astype(prof_dtype), xprofT,
                preferred_element_type=jnp.float32,
            )  # (Q, H, K) — canonical (batch, M, K)x(batch, K, N)
            sim = jnp.sum(
                T.astype(prof_dtype).astype(jnp.float32)
                * yprofT.astype(jnp.float32),
                axis=1,
            )  # (Q, K)
            masked = jnp.where(sim == 0.0, NEG_INF, sim)
            w = jax.nn.softmax(masked * jnp.float32(scale), axis=-1)
            wy = (yprofT * w[:, None, :].astype(prof_dtype))
            n_mat = jnp.einsum(
                "qyk,qxk->qyx", wy, xprofT,
                preferred_element_type=jnp.float32,
            ).reshape(Q, HW).astype(jnp.bfloat16)  # A.B^T canonical
            out_c = jnp.einsum(
                "qp,pc->qc", n_mat, f2v, preferred_element_type=jnp.float32
            )
            return out_c

        out = jax.lax.map(chunk, xs)
        return out.reshape(H, W, -1)

    return jax.jit(jax.vmap(one_item))


def chained_time(fn, f1, o1, o2, s, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def step(carry, _):
        out = fn(carry, o1, o2, s)
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


def main():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    o1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    s = jnp.asarray((rng.rand(BATCH, K, H, W, 2) * 2.2 - 1.1).astype(
        np.float32))

    # correctness vs production path first
    from epipolar_transformers_tpu.ops.epipolar_attention import (
        AttentionParams,
    )
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        epipolar_attention_matmul_batch,
    )
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1.0 / np.sqrt(K))
    ref = epipolar_attention_matmul_batch(
        f1, o1, o1, s, params, remat=False)[0]
    fn = build_layout_fn()
    got = fn(f1, o1, o1, s)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(json.dumps({"layoutT_vs_matmul_max_err": err}), flush=True)

    for label, kw in (
        ("layoutT_q64", dict(q_chunk=64)),
        ("layoutT_q128", dict(q_chunk=128)),
        ("layoutT_q64_f32prof", dict(q_chunk=64, prof_f32=True)),
        ("layoutT_q256", dict(q_chunk=256)),
    ):
        ms = chained_time(build_layout_fn(**kw), f1, o1, o1, s)
        print(json.dumps({"case": label, "ms_per_iter": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
