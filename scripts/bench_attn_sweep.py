"""Parameter sweep of the gather-free matmul attention on the real chip.

The stage-cut breakdown (bench_attn_stages.py) is fusion-sensitive: cutting
the chunk body changes what XLA fuses, so stage deltas come out non-monotone
(the 'weights' cut measured FASTER than the bare 'profiles' cut).  This
script decomposes cost the robust way — scale one problem dimension at a
time against the REAL `epipolar_attention_matmul_batch` API and fit:

  * C (feature channels) only affects the Gram + output matmuls,
  * K (samples/line) only affects profiles / T / sim / n_mat,
  * q_chunk trades loop count against per-step working set.

Chained-dependency timing as in bench.py: iteration i+1's query features
carry a denormal-scaled reduction of iteration i's output, one fetch at the
end, divide once.

Run on the real TPU:  python scripts/bench_attn_sweep.py
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


def timed(H, W, K, C, q_chunk, iters=ITERS, pad_k=True):
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops import epipolar_attention_matmul as mm
    from epipolar_transformers_tpu.ops.epipolar_attention import AttentionParams
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        epipolar_attention_matmul_batch,
    )

    # K<64 is padded to 64 by default (_PAD_K); the -nopad cases disable it
    # so the regression that motivated the pad stays measurable
    mm._PAD_K = 64 if pad_k else 0

    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1.0 / np.sqrt(K))
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    o1 = jnp.asarray(rng.randn(BATCH, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    s = jnp.asarray((rng.rand(BATCH, K, H, W, 2) * 2.2 - 1.1).astype(
        np.float32))

    def step(carry_f1, _):
        out, _, _ = epipolar_attention_matmul_batch(
            carry_f1, o1, o1, s, params, q_chunk=q_chunk, remat=False)
        r = jnp.sum(out.astype(jnp.float32))
        return carry_f1 + (r * 1e-30).astype(carry_f1.dtype), None

    chained = jax.jit(lambda f: jax.lax.scan(step, f, None, length=iters)[0])
    _ = np.asarray(jnp.sum(chained(f1)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(chained(f1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    cases = [
        # label, H, K, C, q_chunk, pad_k
        ("flagship", 64, 64, 256, 32, True),
        ("C/2", 64, 64, 128, 32, True),
        ("C/4", 64, 64, 64, 32, True),
        ("K/2", 64, 32, 256, 32, True),
        ("K/4", 64, 16, 256, 32, True),
        ("K/2-nopad", 64, 32, 256, 32, False),
        ("K/4-nopad", 64, 16, 256, 32, False),
        ("q16", 64, 64, 256, 16, True),
        ("q64", 64, 64, 256, 64, True),
        ("q8", 64, 64, 256, 8, True),
        ("q4096", 64, 64, 256, 4096, True),
    ]
    for label, H, K, C, q, pad in cases:
        ms = timed(H, H, K, C, q, pad_k=pad)
        print(json.dumps({"case": label, "H": H, "K": K, "C": C,
                          "q_chunk": q, "pad_k": pad,
                          "ms_per_iter": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
