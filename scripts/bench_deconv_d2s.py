"""Deconv-head probe: ConvTranspose 4x4/s2 vs phase-conv + depth-to-space.

The head's transposed convs lower onto input-dilated convs (3/4 of the
spatial taps multiply stuffed zeros).  Exact reformulation: a stride-2 4x4
ConvTranspose (SAME, output 2H; jax pads the dilated input lo=hi=2) splits
into 4 output phases, each a 2x2 regular conv over the UNdilated input:

  O(2v+r, 2x+s, o) = sum_{m,n,c} W(r+2m, s+2n, c, o) X(v+m-(1-r), x+n-(1-s), c)

i.e. phase r uses kernel slice W[r::2] and reads window {v-1, v} (r=0) or
{v, v+1} (r=1).  Two equivalent formulations benchmarked:

  * 4conv: four 2x2 convs with per-phase asymmetric padding, interleaved
    (minimal MACs = the transposed conv's useful MACs)
  * 3x3: one conv, phase kernels zero-embedded in a 3x3 window over the
    once-padded input (2.25x minimal MACs but a single big MXU conv with
    4*Cout output lanes)

Run on the real TPU:  python scripts/bench_deconv_d2s.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ITERS = 30


def _interleave(phases, cout):
    """phases[(r,s)] each (B,H,W,C) -> (B,2H,2W,C)."""
    import jax.numpy as jnp

    B, H, W, C = phases[(0, 0)].shape
    y = jnp.stack([phases[(0, 0)], phases[(0, 1)],
                   phases[(1, 0)], phases[(1, 1)]], axis=-2)
    y = y.reshape(B, H, W, 2, 2, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(B, 2 * H, 2 * W, C)


def deconv_4conv(x, w):
    from jax import lax

    cout = w.shape[3]
    pads = {0: (1, 0), 1: (0, 1)}
    phases = {}
    for r in (0, 1):
        for s in (0, 1):
            phases[(r, s)] = lax.conv_general_dilated(
                x, w[r::2, s::2], (1, 1), (pads[r], pads[s]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _interleave(phases, cout)


def kernel_3x3(w):
    """(4,4,Cin,Cout) -> (3,3,Cin,4*Cout) zero-embedded phase kernels.

    On input padded by ((1,1),(1,1)), tap t covers X(v-1+t); phase r=0 needs
    {v-1, v} -> taps {0,1}, r=1 needs {v, v+1} -> taps {1,2}.
    """
    import jax.numpy as jnp

    Cin, Cout = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, Cin, 4 * Cout), w.dtype)
    for r in (0, 1):
        for s in (0, 1):
            o = (r * 2 + s) * Cout
            sub = w[r::2, s::2]  # (2,2,Cin,Cout); tap m -> t = m + r
            k = k.at[r:r + 2, s:s + 2, :, o:o + Cout].set(sub)
    return k


def deconv_3x3(x, k3, cout):
    import jax.numpy as jnp
    from jax import lax

    y = lax.conv_general_dilated(
        x, k3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, H, W, _ = y.shape
    y = y.reshape(B, H, W, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(B, 2 * H, 2 * W, cout)


def check_equivalence():
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 5).astype(np.float32))
    w = jnp.asarray((rng.randn(4, 4, 5, 7) * 0.2).astype(np.float32))
    ref = lax.conv_transpose(x, w, (2, 2), "SAME",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
    for name, got in [("4conv", deconv_4conv(x, w)),
                      ("3x3", deconv_3x3(x, kernel_3x3(w), 7))]:
        d = float(jnp.max(jnp.abs(ref - got)))
        print(json.dumps({"check": f"d2s_equivalence_{name}",
                          "max_abs_diff": d,
                          "ref_max": float(jnp.max(jnp.abs(ref)))}),
              flush=True)
        assert d < 1e-4, (name, d)


def timed(fn, x):
    import jax
    import jax.numpy as jnp

    def step(carry, _):
        out = fn(carry[0])
        r = jnp.sum(out.astype(jnp.float32))
        return (carry[0] + (r * 1e-30).astype(carry[0].dtype),), None

    chained = jax.jit(
        lambda v: jax.lax.scan(step, (v,), None, length=ITERS)[0][0])
    _ = np.asarray(jnp.sum(chained(x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(chained(x)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main():
    import jax.numpy as jnp
    from jax import lax

    check_equivalence()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, 8, 8, 2048).astype(np.float32)).astype(
        jnp.bfloat16)
    ws = [jnp.asarray((rng.randn(4, 4, cin, 256) * 0.05).astype(np.float32)
                      ).astype(jnp.bfloat16)
          for cin in (2048, 256, 256)]
    k3s = [kernel_3x3(w) for w in ws]

    def head_ref(v):
        h = v
        for w in ws:
            h = lax.conv_transpose(h, w, (2, 2), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.maximum(h, 0)
        return h

    def head_4conv(v):
        h = v
        for w in ws:
            h = jnp.maximum(deconv_4conv(h, w), 0)
        return h

    def head_3x3(v):
        h = v
        for k3 in k3s:
            h = jnp.maximum(deconv_3x3(h, k3, 256), 0)
        return h

    for name, fn in [("head_conv_transpose", head_ref),
                     ("head_4conv_d2s", head_4conv),
                     ("head_3x3_d2s", head_3x3)]:
        print(json.dumps({"case": name, "ms_per_iter":
                          round(timed(fn, x), 4)}), flush=True)


if __name__ == "__main__":
    main()
