"""Space-to-depth stem probe: is the 7x7/s2 conv1 worth reformulating?

The ResNet stem conv (7x7, stride 2, pad 3, C_in=3) is the classic TPU
pathology: 3 input channels means the MXU contraction dim is 3/128 full.
The MLPerf-era fix re-lays the input as 2x2 space-to-depth blocks
((B,256,256,3) -> (B,128,128,12)) and the 7x7/s2 kernel as an equivalent
4x4/s1 kernel over 12 channels (zero-padding the kernel to 8x8 first):

  O(i,j,o) = sum_{a,b,c} W(a,b,c,o) X(2i+a-3, 2j+b-3, c)
           = sum_{p,q,r,s,c} W'(2p+r, 2q+s, c, o) X2(i+p-2, j+q-2, (r,s,c))

with W' the 8x8 zero-leading-edge pad of W, X2 the s2d input, i.e. a 4x4
conv with asymmetric padding ((2,1),(2,1)) in block space.  Exact up to
f32 reassociation.

This script (a) proves the equivalence numerically, (b) times both stems
and both full trunk variants on the device.  Run on the real TPU:
    python scripts/bench_stem_s2d.py
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


def s2d_input(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C) with (r, s, c) channel order."""
    import jax.numpy as jnp

    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2, 4 * C)


def s2d_kernel(w):
    """(7, 7, C, O) HWIO -> (4, 4, 4C, O) equivalent s2d kernel."""
    import jax.numpy as jnp

    C, O = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 8x8, zero leading edge
    wp = wp.reshape(4, 2, 4, 2, C, O)  # (p, r, q, s, c, o)
    return jnp.transpose(wp, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 4 * C, O)


def check_equivalence():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)

    ref = lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = lax.conv_general_dilated(
        s2d_input(x), s2d_kernel(w), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    d = float(jnp.max(jnp.abs(ref - got)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(json.dumps({"check": "s2d_equivalence", "max_abs_diff": d,
                      "ref_max": scale}), flush=True)
    assert d < 1e-4 * max(scale, 1.0), d


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
    import jax
    import jax.numpy as jnp
    from jax import lax

    check_equivalence()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, 256, 256, 3).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray((rng.randn(7, 7, 3, 64) * 0.1).astype(np.float32)).astype(
        jnp.bfloat16)
    x2 = np.asarray(s2d_input(x))
    x2 = jnp.asarray(x2)
    w2 = s2d_kernel(w)

    def stem_ref(v):
        h = lax.conv_general_dilated(
            v, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = nnrelu(h)
        return lax.reduce_window(
            h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    def stem_s2d(v):
        h = lax.conv_general_dilated(
            v, w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = nnrelu(h)
        return lax.reduce_window(
            h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    def nnrelu(h):
        return jnp.maximum(h, 0)

    print(json.dumps({"case": "stem_7x7_s2", "ms_per_iter":
                      round(timed(stem_ref, x), 4)}), flush=True)
    print(json.dumps({"case": "stem_s2d_4x4", "ms_per_iter":
                      round(timed(stem_s2d, x2), 4)}), flush=True)
    # s2d including the on-device input re-layout (what production would pay
    # if the loader still emits NHWC images)
    print(json.dumps({"case": "stem_s2d_incl_relayout", "ms_per_iter":
                      round(timed(lambda v: stem_s2d(s2d_input(v)), x), 4)}),
          flush=True)


if __name__ == "__main__":
    main()
