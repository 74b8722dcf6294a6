"""Bisect the tent-kernel hardware parity failure by shape.

probe_pallas_tent.py found the kernel lowers + runs on the v5e but
disagrees with the matmul path at the flagship shape (max abs err ~1.7),
while the 16x16 interpreter tests are exact.  This script sweeps shapes on
the REAL chip and, per shape, reports max abs err on out / depth so we can
see where the hardware lowering diverges (QT tiling? H rows? K lanes?).

Run on the real TPU:  python scripts/probe_pallas_parity.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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

    shapes = [
        # (N, H, W, K, C)
        (2, 16, 16, 8, 64),    # the interpreter-test shape
        (2, 16, 16, 64, 64),   # grow K
        (2, 64, 64, 8, 64),    # grow HW (QT tiling engages)
        (2, 64, 64, 64, 64),   # flagship grid, small C
        (2, 64, 64, 64, 256),  # flagship shape
    ]
    rng = np.random.RandomState(0)
    for (N, H, W, K, C) in shapes:
        f1 = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
        f2 = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
        locs = jnp.asarray(
            (rng.rand(N, K, H, W, 2) * 2.2 - 1.1).astype(np.float32))
        params = AttentionParams(softmax_scale=1.0 / np.sqrt(K))
        out, _, depth = epipolar_attention_pallas(
            f1, f2, locs, params, profile_mode="tent")
        r_out, _, r_depth = epipolar_attention_matmul_batch(
            f1, f2, f2, locs, params)
        err = float(np.max(np.abs(np.asarray(out) - np.asarray(r_out))))
        derr = float(np.max(np.abs(np.asarray(depth) - np.asarray(r_depth))))
        bad = int(np.sum(
            np.max(np.abs(np.asarray(depth) - np.asarray(r_depth)),
                   axis=1) > 1e-3))
        print(json.dumps({
            "shape": [N, H, W, K, C], "out_err": round(err, 6),
            "depth_err": round(derr, 6), "bad_queries": bad,
            "total_queries": N * H * W,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
