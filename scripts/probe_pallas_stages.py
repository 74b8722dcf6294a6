"""Isolate which _kernel_tent stage mis-lowers on the real v5e.

probe_pallas_parity.py shows the tent kernel is interpreter-exact but
systematically wrong on hardware at every shape.  This probe runs ONE
pallas program (single tile, no grid) that emits each intermediate stage
as an output and compares against numpy:

  A. x2   = rank-1 dot_general lane-broadcast of x along W
  B. xprof = relu(1 - |iota - x2|)             (tent profile)
  C. G    = per-row dot f1 @ f2[y].T via fori_loop + scratch writes
  D. T    = batched dot_general G x xprof      (QT,H,K)

Run on the real TPU:  python scripts/probe_pallas_stages.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = W = 8
K = 8
C = 128
QT = H * W


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(f1_ref, f2_ref, x_ref, y_ref, ones_w_ref,
             x2_ref, xprof_ref, g_ref, t_ref, g_scratch):
        f1t = f1_ref[0]

        def g_row(yy, _):
            row = f2_ref[0, pl.ds(yy, 1)][0]
            g = jax.lax.dot_general(
                f1t, row, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            g_scratch[:, pl.ds(yy, 1), :] = g[:, None, :]
            return 0

        jax.lax.fori_loop(0, H, g_row, 0)
        g_ref[0] = g_scratch[:]

        x2 = jax.lax.dot_general(
            x_ref[0][..., None], ones_w_ref[0],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        x2_ref[0] = x2

        xi = jax.lax.broadcasted_iota(
            jnp.int32, (QT, K, W), 2).astype(jnp.float32)
        xprof = jnp.maximum(1.0 - jnp.abs(xi - x2), 0.0)
        xprof_ref[0] = xprof

        t_ref[0] = jax.lax.dot_general(
            g_scratch[:], xprof,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    rng = np.random.RandomState(0)
    f1 = rng.randn(1, QT, C).astype(np.float32)
    f2 = rng.randn(1, H, W, C).astype(np.float32)
    x = (rng.rand(1, QT, K).astype(np.float32) * (W + 1)) - 1.0
    y = (rng.rand(1, QT, K).astype(np.float32) * (H + 1)) - 1.0
    ones_w = np.ones((1, QT, 1, W), np.float32)

    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        in_specs=[vm((1, QT, C)), vm((1, H, W, C)), vm((1, QT, K)),
                  vm((1, QT, K)), vm((1, QT, 1, W))],
        out_specs=[vm((1, QT, K, W)), vm((1, QT, K, W)),
                   vm((1, QT, H, W)), vm((1, QT, H, K))],
        out_shape=[
            jax.ShapeDtypeStruct((1, QT, K, W), jnp.float32),
            jax.ShapeDtypeStruct((1, QT, K, W), jnp.float32),
            jax.ShapeDtypeStruct((1, QT, H, W), jnp.float32),
            jax.ShapeDtypeStruct((1, QT, H, K), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((QT, H, W), jnp.float32)],
    )(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(x), jnp.asarray(y),
      jnp.asarray(ones_w))
    x2_hw, xprof_hw, g_hw, t_hw = (np.asarray(o[0]) for o in outs)

    # numpy references
    x2_np = np.broadcast_to(x[0][..., None], (QT, K, W))
    xi = np.arange(W, dtype=np.float32)[None, None, :]
    xprof_np = np.maximum(1.0 - np.abs(xi - x2_np), 0.0)
    g_np = np.einsum("qc,hwc->qhw", f1[0], f2[0])
    t_np = np.einsum("qhw,qkw->qhk", g_np, xprof_np)

    for name, hw, ref in [("A_x2", x2_hw, x2_np),
                          ("B_xprof", xprof_hw, xprof_np),
                          ("C_G", g_hw, g_np),
                          ("D_T", t_hw, t_np)]:
        err = float(np.max(np.abs(hw - ref)))
        print(json.dumps({"stage": name, "max_abs_err": round(err, 6)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
