"""Probe: do 128-minor layouts unlock the chunk-einsum cost?

PERF.md (round 4) attributes the attention's ~4.5x headroom-to-matmul-floor
to XLA's lowering of the per-query batched small contractions: every
(.., 64)-minor tensor (xprof/yprof/G/T at the flagship H=W=K=64 shape) pays
half-empty 128-lane tiles, and the chunk einsums lower to
convolution-base-dilated ops.  The one knob never measured is *physically
padding the minor dims to 128*: zero columns are exact (a zero profile
column contributes nothing to T/sim/n_mat; zero-padded value rows add 0 to
the fused output), so if XLA picks a better layout/emitter for 128-minor
operands, the pad is a free exactness-preserving rewrite.

This script times the bare chunk einsum chain (Gram -> profiles -> T ->
sim -> softmax -> n_mat -> out), replicated inline from
ops/epipolar_attention_matmul.py, in four variants:

  base     : production shapes (K=H=W=64 minors)
  padW     : xprof + G padded to W'=128 (contraction lanes full)
  padHW    : both spatial profile axes padded to 128
  padKHW   : sample axis padded to 128 too (all minors 128)

Chained-dependency timing as in bench.py.  Run on the real TPU:
    python scripts/bench_attn_pad128.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PAD128_BATCH", 8))
ITERS = int(os.environ.get("PAD128_ITERS", 20))
H = W = K = int(os.environ.get("PAD128_HWK", 64))
C = int(os.environ.get("PAD128_C", 256))
Q = min(64, H * W)


def run(pad_w, pad_h, pad_k, iters=ITERS, return_out=False):
    import jax
    import jax.numpy as jnp

    from epipolar_transformers_tpu.ops.quad_gather import _axis_slot_weights

    Wp = 128 if pad_w else W
    Hp = 128 if pad_h else H
    Kp = 128 if pad_k else K
    HW = H * W
    nc = HW // Q

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(BATCH, HW, C).astype(np.float32)).astype(
        jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(BATCH, HW, C).astype(np.float32)).astype(
        jnp.bfloat16)
    # value tensor padded with zero rows up to Hp*Wp when spatially padded
    locs = (rng.rand(BATCH, HW, K, 2) * 2.2 - 1.1).astype(np.float32)
    x = jnp.asarray((locs[..., 0] + 1.0) / 2.0 * (W - 1))
    y = jnp.asarray((locs[..., 1] + 1.0) / 2.0 * (H - 1))

    def attn(f1b, f2b, xb, wx0, wx1, yb, wy0, wy1):
        def item(f1i, f2i, xbi, wx0i, wx1i, ybi, wy0i, wy1i):
            if Wp != W or Hp != H:
                f2sp = f2i.reshape(H, W, C)
                f2sp = jnp.pad(f2sp, ((0, Hp - H), (0, Wp - W), (0, 0)))
                f2flat = f2sp.reshape(Hp * Wp, C)
            else:
                f2flat = f2i

            def chunk(c):
                iw = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wp), 2)
                ih = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Hp), 2)
                zero = jnp.zeros((), jnp.float32)

                def prof(i, b, w0, w1):
                    b = b[..., None]
                    p = jnp.where(i == b, w0[..., None], zero) + jnp.where(
                        i == b + 1, w1[..., None], zero)
                    return p.astype(jnp.bfloat16)

                xprof = prof(iw, c["xb"], c["wx0"], c["wx1"])  # (Q, Kp, Wp)
                yprof = prof(ih, c["yb"], c["wy0"], c["wy1"])  # (Q, Kp, Hp)
                G = jnp.einsum("qc,pc->qp", c["f1"], f2i,
                               preferred_element_type=jnp.float32
                               ).reshape(Q, H, W)
                if Wp != W or Hp != H:
                    G = jnp.pad(G, ((0, 0), (0, Hp - H), (0, Wp - W)))
                T = jnp.einsum("qyx,qkx->qky", G.astype(jnp.bfloat16), xprof,
                               preferred_element_type=jnp.float32)
                sim = jnp.einsum("qky,qky->qk", T.astype(jnp.bfloat16), yprof,
                                 preferred_element_type=jnp.float32)
                wgt = jax.nn.softmax(
                    jnp.where(sim == 0.0, -1e10, sim) / np.sqrt(K), axis=-1)
                n_mat = jnp.einsum(
                    "qky,qkx->qyx",
                    (yprof * wgt[..., None].astype(jnp.bfloat16)), xprof,
                    preferred_element_type=jnp.float32,
                ).reshape(Q, Hp * Wp).astype(jnp.bfloat16)
                out = jnp.einsum("qp,pc->qc", n_mat, f2flat,
                                 preferred_element_type=jnp.float32)
                return out

            xs = {
                "f1": f1i.reshape(nc, Q, C),
                "xb": xbi.reshape(nc, Q, Kp),
                "wx0": wx0i.reshape(nc, Q, Kp),
                "wx1": wx1i.reshape(nc, Q, Kp),
                "yb": ybi.reshape(nc, Q, Kp),
                "wy0": wy0i.reshape(nc, Q, Kp),
                "wy1": wy1i.reshape(nc, Q, Kp),
            }
            return jax.lax.map(chunk, xs)

        return jax.vmap(item)(f1b, f2b, xb, wx0, wx1, yb, wy0, wy1)

    xb, wx0, wx1 = _axis_slot_weights(x, W)
    yb, wy0, wy1 = _axis_slot_weights(y, H)
    if Kp != K:
        padk = lambda a, v: jnp.pad(a, ((0, 0), (0, 0), (0, Kp - K)),
                                    constant_values=v)
        # padded sample slots: base -2 (never matches iota), zero weights
        xb, wx0, wx1 = padk(xb, -2), padk(wx0, 0.0), padk(wx1, 0.0)
        yb, wy0, wy1 = padk(yb, -2), padk(wy0, 0.0), padk(wy1, 0.0)

    def step(carry_f1, _):
        out = attn(carry_f1, f2, xb, wx0, wx1, yb, wy0, wy1)
        r = jnp.sum(out.astype(jnp.float32))
        return carry_f1 + (r * 1e-30).astype(carry_f1.dtype), None

    if return_out:
        return np.asarray(
            jax.jit(attn)(f1, f2, xb, wx0, wx1, yb, wy0, wy1),
            dtype=np.float32)

    chained = jax.jit(lambda f: jax.lax.scan(step, f, None, length=iters)[0])
    _ = np.asarray(jnp.sum(chained(f1)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(chained(f1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    if os.environ.get("PAD128_CPU"):  # correctness smoke off the tunnel
        import jax

        jax.config.update("jax_platforms", "cpu")
        base = run(False, False, False, return_out=True)
        for label, pw, ph, pk in [("padW", True, False, False),
                                  ("padHW", True, True, False),
                                  ("padKHW", True, True, True)]:
            err = np.abs(run(pw, ph, pk, return_out=True) - base).max()
            print(f"exactness {label:7s} max|d| = {err:.3e}")
            # padding reassociates the f32 accumulations (zeros are exact,
            # reduction order is not) — tight tolerance, not bit-equality
            assert err < 1e-5, (label, err)
    for label, pw, ph, pk in [
        ("base  (64-minor)", False, False, False),
        ("padW  (Wp=128)", True, False, False),
        ("padHW (Hp=Wp=128)", True, True, False),
        ("padKHW (all 128)", True, True, True),
    ]:
        ms = run(pw, ph, pk)
        print(f"{label:20s} {ms:7.2f} ms/iter")


if __name__ == "__main__":
    main()
