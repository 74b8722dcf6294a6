"""Fused Pallas (Mosaic) kernel for the gather-free epipolar attention.

Same math as ops/epipolar_attention_matmul.py (the Gram + one-hot-profile
formulation of the reference `Epipolar.forward` similarity/softmax/fusion,
modeling/layers/epipolar.py:188-247,272-321), restructured as a hybrid:

  XLA:    G = f1 @ f2k^T                       (B, HW, HW)  one big matmul
  Pallas: xprof/yprof one-hot profiles          VPU iota compare
          T    = batched_dot(G(Q,H,W), xprof)   contract W, batch Q
          sim  = sum_y yprof * T                VPU reduce
          w    = softmax(mask(sim) * scale)     VPU
          n    = batched_dot(yprof * w, xprof)  contract K, batch Q
  XLA:    out = n @ f2v                         (B, HW, Cv)  one big matmul

Why hybrid: a C-channel scaling sweep (scripts/bench_attn_sweep.py, real
v5e) shows the two big MXU matmuls (17 of 21 GFLOP/item) cost ~1 ms of the
XLA path's 6.7 ms/iter — the other ~5.7 ms is XLA materializing the
profile/T intermediates between fusions (HBM round trips) plus layout
changes.  The kernel fuses exactly that middle, so the profiles and T
never leave VMEM; the two matmuls stay in XLA where they run at high MXU
utilization on (4096, 256, 4096) shapes.  Fusing them INTO the kernel was
measured/ruled out structurally: Mosaic cannot reshape (Q, HW) <-> (Q, H,
W) in-kernel ("unsupported shape cast") and rejects multi-dim contractions
("lhs contracting dims must be of size 1"), so an in-kernel Gram would
need H-batched small matmuls at ~25% MXU utilization — slower than XLA's
flat form plus the G round trip.

The zero-sentinel masking semantics are identical to the XLA paths: an
out-of-range corner gets profile weight exactly 0 (quad_gather.
_axis_slot_weights), a fully out-of-range sample yields sim == 0.0 and is
masked to NEG_INF, reproducing the reference's zero-padding sentinel
(epipolar.py:298).

Forward-only: training keeps the XLA matmul path (whose chunk remat is
what autodiff needs); models/epipolar.py dispatches here for inference on
TPU.  On CPU (tests) the kernel runs in Pallas interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.camera import denormalize_pixel
from .epipolar_attention import NEG_INF, AttentionParams
from .epipolar_attention_matmul import _largest_divisor
from .quad_gather import _axis_slot_weights


def supports_pallas_attention(params: AttentionParams) -> bool:
    """Configs the fused kernel covers: avg attention over dot or prior
    similarity (the flagship family).  cos/max need the shifted self-dot
    norm machinery and sample POOLING is non-linear — both stay on the XLA
    paths (matmul / streaming)."""
    return (
        params.attention == "avg"
        and params.similarity in ("dot", "prior")
        and not params.pooling
    )


def _make_kernel(params: AttentionParams, H, W, K, Q, has_prior,
                 compute_dtype):
    use_gram = params.similarity != "prior"

    def kernel(*refs):
        it = iter(refs)
        xb_ref, wx0_ref, wx1_ref, yb_ref, wy0_ref, wy1_ref = (
            next(it) for _ in range(6))
        g_ref = next(it) if use_gram else None
        prior_ref = next(it) if has_prior else None
        n_ref, depth_ref = next(it), next(it)

        # bilinear profiles, built directly in their consumption layouts
        ix = jax.lax.broadcasted_iota(jnp.int32, (Q, K, W), 2)
        xb = xb_ref[0][..., None]  # (Q, K, 1)
        zero = jnp.zeros((), jnp.float32)
        xprof = (
            jnp.where(ix == xb, wx0_ref[0][..., None], zero)
            + jnp.where(ix == xb + 1, wx1_ref[0][..., None], zero)
        ).astype(compute_dtype)  # (Q, K, W)
        iy = jax.lax.broadcasted_iota(jnp.int32, (Q, H, K), 1)
        yb = yb_ref[0][:, None, :]  # (Q, 1, K)
        yprof = (
            jnp.where(iy == yb, wy0_ref[0][:, None, :], zero)
            + jnp.where(iy == yb + 1, wy1_ref[0][:, None, :], zero)
        ).astype(compute_dtype)  # (Q, H, K)

        if not use_gram:
            w = prior_ref[0].astype(jnp.float32)  # (Q, K)
            depth_ref[0] = w
        else:
            T = jax.lax.dot_general(
                g_ref[0].astype(compute_dtype), xprof,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (Q, H, K)
            sim = jnp.sum(
                T.astype(compute_dtype).astype(jnp.float32)
                * yprof.astype(jnp.float32),
                axis=1,
            )  # (Q, K)
            masked = jnp.where(sim == 0.0, jnp.float32(NEG_INF), sim)
            if has_prior and not params.priormul:
                masked = masked + prior_ref[0]
            if params.softmax_enabled:
                w = jax.nn.softmax(
                    masked * jnp.float32(params.softmax_scale), axis=-1)
                if has_prior and params.priormul:
                    w = w * prior_ref[0]
            else:
                w = masked / jnp.float32(K)
            depth_ref[0] = w

        wy = (yprof.astype(jnp.float32) * w[:, None, :]).astype(
            compute_dtype)  # (Q, H, K)
        n_ref[0] = jax.lax.dot_general(
            wy, xprof,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(n_ref.dtype)  # (Q, H, W)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("params", "H", "W", "q_block", "interpret"),
)
def _pallas_attention(xb, wx0, wx1, yb, wy0, wy1, f1, f2k, f2v, prior,
                      params: AttentionParams, H, W, q_block, interpret):
    """Batched fused attention.  All location args (B, HW, K); features
    (B, HW, C).  Returns out (B, HW, Cv) f32, depth (B, HW, K) f32."""
    B, HW, K = xb.shape
    Q = _largest_divisor(HW, q_block)
    nc = HW // Q
    has_prior = prior is not None
    use_gram = params.similarity != "prior"
    compute_dtype = (
        jnp.bfloat16
        if (f1.dtype == jnp.bfloat16 or f2k.dtype == jnp.bfloat16)
        else jnp.float32
    )

    kernel = _make_kernel(
        params, int(H), int(W), K, Q, has_prior, compute_dtype)

    def loc_spec():
        return pl.BlockSpec((1, Q, K), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [loc_spec() for _ in range(6)]
    args = [xb, wx0, wx1, yb, wy0, wy1]
    if use_gram:
        # the big matmul stays in XLA (high-MFU flat shape); the 4D view
        # is free in HBM and gives the kernel natively-tiled (Q, H, W)
        # blocks, dodging Mosaic's unsupported in-kernel reshape
        G = jnp.einsum(
            "bqc,bpc->bqp", f1, f2k, preferred_element_type=jnp.float32
        ).astype(compute_dtype).reshape(B, HW, H, W)
        in_specs.append(
            pl.BlockSpec((1, Q, H, W), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(G)
    if has_prior:
        in_specs.append(loc_spec())
        args.append(prior)

    n4, depth = pl.pallas_call(
        kernel,
        grid=(B, nc),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Q, H, W), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, K), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, HW, H, W), compute_dtype),
            jax.ShapeDtypeStruct((B, HW, K), jnp.float32),
        ),
        interpret=interpret,
    )(*args)

    out = jnp.einsum(
        "bqp,bpc->bqc", n4.reshape(B, HW, HW), f2v,
        preferred_element_type=jnp.float32,
    )
    return out, depth


def epipolar_attention_pallas_batch(
    feat1: jnp.ndarray,
    other1: jnp.ndarray,
    other2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    prior: jnp.ndarray | None = None,
    q_block: int = 64,
):
    """Drop-in for epipolar_attention_matmul_batch on supported configs.

    Args:
        feat1/other1/other2: (B, H, W, C) NHWC features.
        sample_locs: (B, K, H, W, 2) normalized (-1, 1) locations.
        prior: optional (B, K, H, W) per-pair prior.
    Returns:
        out (B, H, W, Cv) in other2's dtype, corr_pos (B, H, W, 2),
        depth (B, K, H, W) — identical contract to the XLA paths.
    """
    assert supports_pallas_attention(params), params
    B, H, W, _ = feat1.shape
    K = sample_locs.shape[1]
    HW = H * W

    sample_locs = jax.lax.stop_gradient(sample_locs)
    # (B, K, H, W, 2) -> (B, HW, K, 2), align_corners=True unnormalize
    locs = sample_locs.reshape(B, K, HW, 2).transpose(0, 2, 1, 3).astype(
        jnp.float32)
    x = (locs[..., 0] + 1.0) / 2.0 * (W - 1)
    y = (locs[..., 1] + 1.0) / 2.0 * (H - 1)
    xb, wx0, wx1 = _axis_slot_weights(x, W)
    yb, wy0, wy1 = _axis_slot_weights(y, H)

    f1 = feat1.reshape(B, HW, -1)
    f2k = other1.reshape(B, HW, -1)
    f2v = other2.reshape(B, HW, -1)
    if f1.dtype == jnp.bfloat16 or f2k.dtype == jnp.bfloat16:
        f2v = f2v.astype(jnp.bfloat16)
    prior_flat = (
        None if prior is None
        else prior.reshape(B, K, HW).transpose(0, 2, 1).astype(jnp.float32)
    )

    interpret = jax.default_backend() != "tpu"
    out, depth = _pallas_attention(
        xb, wx0, wx1, yb, wy0, wy1, f1, f2k, f2v, prior_flat,
        params=params, H=int(H), W=int(W), q_block=q_block,
        interpret=interpret)

    out = out.reshape(B, H, W, -1).astype(other2.dtype)
    best = jnp.argmax(depth, axis=-1).astype(jnp.int32)  # (B, HW)
    depth = depth.transpose(0, 2, 1).reshape(B, K, H, W)
    pos = jnp.take_along_axis(
        sample_locs.reshape(B, K, HW, 2),
        best[:, None, :, None], axis=1,
    )[:, 0].reshape(B, H, W, 2)
    corr_pos = jax.lax.stop_gradient(
        denormalize_pixel(pos, H, W, correct=params.correct_normalize)
    )
    return out, corr_pos, depth
