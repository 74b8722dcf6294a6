"""Gather-free epipolar attention via Gram-matrix + one-hot profile matmuls.

TPU-native reformulation of the similarity/softmax/fusion math of the
reference `Epipolar.forward` (modeling/layers/epipolar.py:188-247,272-321).

The streaming implementation (ops/epipolar_attention_streaming.py) is bound
by XLA's TPU gather lowering (~200GB/s, with unfusable per-corner HBM round
trips — PERF.md).  This module removes the gathers entirely by exploiting the
bilinearity of grid sampling:

    sim[q, k] = < f1[q], bilinear(f2, loc_qk) >
              = bilinear( < f1[q], f2[, ] >, loc_qk )            (linearity)
              = sum_y yprof[q,k,y] * sum_x xprof[q,k,x] * G[q,y,x]

with G = F1 @ F2^T the query/source Gram matrix and xprof/yprof the per-axis
bilinear interpolation profiles (two adjacent nonzeros each, built with iota
comparisons — no gather).  The fused output is likewise a matmul:

    out[q] = sum_k w[q,k] * bilinear(f2, loc_qk)
           = sum_{y,x} ( sum_k (w*yprof)[q,k,y] xprof[q,k,x] ) f2[y,x]
           =: N[q] @ F2

Everything is matmuls (MXU) + elementwise profile construction (VPU):
zero irregular memory access.  FLOP cost per item at the flagship shape
(H=W=64, K=64, C=256) is ~21 GFLOP — trivially MXU-bound.

Numerical parity with the oracle (ops/epipolar_attention.py) is exact in
structure: an out-of-range corner gets profile weight exactly 0 (same
validity masks as grid_sample_2d, via quad_gather._axis_slot_weights), so a
fully out-of-range sample yields sim == 0.0 exactly and is masked to -1e10,
reproducing the reference's zero-padding sentinel semantics
(epipolar.py:298).

Supported: attention='avg', similarity in ('dot', 'prior'), softmax on/off,
additive and multiplicative priors, shared or separate key/value tensors.
Not supported (falls back to streaming in models/epipolar.py): cosine
similarity, max attention, sample pooling — these are not linear in f2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.camera import denormalize_pixel
from .epipolar_attention import NEG_INF, AttentionParams
from .quad_gather import _axis_slot_weights


def supports_matmul_attention(params: AttentionParams) -> bool:
    """True when the gather-free formulation computes the exact reference
    semantics for this configuration."""
    return (
        params.attention == "avg"
        and params.similarity in ("dot", "prior")
        and not params.pooling
    )


def _largest_divisor(n: int, cap: int) -> int:
    d = min(cap, n)
    while n % d:
        d -= 1
    return d


def _profiles(base, w0, w1, size):
    """(Q, K) per-axis bilinear data -> (Q, K, size) interpolation profile.

    Exactly two (or fewer, at image borders) nonzeros per row; validity
    masking already encoded in w0/w1 by _axis_slot_weights."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    b = base[..., None]
    zero = jnp.zeros((), jnp.float32)
    return jnp.where(i == b, w0[..., None], zero) + jnp.where(
        i == b + 1, w1[..., None], zero
    )


def epipolar_attention_matmul(
    feat1: jnp.ndarray,
    other1: jnp.ndarray,
    other2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    prior: jnp.ndarray | None = None,
    q_chunk: int = 512,
):
    """Single-item epipolar attention, gather-free (drop-in for
    ops/epipolar_attention.epipolar_attention on supported configs).

    Args:
        feat1: (H, W, C) reference-view queries.
        other1: (H, W, Ck) source-view keys.
        other2: (H, W, Cv) source-view values.
        sample_locs: (K, H, W, 2) normalized (-1, 1) sample locations.
        prior: optional (K, H, W) learned per-camera-pair prior.
        q_chunk: queries per sequential chunk (bounds peak memory; the
            profile intermediates are (q_chunk, K, max(H, W)) f32).
    Returns:
        out: (H, W, Cv) fused features (dtype of other2).
        corr_pos: (H, W, 2) feature-pixel coords of the best sample.
        depth: (K, H, W) final attention weights (== oracle's 'depth').
    """
    assert supports_matmul_attention(params), params
    sample_locs = jax.lax.stop_gradient(sample_locs)
    H, W, _ = feat1.shape
    K = sample_locs.shape[0]
    HW = H * W
    fuse_bf16 = other2.dtype == jnp.bfloat16

    # per-axis bilinear data for every (query, sample): (HW, K) each.
    # align_corners=True unnormalize, identical to ops/grid_sample.py.
    locs = sample_locs.reshape(K, HW, 2).transpose(1, 0, 2).astype(jnp.float32)
    x = (locs[..., 0] + 1.0) / 2.0 * (W - 1)
    y = (locs[..., 1] + 1.0) / 2.0 * (H - 1)
    xb, wx0, wx1 = _axis_slot_weights(x, W)
    yb, wy0, wy1 = _axis_slot_weights(y, H)

    f1 = feat1.reshape(HW, -1)
    f2k = other1.reshape(HW, -1)
    f2v = other2.reshape(HW, -1)
    if fuse_bf16:
        f2v = f2v.astype(jnp.bfloat16)

    Q = _largest_divisor(HW, q_chunk)
    nc = HW // Q

    def as_chunks(a):
        return a.reshape((nc, Q) + a.shape[1:])

    xs = {
        "f1": as_chunks(f1),
        "xb": as_chunks(xb), "wx0": as_chunks(wx0), "wx1": as_chunks(wx1),
        "yb": as_chunks(yb), "wy0": as_chunks(wy0), "wy1": as_chunks(wy1),
    }
    if prior is not None:
        xs["prior"] = as_chunks(
            prior.reshape(K, HW).T.astype(jnp.float32)
        )

    def chunk(c):
        xprof = _profiles(c["xb"], c["wx0"], c["wx1"], W)  # (Q, K, W) f32
        yprof = _profiles(c["yb"], c["wy0"], c["wy1"], H)  # (Q, K, H) f32
        p = c.get("prior")

        if params.similarity == "prior":
            w = p
        else:
            G = jnp.einsum(
                "qc,pc->qp", c["f1"], f2k, preferred_element_type=jnp.float32
            ).reshape(Q, H, W)
            T = jnp.einsum(
                "qyx,qkx->qky", G, xprof, preferred_element_type=jnp.float32
            )
            sim = jnp.einsum("qky,qky->qk", T, yprof)
            # reference epipolar_similarity (epipolar.py:287-321)
            masked = jnp.where(sim == 0.0, NEG_INF, sim)
            if p is not None and not params.priormul:
                masked = masked + p
            if params.softmax_enabled:
                w = jax.nn.softmax(masked * jnp.float32(params.softmax_scale), axis=-1)
                if p is not None and params.priormul:
                    w = w * p
            else:
                w = masked / K

        n_mat = jnp.einsum(
            "qky,qkx->qyx", yprof * w[..., None], xprof,
            preferred_element_type=jnp.float32,
        ).reshape(Q, HW)
        if fuse_bf16:
            n_mat = n_mat.astype(jnp.bfloat16)
        out_c = jnp.einsum(
            "qp,pc->qc", n_mat, f2v, preferred_element_type=jnp.float32
        )
        best_c = jnp.argmax(w, axis=-1).astype(jnp.int32)
        return out_c, w, best_c

    out, depth, best = jax.lax.map(jax.checkpoint(chunk), xs)
    out = out.reshape(H, W, -1).astype(other2.dtype)
    depth = depth.reshape(HW, K).T.reshape(K, H, W)
    best = best.reshape(H, W)

    pos = jnp.take_along_axis(sample_locs, best[None, :, :, None], axis=0)[0]
    corr_pos = jax.lax.stop_gradient(
        denormalize_pixel(pos, H, W, correct=params.correct_normalize)
    )
    return out, corr_pos, depth


def epipolar_attention_matmul_batch(
    feat1, other1, other2, sample_locs, params: AttentionParams, prior=None,
    q_chunk: int = 512,
):
    """vmap over the batch: feats (N, H, W, C), sample_locs (N, K, H, W, 2)."""
    if prior is None:
        return jax.vmap(
            lambda f, o1, o2, s: epipolar_attention_matmul(
                f, o1, o2, s, params, q_chunk=q_chunk
            )
        )(feat1, other1, other2, sample_locs)
    return jax.vmap(
        lambda f, o1, o2, s, p: epipolar_attention_matmul(
            f, o1, o2, s, params, p, q_chunk=q_chunk
        )
    )(feat1, other1, other2, sample_locs, prior)
