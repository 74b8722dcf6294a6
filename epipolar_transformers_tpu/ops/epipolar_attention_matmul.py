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

Supported: attention in ('avg', 'max'), similarity in ('dot', 'cos',
'prior'), softmax on/off, additive and multiplicative priors, shared or
separate key/value tensors.  Cosine norms are gather-free too:
||bilinear(f2)||^2 is a quadratic form in the corner weights whose corner
pairs live in a 3x3 neighborhood, so 5 shifted self-dot maps of f2 reduce it
to the same profile-contraction pattern (see _interp_norm2).  Max attention
is one-hot weights over the cosine stack — still a linear fusion.
Not supported (falls back to streaming in models/epipolar.py): sample
POOLING, which maxes the sampled *features* and is genuinely non-linear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..geometry.camera import denormalize_pixel
from .epipolar_attention import COS_EPS, NEG_INF, AttentionParams
from .quad_gather import _axis_slot_weights


def supports_matmul_attention(params: AttentionParams) -> bool:
    """True when the gather-free formulation computes the exact reference
    semantics for this configuration.

    Cosine similarity (and max attention, which always uses cosine —
    reference epipolar.py:282-286) is gather-free too: the norm of a
    bilinearly-interpolated feature is a quadratic form in the corner
    weights, ||sum_i w_i v_i||^2 = sum_ij w_i w_j <v_i, v_j>, and every
    corner pair lives in a 3x3 pixel neighborhood — so 5 shifted self-dot
    maps of the source features (+ their mirrored twins by symmetry) turn
    the norm into the same profile-contraction pattern as the similarity.
    Only sample POOLING (a max over sample pairs of the *features*, not the
    weights) is genuinely non-linear in the source features and falls back
    to the streaming path."""
    return (
        params.attention in ("avg", "max")
        and params.similarity in ("dot", "cos", "prior")
        and not params.pooling
    )


# samples-per-line count below which the K axis is padded with out-of-range
# sentinels: XLA lowers the (.., K)-minor chunk einsums onto degenerate
# layouts for K < 64 (measured 2x+ slower at K=32/16 than at K=64 on a v5e
# — scripts/bench_attn_sweep.py, whose K/2-nopad / K/4-nopad cases set this
# to 0 to reproduce the unpadded regression)
_PAD_K = 64


def _largest_divisor(n: int, cap: int) -> int:
    d = min(cap, n)
    while n % d:
        d -= 1
    return d


def _shift_map(a, dy: int, dx: int):
    """b[y, x] = a[y+dy, x+dx], zero outside the image. a: (H, W, C)."""
    H, W = a.shape[:2]
    pad = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)), (0, 0))
    ap = jnp.pad(a, pad)
    y0, x0 = max(dy, 0), max(dx, 0)
    return ap[y0 : y0 + H, x0 : x0 + W]


# one of each +/- offset pair; the mirrored twin contributes symmetrically
_NORM_OFFSETS = ((0, 0), (0, 1), (1, 0), (1, 1), (1, -1))


def _self_dot_maps(f2):
    """(H, W, C) -> tuple of (H, W) maps <f2[y,x], f2[y+dy,x+dx]> for the
    canonical 3x3-neighborhood offsets (zero where the twin is outside)."""
    f2 = f2.astype(jnp.float32)
    return tuple(
        jnp.einsum("yxc,yxc->yx", f2, _shift_map(f2, dy, dx))
        for dy, dx in _NORM_OFFSETS
    )


def _prof_shift(prof, d: int):
    """p[..., s] = prof[..., s+d], zero outside [0, S)."""
    if d == 0:
        return prof
    zeros = jnp.zeros(prof.shape[:-1] + (abs(d),), prof.dtype)
    if d > 0:
        return jnp.concatenate([prof[..., d:], zeros], axis=-1)
    return jnp.concatenate([zeros, prof[..., :d]], axis=-1)


def _interp_norm2(yprof, xprof, dot_maps):
    """||bilinear(f2, loc)||^2 for every (query, sample), gather-free.

    norm^2 = sum_ij w_i w_j <v_i, v_j> over the 4 bilinear corners; grouped
    by corner-pair offset it becomes profile contractions against the
    shifted self-dot maps."""
    total = jnp.zeros(yprof.shape[:-1], jnp.float32)
    for (dy, dx), D in zip(_NORM_OFFSETS, dot_maps):
        Py = yprof * _prof_shift(yprof, dy)  # (Q, K, H)
        Px = xprof * _prof_shift(xprof, dx)  # (Q, K, W)
        t = jnp.einsum("qky,yx->qkx", Py, D, preferred_element_type=jnp.float32)
        c = jnp.einsum("qkx,qkx->qk", t, Px, preferred_element_type=jnp.float32)
        total = total + (c if (dy, dx) == (0, 0) else 2.0 * c)
    return total


def _profiles(base, w0, w1, size, dtype=jnp.float32):
    """(Q, K) per-axis bilinear data -> (Q, K, size) interpolation profile.

    Exactly two (or fewer, at image borders) nonzeros per row; validity
    masking already encoded in w0/w1 by _axis_slot_weights.  `dtype` is the
    storage dtype — the profiles are the largest intermediates, so bf16
    storage halves the dominant HBM traffic in bf16 compute mode (weights
    are in [0, 1]; bf16 keeps ~3 significant digits, and zero stays exact)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    b = base[..., None]
    zero = jnp.zeros((), jnp.float32)
    prof = jnp.where(i == b, w0[..., None], zero) + jnp.where(
        i == b + 1, w1[..., None], zero
    )
    return prof.astype(dtype)


def epipolar_attention_matmul(
    feat1: jnp.ndarray,
    other1: jnp.ndarray,
    other2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    prior: jnp.ndarray | None = None,
    q_chunk: int = 64,
    profile_dtype=None,
    remat: bool = True,
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
            profile intermediates are (q_chunk, K, max(H, W))).  Swept on
            a v5e chip at the flagship shape (H=W=K=64, C=256, batch 8),
            round 4 (scripts/bench_attn_sweep.py / bench_attn_grad.py):
            forward 64 -> 5.9 ms/iter, 32 -> 6.7, 16 -> 8.1, 8 -> 11.4,
            4096 -> 15.8; value+grad with remat 64 -> 17.9, 32 -> 21.8,
            128 -> 32.7.  64 wins both paths — big enough to amortize the
            lax.map step, small enough that intermediates stay VMEM-resident.
        remat: jax.checkpoint the per-chunk body so autodiff re-computes
            the (Q, K, H/W) profile intermediates instead of saving them
            (needed for training memory at real shapes).  Pass False at
            inference: on a pure forward jit checkpoint is a no-op
            (measured neutral on the flagship bench), but an eval forward
            differentiated from outside shouldn't pay chunk-recompute.
    Returns:
        out: (H, W, Cv) fused features (dtype of other2).
        corr_pos: (H, W, 2) feature-pixel coords of the best sample.
        depth: (K, H, W) final attention weights (== oracle's 'depth').
    """
    assert supports_matmul_attention(params), params
    sample_locs = jax.lax.stop_gradient(sample_locs)
    H, W, _ = feat1.shape
    K_real = sample_locs.shape[0]
    # Pad small sample counts up to _PAD_K with out-of-range sentinel
    # locations.  XLA's lowering of the chunk einsums is pathologically
    # SLOWER for K < 64 (flagship-shape sweep on a v5e: K=32 -> 14.5
    # ms/iter, K=16 -> 9.6, vs K=64 -> 6.7 — scripts/bench_attn_sweep.py;
    # (.., K)-minor tensors land on degenerate layouts).  Out-of-range
    # samples get profile weight exactly 0, so every padded slot reproduces
    # the zero-sentinel semantics of a clipped sample; the per-branch
    # corrections below (true-K softmax-off divisor, real-slice argmax,
    # degenerate-row rescale) make the padded computation EXACT, and the
    # returned depth is sliced back to K_real rows.
    # (min-size guard: -2.0 normalized unnormalizes to -(S-1)/2, which is
    # only fully out of range for S >= 3 — for degenerate 1/2-px test
    # images the sentinel would land IN range and corrupt the result)
    pad_k = _PAD_K - K_real if (K_real < _PAD_K and min(H, W) >= 3) else 0
    if pad_k:
        sample_locs = jnp.concatenate(
            [sample_locs,
             jnp.full((pad_k, H, W, 2), -2.0, sample_locs.dtype)], axis=0)
        if prior is not None:
            # zero pad is neutral on every path: the additive softmax below
            # keys validity off sim == 0 (true for all padded slots), and
            # the priormul / similarity='prior' paths multiply weights that
            # are already zero on pads
            prior = jnp.concatenate(
                [prior, jnp.zeros((pad_k, H, W), prior.dtype)], axis=0)
    K = K_real + pad_k
    HW = H * W
    fuse_bf16 = other2.dtype == jnp.bfloat16
    # bf16 compute mode (cfg.DTYPE=bfloat16): the backbone emits bf16
    # features, so run ALL the big einsums with bf16 inputs + f32
    # accumulation (full MXU rate).  Profiles are exact bilinear weights in
    # [0, 1]; bf16's 8-bit mantissa costs < 0.4% relative weight error —
    # the attention output is a convex combination, so the error does not
    # amplify.  f32 inputs keep the bit-exact f32 path (oracle parity).
    fast_bf16 = feat1.dtype == jnp.bfloat16 or other1.dtype == jnp.bfloat16
    prof_dtype = (jnp.dtype(profile_dtype) if profile_dtype is not None
                  else (jnp.bfloat16 if fast_bf16 else jnp.float32))

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
    if fuse_bf16 or fast_bf16:
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

    need_cos = params.attention == "max" or params.similarity == "cos"
    dot_maps = _self_dot_maps(other1) if need_cos else None

    # 'dots_bf16': like 'dots' (save the einsum outputs, recompute the
    # elementwise middle) but the saved residuals are bf16-rounded — the
    # three (Q,H,W)/(Q,K,H)/(Q,HW) f32 stacks are ~3 GB at the flagship
    # shape, all pure HBM traffic, and the forward proceeds from the
    # rounded values so fwd and recomputed-bwd see identical numerics.
    # Opt-in (EPIPOLAR.ATTENTION_REMAT) because it perturbs training
    # activations by bf16 rounding (~0.4% relative).
    if remat == "dots_bf16":
        def _save(v):
            return checkpoint_name(
                v.astype(jnp.bfloat16), "attn_dot").astype(v.dtype)

        def _name(v):
            return checkpoint_name(v, "attn_dot")
    else:
        _save = _name = lambda v: v

    def chunk(c):
        xprof = _profiles(c["xb"], c["wx0"], c["wx1"], W, prof_dtype)  # (Q, K, W)
        yprof = _profiles(c["yb"], c["wy0"], c["wy1"], H, prof_dtype)  # (Q, K, H)
        p = c.get("prior")

        def dot_sim():
            G = _save(jnp.einsum(
                "qc,pc->qp", c["f1"], f2k, preferred_element_type=jnp.float32
            ).reshape(Q, H, W))
            T = _save(jnp.einsum(
                "qyx,qkx->qky", G.astype(prof_dtype), xprof,
                preferred_element_type=jnp.float32,
            ))
            # sim stays exact f32: the out-of-range sentinel is `sim == 0.0`
            # (zero profiles x anything = 0 survives rounding of G/T, but
            # rounding sim itself is pointless — it's (Q, K), tiny)
            sim = _name(jnp.einsum(
                "qky,qky->qk", T.astype(prof_dtype), yprof,
                preferred_element_type=jnp.float32,
            ))
            if need_cos:
                # cosine = dot / (||f1|| * ||bilinear(f2)||), both norms
                # clamped like torch F.cosine_similarity (oracle COS_EPS);
                # a fully out-of-range sample keeps sim == 0.0 exactly
                # floor far below COS_EPS^2: forward unchanged (the max
                # with COS_EPS clamps anyway), but sqrt'(0) = inf would
                # otherwise NaN the backward for exactly-zero norms —
                # guaranteed on padded sample slots, possible on fully
                # clipped lines
                n2 = jnp.sqrt(jnp.maximum(
                    _interp_norm2(yprof, xprof, dot_maps), 1e-24))
                n1 = jnp.linalg.norm(c["f1"].astype(jnp.float32), axis=-1)
                sim = sim / (jnp.maximum(n1, COS_EPS)[:, None]
                             * jnp.maximum(n2, COS_EPS))
            return sim

        if params.attention == "max":
            # reference epipolar.py:225-235,282-286: hard argmax over COSINE
            # similarity; no softmax, no zero-masking, prior unused; 'depth'
            # downstream is the raw cosine stack.  argmax over the REAL
            # slots only: a padded slot's cosine is exactly 0, which would
            # win over all-negative real similarities.
            sim = dot_sim()
            w = jax.nn.one_hot(
                jnp.argmax(sim[:, :K_real], axis=-1), K, dtype=jnp.float32)
            depth_c = sim
        elif params.similarity == "prior":
            w = p
            depth_c = w
        else:
            sim = dot_sim()
            # reference epipolar_similarity (epipolar.py:287-321)
            masked = jnp.where(sim == 0.0, NEG_INF, sim)
            if p is not None and not params.priormul and params.softmax_enabled:
                # ADDITIVE prior: explicitly masked softmax over the valid
                # (in-range, real) slots — softmaxing NEG_INF + p literally
                # is NaN-prone under XLA fusion and absorbs the prior in
                # f32 anyway; see epipolar_attention.py
                # epipolar_similarity_weights for the full derivation.
                # Padded slots have sim == 0, so `valid` excludes them and
                # the degenerate-row uniform goes over the REAL slots only.
                valid = sim != 0.0
                z = (sim + p) * jnp.float32(params.softmax_scale)
                zmax = jnp.max(jnp.where(valid, z, -jnp.inf), axis=-1,
                               keepdims=True)
                e = jnp.where(valid, jnp.exp(jnp.minimum(z - zmax, 0.0)), 0.0)
                s = jnp.sum(e, axis=-1, keepdims=True)
                uniform = jnp.where(jnp.arange(K) < K_real,
                                    1.0 / K_real, 0.0)
                w = jnp.where(s > 0, e / jnp.where(s > 0, s, 1.0), uniform)
            elif params.softmax_enabled:
                w = jax.nn.softmax(masked * jnp.float32(params.softmax_scale), axis=-1)
                if pad_k:
                    # all-out-of-range queries: the unpadded softmax over K
                    # NEG_INFs is uniform 1/K_real; over K padded slots it
                    # is 1/K — rescale those rows so the returned weights
                    # (and nothing else: the fused output is 0 either way)
                    # stay exact
                    degen = jnp.all(sim == 0.0, axis=-1, keepdims=True)
                    w = jnp.where(degen, w * (K / K_real), w)
                if p is not None and params.priormul:
                    w = w * p
            else:
                if p is not None and not params.priormul:
                    masked = masked + p
                # divide by the TRUE sample count (reference /K semantics)
                w = masked / K_real
            depth_c = w

        n_mat = jnp.einsum(
            "qky,qkx->qyx",
            (yprof * w[..., None]).astype(prof_dtype), xprof,
            preferred_element_type=jnp.float32,
        ).reshape(Q, HW)
        if fuse_bf16 or fast_bf16:
            n_mat = _name(n_mat.astype(jnp.bfloat16))
        else:
            n_mat = _save(n_mat)
        out_c = _name(jnp.einsum(
            "qp,pc->qc", n_mat, f2v, preferred_element_type=jnp.float32
        ))
        # oracle: best = argmax of the final weights (avg) / cosine sim (max);
        # for max the one-hot w shares its argmax with sim.  Real slots
        # only: a padded slot's weight (0, or the raw prior 0) could
        # otherwise win over all-negative real weights.
        best_c = jnp.argmax(w[:, :K_real], axis=-1).astype(jnp.int32)
        return out_c, depth_c, best_c

    # remat: False -> save everything; True/'full' -> recompute the whole
    # chunk in the backward; 'dots' -> save the matmul (einsum) outputs and
    # recompute only the cheap elementwise middle (jax dots_saveable policy)
    # — trades HBM for skipping the Gram/profile recompute in the VJP.
    if remat == "dots":
        body = jax.checkpoint(
            chunk, policy=jax.checkpoint_policies.dots_saveable)
    elif remat == "dots_bf16":
        body = jax.checkpoint(
            chunk,
            policy=jax.checkpoint_policies.save_only_these_names("attn_dot"))
    elif remat:
        body = jax.checkpoint(chunk)
    else:
        body = chunk
    out, depth, best = jax.lax.map(body, xs)
    out = out.reshape(H, W, -1).astype(other2.dtype)
    depth = depth.reshape(HW, K).T[:K_real].reshape(K_real, H, W)
    best = best.reshape(H, W)

    pos = jnp.take_along_axis(sample_locs, best[None, :, :, None], axis=0)[0]
    corr_pos = jax.lax.stop_gradient(
        denormalize_pixel(pos, H, W, correct=params.correct_normalize)
    )
    return out, corr_pos, depth


def epipolar_attention_matmul_batch(
    feat1, other1, other2, sample_locs, params: AttentionParams, prior=None,
    q_chunk: int = 64, remat: bool = True,
):
    """vmap over the batch: feats (N, H, W, C), sample_locs (N, K, H, W, 2)."""
    if prior is None:
        return jax.vmap(
            lambda f, o1, o2, s: epipolar_attention_matmul(
                f, o1, o2, s, params, q_chunk=q_chunk, remat=remat
            )
        )(feat1, other1, other2, sample_locs)
    return jax.vmap(
        lambda f, o1, o2, s, p: epipolar_attention_matmul(
            f, o1, o2, s, params, p, q_chunk=q_chunk, remat=remat
        )
    )(feat1, other1, other2, sample_locs, prior)
