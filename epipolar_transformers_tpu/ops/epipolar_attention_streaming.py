"""Streaming (online-softmax) epipolar attention — single gather pass.

The two-pass reference implementation (ops/epipolar_attention.py) bilinearly
gathers the source features twice per sample: once for similarities, once to
accumulate the weighted sum.  Gather traffic is the TPU bottleneck (the MXU
idles while the VPU chases irregular reads), so this path computes the
softmax *online* (flash-attention style) in ONE scan over the K samples:

    step k: gather v_k once -> sim_k -> z_k = scale * masked(sim_k)
            m' = max(m, z_k); c = exp(m - m')
            s' = s*c + exp(z_k - m'); o' = o*c + exp(z_k - m') * v_k
    out = o / s

Exactly softmax-weighted averaging (fp associativity aside).  Supports dot
and cos similarity, avg and max attention, additive/multiplicative priors
and sample pooling — the full reference feature set
(modeling/layers/epipolar.py:188-321) at half the memory traffic.

The scan body is jax.checkpoint-ed so the backward re-gathers instead of
saving the (K, H, W, C) sampled tensor.  The full (K', H, W) weight stack
("depth" in the reference's return) is not materialized by the main pass;
`reconstruct_depth` rebuilds it from the saved softmax stats when a consumer
(eval outputs, reprojection loss, warped heatmaps) actually needs it.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.camera import denormalize_pixel
from .epipolar_attention import COS_EPS, NEG_INF, AttentionParams
from .quad_gather import build_quad, quad_sample_normalized


class SoftmaxStats(NamedTuple):
    m: jnp.ndarray  # (H, W) running max of scaled sims
    s: jnp.ndarray  # (H, W) softmax denominator
    best_rank: jnp.ndarray  # (H, W) ranking value of the best sample
    best_idx: jnp.ndarray  # (H, W) int32 index of the best sample


def _sim(feat1, v, similarity):
    s = jnp.einsum("hwc,hwc->hw", feat1.astype(jnp.float32), v.astype(jnp.float32))
    if similarity == "cos":
        n1 = jnp.maximum(jnp.linalg.norm(feat1.astype(jnp.float32), axis=-1), COS_EPS)
        n2 = jnp.maximum(jnp.linalg.norm(v.astype(jnp.float32), axis=-1), COS_EPS)
        s = s / (n1 * n2)
    return s


def _iter_locs(sample_locs, pooling):
    K = sample_locs.shape[0]
    if pooling:
        return jnp.stack([sample_locs[: K // 2], sample_locs[K // 2 :]], axis=1)
    return sample_locs[:, None]


def _pooled_sample(quad, locs_pair, pooling, H, W):
    # one row-gather per sample via the quad-corner layout (quad_gather.py).
    # NOTE: the two-x512B pair-gather variant benches faster in isolation but
    # SLOWER inside this fused scan (96ms vs 65ms, PERF.md) — XLA's gather
    # lowering is context-dependent; keep the quad here.
    v = quad_sample_normalized(quad, locs_pair[0], H, W)
    if pooling:
        v = jnp.maximum(v, quad_sample_normalized(quad, locs_pair[1], H, W))
    return v


def epipolar_attention_streaming(
    feat1: jnp.ndarray,
    other1: jnp.ndarray,
    other2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    prior: Optional[jnp.ndarray] = None,
    shared_kv: bool = False,
    remat: bool = True,
):
    """Single-item streaming attention.

    Args:
        feat1 (H, W, C) queries; other1 (H, W, Ck) keys; other2 (H, W, Cv)
        values; sample_locs (K, H, W, 2); prior optional (K', H, W);
        shared_kv: True when other1 and other2 are the same tensor (skips the
            second gather — the flagship SHARE path, epipolar.py:204-208).
        remat: jax.checkpoint the scan body so the backward re-gathers
            instead of saving the (K, H, W, C) sampled tensor; pass False
            at inference (a no-op on a pure forward jit, but an externally
            differentiated eval forward shouldn't re-gather in backward).
    Returns:
        (out (H, W, Cv), corr_pos (H, W, 2), stats: SoftmaxStats)
    """
    sample_locs = jax.lax.stop_gradient(sample_locs)
    H, W, _ = feat1.shape
    K = sample_locs.shape[0]
    pooling = params.pooling
    Keff = K // 2 if pooling else K
    similarity = "cos" if params.attention == "max" else params.similarity
    is_max = params.attention == "max"
    use_softmax = params.softmax_enabled and not is_max
    Cv = other2.shape[-1]

    quad1 = build_quad(other1)
    quad2 = None if shared_kv else build_quad(other2)
    locs_iter = _iter_locs(sample_locs, pooling)
    k_ids = jnp.arange(Keff, dtype=jnp.int32)
    xs = (locs_iter, k_ids)
    if prior is not None:
        xs = xs + (prior.astype(jnp.float32),)

    def step(carry, x):
        m, s, o, best_rank, best_v, best_idx = carry
        if prior is not None:
            locs_pair, k_idx, p_k = x
        else:
            locs_pair, k_idx = x
            p_k = None

        vk_key = _pooled_sample(quad1, locs_pair, pooling, H, W)
        vk_val = vk_key if shared_kv else _pooled_sample(quad2, locs_pair, pooling, H, W)
        vk_val32 = vk_val.astype(jnp.float32)
        simk = _sim(feat1, vk_key, similarity)

        if is_max:
            better = simk > best_rank
            best_v = jnp.where(better[..., None], vk_val32, best_v)
            best_rank = jnp.where(better, simk, best_rank)
            best_idx = jnp.where(better, k_idx, best_idx)
            return (m, s, o, best_rank, best_v, best_idx), None

        masked = jnp.where(simk == 0.0, NEG_INF, simk)
        if p_k is not None and not params.priormul:
            masked = masked + p_k

        if use_softmax:
            z = masked * jnp.float32(params.softmax_scale)
            # ranking matches argmax of the final weights, including the
            # multiplicative prior (epipolar.py:237-242,308-309)
            rank = z
            if p_k is not None and params.priormul:
                rank = z + jnp.log(jnp.maximum(p_k, 1e-30))
            m_new = jnp.maximum(m, z)
            c = jnp.exp(m - m_new)
            w = jnp.exp(z - m_new)
            w_val = w * p_k if (p_k is not None and params.priormul) else w
            s_new = s * c + w
            o_new = o * c[..., None] + w_val[..., None] * vk_val32
            better = rank > best_rank
            best_rank = jnp.where(better, rank, best_rank)
            best_idx = jnp.where(better, k_idx, best_idx)
            return (m_new, s_new, o_new, best_rank, best_v, best_idx), None

        w = masked / Keff
        o_new = o + w[..., None] * vk_val32
        better = w > best_rank
        best_rank = jnp.where(better, w, best_rank)
        best_idx = jnp.where(better, k_idx, best_idx)
        return (m, s, o_new, best_rank, best_v, best_idx), None

    init = (
        jnp.full((H, W), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((H, W), dtype=jnp.float32),
        jnp.zeros((H, W, Cv), dtype=jnp.float32),
        jnp.full((H, W), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((H, W, Cv), dtype=jnp.float32),
        jnp.zeros((H, W), dtype=jnp.int32),
    )
    (m, s, o, best_rank, best_v, best_idx), _ = jax.lax.scan(
        jax.checkpoint(step) if remat else step, init, xs
    )

    if is_max:
        out = best_v
    elif use_softmax:
        out = o / jnp.maximum(s, 1e-30)[..., None]
    else:
        out = o
    out = out.astype(other2.dtype)

    pos = jnp.take_along_axis(sample_locs[:Keff], best_idx[None, :, :, None], axis=0)[0]
    corr_pos = jax.lax.stop_gradient(
        denormalize_pixel(pos, H, W, correct=params.correct_normalize)
    )
    return out, corr_pos, SoftmaxStats(m, s, best_rank, best_idx)


def reconstruct_depth(
    feat1,
    other1,
    sample_locs,
    params: AttentionParams,
    stats: SoftmaxStats,
    prior=None,
):
    """Materialize the (K', H, W) weights/sims ('depth' in the reference's
    return) from the saved softmax stats — one key-gather pass, no value
    traffic."""
    sample_locs = jax.lax.stop_gradient(sample_locs)
    pooling = params.pooling
    K = sample_locs.shape[0]
    Keff = K // 2 if pooling else K
    similarity = "cos" if params.attention == "max" else params.similarity
    H, W = feat1.shape[:2]
    quad1 = build_quad(other1)
    locs_iter = _iter_locs(sample_locs, pooling)
    xs = (locs_iter,) if prior is None else (locs_iter, prior.astype(jnp.float32))

    def step(_, x):
        if prior is not None:
            locs_pair, p_k = x
        else:
            (locs_pair,) = x
            p_k = None
        v = _pooled_sample(quad1, locs_pair, pooling, H, W)
        simk = _sim(feat1, v, similarity)
        if params.attention == "max":
            return None, simk
        masked = jnp.where(simk == 0.0, NEG_INF, simk)
        if p_k is not None and not params.priormul:
            masked = masked + p_k
        if params.softmax_enabled:
            w = jnp.exp(masked * jnp.float32(params.softmax_scale) - stats.m) / jnp.maximum(
                stats.s, 1e-30
            )
            if p_k is not None and params.priormul:
                w = w * p_k
            return None, w
        return None, masked / Keff

    _, depth = jax.lax.scan(step, None, xs)
    return depth
