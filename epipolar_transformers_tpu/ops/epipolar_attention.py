"""Epipolar attention core (pure JAX, memory-bounded, vmap/jit-safe).

Functional equivalent of the similarity/softmax/fusion math in the reference
`Epipolar.forward` + `epipolar_similarity` (modeling/layers/epipolar.py:
188-247, 272-321).  The reference loops over the batch in Python because
materializing the (K, N, C, H, W) sampled-feature tensor is too large; here we
`lax.scan` over the K sample positions instead, so peak memory is O(NHWC)
while everything stays inside one XLA program:

  pass 1: scan K -> bilinear-sample `other1`, reduce to similarity (K, H, W)
  weights: mask zeros to -1e10, softmax(·/sqrt(K)) or 1/K, optional prior
  pass 2: scan K -> bilinear-sample `other2`, accumulate weight_k * sample_k

Max attention is expressed as one-hot weights over K (identical result to the
reference's argmax-gather, epipolar.py:225-235).

This implementation is the correctness oracle and the CPU fallback; the
production TPU path is the gather-free matmul formulation in
ops/epipolar_attention_matmul.py (exact-parity tested against this oracle in
tests/test_epipolar_matmul.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import denormalize_pixel
from .grid_sample import grid_sample_2d

NEG_INF = -1e10  # reference epipolar.py:298
COS_EPS = 1e-8  # torch F.cosine_similarity default eps


class AttentionParams(NamedTuple):
    """Static attention configuration (subset of EPIPOLAR.*)."""

    attention: str = "avg"  # 'avg' | 'max'
    similarity: str = "dot"  # 'dot' | 'cos' | 'prior'
    softmax_enabled: bool = True
    softmax_scale: float = 0.125  # 1/sqrt(K)
    pooling: bool = False
    priormul: bool = False
    correct_normalize: bool = True


def _sample_stack(image: jnp.ndarray, sample_locs: jnp.ndarray, pooling: bool) -> jnp.ndarray:
    """Sample image (H, W, C) at (K, H, W, 2) locs -> (K', H, W, C).

    With pooling, pairs (k, k + K/2) are max-reduced (reference reshapes
    (stride, K//stride, ...) and maxes axis 0, epipolar.py:200-203)."""
    if pooling:
        K = sample_locs.shape[0]
        half = K // 2

        def body(carry, locs_pair):
            a = grid_sample_2d(image, locs_pair[0])
            b = grid_sample_2d(image, locs_pair[1])
            return carry, jnp.maximum(a, b)

        pairs = jnp.stack([sample_locs[:half], sample_locs[half:]], axis=1)
        _, out = jax.lax.scan(body, None, pairs)
        return out

    def body(carry, locs):
        return carry, grid_sample_2d(image, locs)

    _, out = jax.lax.scan(body, None, sample_locs)
    return out


def _similarity(feat1: jnp.ndarray, sampled: jnp.ndarray, similarity: str) -> jnp.ndarray:
    """feat1 (H, W, C) vs sampled (K, H, W, C) -> (K, H, W)."""
    if similarity == "dot":
        return jnp.einsum("hwc,khwc->khw", feat1, sampled)
    if similarity == "cos":
        n1 = jnp.maximum(jnp.linalg.norm(feat1, axis=-1), COS_EPS)
        n2 = jnp.maximum(jnp.linalg.norm(sampled, axis=-1), COS_EPS)
        return jnp.einsum("hwc,khwc->khw", feat1, sampled) / (n1[None] * n2)
    raise NotImplementedError(similarity)


def epipolar_similarity_weights(
    sim: jnp.ndarray,
    params: AttentionParams,
    prior: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Similarity (K, H, W) -> attention weights (K, H, W).

    reference epipolar_similarity, epipolar.py:287-321:
      * exact-zero similarities (out-of-image samples) are masked to -1e10;
      * additive prior before softmax unless PRIORMUL;
      * softmax(sim / sqrt(K)) or sim / K.

    The ADDITIVE-prior softmax is computed as an explicitly masked softmax
    over the valid (in-range) slots rather than literally softmaxing
    NEG_INF + prior: at |NEG_INF| = 1e10 the f32 resolution is ~1024, so the
    literal form both absorbs the prior (reference behavior: out-of-range
    slots get exp-underflow zero weight; all-out-of-range rows go uniform)
    AND is NaN-prone under XLA — fusion may compute the row max with
    different rounding than the exp input (max(x*s) vs x*s), making every
    exp underflow and 0/0 the normalizer (observed on degenerate rows with
    |prior| > 1024).  The masked form reproduces the reference's effective
    f32 semantics — in-range slots softmax((sim+p)*scale), out-of-range
    exactly 0, degenerate rows uniform 1/K — and is stable for any prior
    magnitude.
    """
    masked = jnp.where(sim == 0.0, NEG_INF, sim)
    if prior is not None and not params.priormul:
        if params.softmax_enabled:
            valid = sim != 0.0
            z = (sim + prior) * params.softmax_scale
            zmax = jnp.max(jnp.where(valid, z, -jnp.inf), axis=0, keepdims=True)
            # min(., 0): harmless for valid slots (z <= zmax) and keeps the
            # discarded invalid lanes finite (inf would trip jax_debug_infs)
            e = jnp.where(valid, jnp.exp(jnp.minimum(z - zmax, 0.0)), 0.0)
            s = jnp.sum(e, axis=0, keepdims=True)
            return jnp.where(s > 0, e / jnp.where(s > 0, s, 1.0),
                             1.0 / sim.shape[0])
        return (masked + prior) / sim.shape[0]
    if params.softmax_enabled:
        w = jax.nn.softmax(masked * params.softmax_scale, axis=0)
        if prior is not None and params.priormul:
            w = w * prior
    else:
        w = masked / sim.shape[0]
    return w


def epipolar_attention(
    feat1: jnp.ndarray,
    other1: jnp.ndarray,
    other2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    prior: jnp.ndarray | None = None,
):
    """Single-item epipolar attention.

    Args:
        feat1: (H, W, C) reference-view features (queries).
        other1: (H, W, Ck) source-view key features.
        other2: (H, W, C) source-view value features.
        sample_locs: (K, H, W, 2) normalized sample locations.
        prior: optional (K', H, W) learned per-camera-pair prior.
    Returns:
        out: (H, W, C) fused features.
        corr_pos: (H, W, 2) feature-pixel coords of the best-matching sample.
        sim_or_weights: (K', H, W) — the similarity used as 'depth' downstream
            (weights when attention='avg', cosine sim when 'max';
            matches what the reference appends to `depth`).
    """
    sample_locs = jax.lax.stop_gradient(sample_locs)
    H, W = feat1.shape[:2]

    key_samples = _sample_stack(other1, sample_locs, params.pooling)  # (K', H, W, Ck)

    if params.attention == "max":
        # reference epipolar.py:282-286: max attention always uses cosine
        sim = _similarity(feat1, key_samples, "cos")
        idx = jnp.argmax(sim, axis=0)  # (H, W)
        weights = jax.nn.one_hot(idx, sim.shape[0], axis=0, dtype=feat1.dtype)
        depth = sim
    elif params.attention == "avg":
        if params.similarity == "prior":
            assert prior is not None
            weights = prior
            sim = prior
        else:
            sim = _similarity(feat1, key_samples, params.similarity)
            weights = epipolar_similarity_weights(sim, params, prior)
        # reference takes argmax of what epipolar_similarity returned — the
        # final weights (epipolar.py:237-242)
        idx = jnp.argmax(weights, axis=0)
        depth = weights
    else:
        raise NotImplementedError(params.attention)

    # best-match position, de-normalized to feature pixels (epipolar.py:228-242)
    locs_for_corr = sample_locs[: weights.shape[0]]
    pos = jnp.take_along_axis(locs_for_corr, idx[None, :, :, None], axis=0)[0]  # (H,W,2)
    corr_pos = denormalize_pixel(pos, H, W, correct=params.correct_normalize)
    corr_pos = jax.lax.stop_gradient(corr_pos)

    if other2 is other1:
        value_samples = key_samples
    else:
        value_samples = _sample_stack(other2, sample_locs, params.pooling)
    out = jnp.einsum("khw,khwc->hwc", weights, value_samples)
    return out, corr_pos, depth


def epipolar_attention_batch(
    feat1, other1, other2, sample_locs, params: AttentionParams, prior=None
):
    """vmap over the batch: feats (N, H, W, C), sample_locs (N, K, H, W, 2)."""
    if prior is None:
        return jax.vmap(
            lambda f, o1, o2, s: epipolar_attention(f, o1, o2, s, params)
        )(feat1, other1, other2, sample_locs)
    return jax.vmap(
        lambda f, o1, o2, s, p: epipolar_attention(f, o1, o2, s, params, p)
    )(feat1, other1, other2, sample_locs, prior)
