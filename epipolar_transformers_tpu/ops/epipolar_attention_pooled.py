"""Materialized epipolar attention for sample-POOLING configs.

POOLING (reference modeling/layers/epipolar.py:200-213 +
configs/epipolar/keypoint_h36m_param.yaml:30) max-reduces the sampled
*features* over (k, k + K/2) pairs before the similarity:

    pooled[k] = max(bilinear(f2, loc_k), bilinear(f2, loc_{k+K/2}))   (k < K/2)

The elementwise feature max is genuinely non-linear in the source features,
so the gather-free Gram/profile formulation
(ops/epipolar_attention_matmul.py) cannot apply — pooled configs need the
sampled vectors.  The streaming path handles them but scans K/2 sequential
steps, each issuing small row-gathers; XLA's TPU gather is issue-rate-bound
(ops/quad_gather.py), so the scan serializes exactly what one big gather
amortizes.

This path instead materializes ALL K sample vectors in one shot — four
narrow corner-table takes of (K*H*W) rows each (the empirically fastest
gather granularity, PERF.md) — pools the pairs, and runs the whole
similarity/softmax/fusion as dense einsums.  Semantics are byte-identical
to the oracle (ops/epipolar_attention.py, parity-tested in
tests/test_epipolar_pooled.py); only the schedule changes.  Peak memory is
the (K, H, W, C) sample stack (134 MB f32 at the param-config shape
64x64x64x128), bounded under autodiff by jax.checkpoint at the call site
(models/epipolar.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.camera import denormalize_pixel
from .epipolar_attention import (
    COS_EPS,
    AttentionParams,
    epipolar_similarity_weights,
)
from .quad_gather import build_corner_tables, corner_data_normalized, corner_sample


def supports_pooled_attention(params: AttentionParams) -> bool:
    """The materialized path implements the pooled configs the reference can
    express: POOLING with avg/max attention and dot/cos similarity.  (A
    'prior' similarity never samples keys, so pooling would be meaningless;
    the reference has no such config.)"""
    return (
        params.pooling
        and params.attention in ("avg", "max")
        and params.similarity in ("dot", "cos")
    )


def _pooled_stack(image, q, w, half):
    """Materialize + pool: (H, W, C) image, (K, H, W) flat base indices,
    (K, H, W, 4) slot weights -> (K/2, H, W, C) f32 pooled samples."""
    tables = build_corner_tables(image)
    samples = corner_sample(tables, q, w)  # (K, H, W, C) f32
    return jnp.maximum(samples[:half], samples[half:])


def epipolar_attention_pooled(
    feat1: jnp.ndarray,
    other1: jnp.ndarray,
    other2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    prior: jnp.ndarray | None = None,
    shared_kv: bool = False,
):
    """Single-item pooled epipolar attention (drop-in for the oracle's
    epipolar_attention on supported configs).

    Args:
        feat1: (H, W, C) reference-view queries.
        other1: (H, W, Ck) source-view key features.
        other2: (H, W, Cv) source-view value features.
        sample_locs: (K, H, W, 2) normalized (-1, 1) sample locations.
        prior: optional (K/2, H, W) additive/multiplicative prior.
    Returns:
        out: (H, W, Cv) fused features (dtype of other2).
        corr_pos: (H, W, 2) feature-pixel coords of the best pooled sample
            (position of the pair's FIRST member, matching the oracle /
            reference, epipolar.py:228-242 under pooling).
        depth: (K/2, H, W) weights (avg) or cosine sims (max).
    """
    assert supports_pooled_attention(params), params
    sample_locs = jax.lax.stop_gradient(sample_locs)
    H, W = feat1.shape[:2]
    K = sample_locs.shape[0]
    half = K // 2

    q, w = corner_data_normalized(sample_locs, H, W)
    key_samples = _pooled_stack(other1, q, w, half)  # (K/2, H, W, Ck) f32

    f1 = feat1.astype(jnp.float32)
    if params.attention == "max":
        # max attention always uses cosine (reference epipolar.py:282-286)
        n1 = jnp.maximum(jnp.linalg.norm(f1, axis=-1), COS_EPS)
        n2 = jnp.maximum(jnp.linalg.norm(key_samples, axis=-1), COS_EPS)
        sim = jnp.einsum(
            "hwc,khwc->khw", f1, key_samples,
            preferred_element_type=jnp.float32,
        ) / (n1[None] * n2)
        idx = jnp.argmax(sim, axis=0)
        weights = jax.nn.one_hot(idx, half, axis=0, dtype=jnp.float32)
        depth = sim
    else:
        sim = jnp.einsum(
            "hwc,khwc->khw", f1, key_samples,
            preferred_element_type=jnp.float32,
        )
        if params.similarity == "cos":
            n1 = jnp.maximum(jnp.linalg.norm(f1, axis=-1), COS_EPS)
            n2 = jnp.maximum(jnp.linalg.norm(key_samples, axis=-1), COS_EPS)
            sim = sim / (n1[None] * n2)
        weights = epipolar_similarity_weights(sim, params, prior)
        idx = jnp.argmax(weights, axis=0)
        depth = weights

    # best-match position: the pair's first member's loc (oracle takes
    # sample_locs[:K'] — the first half under pooling)
    pos = jnp.take_along_axis(
        sample_locs[:half], idx[None, :, :, None], axis=0
    )[0]
    corr_pos = jax.lax.stop_gradient(
        denormalize_pixel(pos, H, W, correct=params.correct_normalize)
    )

    # identity can't be seen through vmap tracers; the caller passes the
    # config-level fact (models/epipolar.py _shared_kv)
    if shared_kv or other2 is other1:
        value_samples = key_samples
    else:
        value_samples = _pooled_stack(other2, q, w, half)
    out = jnp.einsum(
        "khw,khwc->hwc", weights.astype(jnp.float32), value_samples,
        preferred_element_type=jnp.float32,
    ).astype(other2.dtype)
    return out, corr_pos, depth
