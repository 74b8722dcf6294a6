"""TPU-fast epipolar attention: Gram-matrix similarities + one value pass.

The naive attention bilinearly gathers C-channel vectors K times per pixel
(O(K·HW·C) irregular memory traffic — the bottleneck on TPU, where the MXU
is idle while the VPU chases gathers).  This path restructures the math:

  sim[k,p] = <feat1[p], bilerp(feat2)(s_kp)>
           = sum_corners alpha * <feat1[p], feat2[q_corner]>     (bilinearity)
           = bilerp over the GRAM MATRIX G[p,q] = feat1 · feat2^T

so one (HW x C) @ (C x HW) matmul on the MXU replaces the similarity gathers,
and the remaining gather moves SCALARS from G (256x less traffic).  This is
the "trick" the reference's own docstring suggests but never implements
(modeling/layers/epipolar.py:98).  The value pass stays a single scan over K
(one C-channel gather per sample — half the naive traffic since similarities
no longer re-gather).

Exact-math notes (parity with ops/epipolar_attention.py, hence the reference):
  * out-of-image corners contribute 0 => sim == 0 for fully-out samples,
    masked to -1e10 before softmax — identical to grid_sample-zeros + mask;
  * restricted to similarity='dot' (cos needs true sampled-vector norms);
    pooling is sample-max, which doesn't commute with the Gram trick — both
    fall back to the reference implementation in the Epipolar module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .epipolar_attention import NEG_INF, AttentionParams
from ..geometry.camera import denormalize_pixel


def _corner_data(sample_locs: jnp.ndarray, H: int, W: int):
    """sample_locs (K, P, 2) normalized -> corner indices/weights.

    Returns q (K, P, 4) flat int32 indices into HW, alpha (K, P, 4) weights
    with out-of-range corners zeroed (align_corners=True unnormalize).
    """
    x = (sample_locs[..., 0] + 1.0) / 2.0 * (W - 1)
    y = (sample_locs[..., 1] + 1.0) / 2.0 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    corners = []
    for dy, dx, wgt in (
        (0.0, 0.0, (1 - wy1) * (1 - wx1)),
        (0.0, 1.0, (1 - wy1) * wx1),
        (1.0, 0.0, wy1 * (1 - wx1)),
        (1.0, 1.0, wy1 * wx1),
    ):
        xc = x0 + dx
        yc = y0 + dy
        valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        corners.append((yi * W + xi, jnp.where(valid, wgt, 0.0)))
    q = jnp.stack([c[0] for c in corners], axis=-1)
    alpha = jnp.stack([c[1] for c in corners], axis=-1)
    return q, alpha


def epipolar_attention_fast(
    feat1: jnp.ndarray,
    other1: jnp.ndarray,
    other2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    prior: jnp.ndarray | None = None,
):
    """Single-item fast path. Same signature/returns as epipolar_attention.

    feat1 (H, W, C); other1/other2 (H, W, C*); sample_locs (K, H, W, 2).
    """
    assert params.similarity == "dot" and params.attention == "avg"
    assert not params.pooling
    sample_locs = jax.lax.stop_gradient(sample_locs)
    H, W, C = feat1.shape
    K = sample_locs.shape[0]
    P = H * W
    locs = sample_locs.reshape(K, P, 2)

    q, alpha = _corner_data(locs, H, W)  # (K, P, 4)

    # --- similarities via the Gram matrix (MXU) ---
    f1 = feat1.reshape(P, C)
    f2k = other1.reshape(P, -1)
    G = jax.lax.dot_general(
        f1, f2k.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (P, Pk)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (K, P, 4), dimension=1)
    g_vals = G[p_idx.reshape(-1), q.reshape(-1)].reshape(K, P, 4)
    sim = jnp.sum(g_vals * alpha.astype(g_vals.dtype), axis=-1)  # (K, P)

    weights_in = jnp.where(sim == 0.0, NEG_INF, sim)
    if prior is not None and not params.priormul:
        weights_in = weights_in + prior.reshape(K, P)
    if params.softmax_enabled:
        weights = jax.nn.softmax(weights_in * params.softmax_scale, axis=0)
        if prior is not None and params.priormul:
            weights = weights * prior.reshape(K, P)
    else:
        weights = weights_in / K

    idx = jnp.argmax(weights, axis=0)  # (P,)

    # --- value pass: one weighted gather scan over K ---
    v = other2.reshape(P, -1)
    Cv = v.shape[-1]

    def body(acc, kin):
        qk, ak, wk = kin  # (P,4), (P,4), (P,)
        vk = v[qk.reshape(-1)].reshape(P, 4, Cv)
        sampled = jnp.sum(vk * ak[..., None].astype(vk.dtype), axis=1)  # (P, Cv)
        # accumulate in f32 regardless of the (possibly bf16) value dtype
        return acc + wk[:, None].astype(jnp.float32) * sampled.astype(jnp.float32), None

    acc0 = jnp.zeros((P, Cv), dtype=jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (q, alpha, weights))
    out = out.astype(other2.dtype)

    pos = jnp.take_along_axis(locs, idx[None, :, None], axis=0)[0]  # (P, 2)
    corr_pos = denormalize_pixel(pos, H, W, correct=params.correct_normalize)
    corr_pos = jax.lax.stop_gradient(corr_pos).reshape(H, W, 2)

    return (
        out.reshape(H, W, Cv),
        corr_pos,
        weights.reshape(K, H, W),
    )
