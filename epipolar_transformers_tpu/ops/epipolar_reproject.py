"""Reprojection-consistency branch of the epipolar transformer.

Equivalent of reference `Epipolar.reproject` (modeling/layers/epipolar.py:
420-464): take the attention's expected match position in the other view,
shoot the epipolar line BACK into the reference view, run the same soft
attention along it, and penalize the expected back-projected position's
deviation from the original pixel grid.

Note: in the reference this branch is bit-rotted — when
REPROJECT_LOSS_WEIGHT != 0 Epipolar.forward returns a 5-tuple that the
backbones unpack as 4 (resnet.py:385-388), so it can only run standalone.
Here it is a separate op + loss wired cleanly through the Epipolar module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import denormalize_pixel, pix2coord
from .epipolar_attention import AttentionParams, epipolar_attention
from .epipolar_sampling import EpipolarGeometry, epipolar_sample_locs
from .grid_sample import grid_sample_2d


def expected_match_locs(sample_locs: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Attention-weighted expected sample position (epipolar.py:433-434).

    sample_locs (K, H, W, 2) normalized; depth (K, H, W) weights ->
    (H, W, 2) normalized."""
    return jnp.einsum("khwc,khw->hwc", sample_locs, depth)


def reproject_consistency(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    sample_locs: jnp.ndarray,
    depth: jnp.ndarray,
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    geom: EpipolarGeometry,
    params: AttentionParams,
):
    """Single-item reprojection (epipolar.py:420-464).

    Returns (reprojected_locs (H, W, 2) normalized, mask (H, W, 1)).
    """
    H, W = feat1.shape[:2]
    expected = expected_match_locs(sample_locs, depth)  # (H, W, 2) normalized
    matched_feat2 = grid_sample_2d(feat2, expected)  # (H, W, C)

    # normalized -> full-res image coords (epipolar.py:438-440)
    pix = denormalize_pixel(expected, H, W, correct=geom.correct_normalize)
    coords = pix2coord(pix, geom.downsample) * geom.resize
    grid = jnp.concatenate(
        [coords.reshape(-1, 2), jnp.ones((H * W, 1), coords.dtype)], axis=1
    ).T  # (3, HW)

    # epipolar lines of the matched points back in view 1 (P order swapped)
    back_locs = epipolar_sample_locs(P2, P1, geom, grid)  # (K, H, W, 2)

    # soft attention of matched features against view-1 features sampled
    # along the back lines; expected position = weight-averaged location
    _, _, weights = epipolar_attention(
        matched_feat2, feat1, feat1, back_locs, params
    )
    reproj = jnp.einsum("khwc,khw->hwc", back_locs[: weights.shape[0]], weights)
    mask = ((jnp.min(reproj, axis=-1) > -1) & (jnp.max(reproj, axis=-1) < 1))[..., None]
    return reproj, mask


def gt_grid(geom: EpipolarGeometry) -> np.ndarray:
    """The normalized identity pixel grid the reprojection should match
    (epipolar.py:26-28)."""
    H, W = geom.feat_h, geom.feat_w
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    # pure numpy (jit-safe as a trace-time constant)
    if geom.correct_normalize:
        gx = -1.0 + 2.0 * xs / (W - 1)
        gy = -1.0 + 2.0 * ys / (H - 1)
    else:
        gx = -1.0 + 2.0 * (xs + 0.5) / W
        gy = -1.0 + 2.0 * (ys + 0.5) / H
    return np.stack([gx, gy], axis=-1).astype(np.float32)


def reprojection_loss(reproj, grid, mask) -> jnp.ndarray:
    """Masked MSE between reprojected and identity grids."""
    se = (reproj - grid) ** 2 * mask
    return jnp.sum(se) / jnp.maximum(jnp.sum(mask) * 2, 1)
