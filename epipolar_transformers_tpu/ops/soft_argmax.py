"""Soft-argmax heatmap peak decoding (pure JAX, vmap-friendly).

Equivalent of the reference's `find_tensor_peak_batch`
(modeling/backbones/basic_batch.py:17-63): take the argmax pixel, bilinearly
sample a (2r+1)^2 window centered on it (zero padding outside the map),
threshold, and return the thresholded window's weighted centroid mapped to
image coordinates via `pix2coord`.  The reference's affine_grid+grid_sample
window extraction reduces analytically to sampling at (index + offset) for
offsets in linspace(-radius, radius, 2*Iradius+1) — we compute that directly.

Also provides `get_max_preds` (basic_batch.py:67-95) used by JDR.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.camera import pix2coord


def _bilinear_window(heatmap: jnp.ndarray, cx, cy, offsets: jnp.ndarray) -> jnp.ndarray:
    """Sample heatmap (H, W) at (cx+ox, cy+oy) for all offset pairs.

    Zero padding outside the map (torch grid_sample padding_mode='zeros',
    align_corners=True reduces to direct pixel-space bilinear sampling here).
    Returns (K, K) with K = len(offsets); rows index y, cols index x.
    """
    H, W = heatmap.shape
    x = cx + offsets[None, :]  # (1, K) broadcast over rows
    y = cy + offsets[:, None]  # (K, 1)
    x = jnp.broadcast_to(x, (offsets.shape[0], offsets.shape[0]))
    y = jnp.broadcast_to(y, (offsets.shape[0], offsets.shape[0]))

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    def gather(yc, xc):
        valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        return jnp.where(valid, heatmap[yi, xi], 0.0)

    return (
        gather(y0, x0) * (1 - wy1) * (1 - wx1)
        + gather(y0, x0 + 1) * (1 - wy1) * wx1
        + gather(y0 + 1, x0) * wy1 * (1 - wx1)
        + gather(y0 + 1, x0 + 1) * wy1 * wx1
    )


def find_peak(
    heatmap: jnp.ndarray,
    radius: float,
    downsample: int,
    threshold: float = 1e-6,
):
    """Decode one joint's heatmap (H, W) -> ((x, y) image coords, score).

    reference: modeling/backbones/basic_batch.py:17-63.
    """
    H, W = heatmap.shape
    flat = heatmap.reshape(-1)
    index = jnp.argmax(flat)
    score = flat[index]
    index_w = (index % W).astype(heatmap.dtype)
    index_h = (index // W).astype(heatmap.dtype)

    iradius = int(radius + 0.5)
    # torch.arange(-radius, radius + 1e-4, radius / Iradius): 2*Iradius+1 steps
    offsets = jnp.asarray(
        np.arange(-radius, radius + 1e-4, radius * 1.0 / iradius), dtype=heatmap.dtype
    )
    sub = _bilinear_window(heatmap, index_w, index_h, offsets)
    # F.threshold(x, thr, 0): keep x where x > thr else 0 (basic_batch.py:52)
    sub = jnp.where(sub > threshold, sub, 0.0)

    sum_region = jnp.sum(sub) + float(np.finfo(np.float64).eps)
    x = jnp.sum(sub * offsets[None, :]) / sum_region + index_w
    y = jnp.sum(sub * offsets[:, None]) / sum_region + index_h

    x = pix2coord(x, downsample)
    y = pix2coord(y, downsample)
    return jnp.stack([x, y]), score


def find_tensor_peak_batch(
    heatmaps: jnp.ndarray,
    radius: float,
    downsample: int,
    threshold: float = 1e-6,
):
    """Decode (J, H, W) heatmaps -> ((J, 2) xy image coords, (J,) scores)."""
    return jax.vmap(lambda h: find_peak(h, radius, downsample, threshold))(heatmaps)


def get_max_preds(batch_heatmaps: np.ndarray):
    """Hard argmax decode for (N, J, H, W) numpy heatmaps.

    reference: modeling/backbones/basic_batch.py:67-95.
    Returns preds (N, J, 2) xy and maxvals (N, J, 1).
    """
    assert batch_heatmaps.ndim == 4
    N, J, _, W = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(N, J, -1)
    idx = np.argmax(flat, axis=2)
    maxvals = np.amax(flat, axis=2).reshape(N, J, 1)
    preds = np.tile(idx.reshape(N, J, 1), (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % W
    preds[:, :, 1] = np.floor(preds[:, :, 1] / W)
    pred_mask = np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    preds *= pred_mask
    return preds, maxvals
