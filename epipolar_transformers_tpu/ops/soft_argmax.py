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
from .quad_gather import _axis_slot_weights


def _axis_profile(center, offsets: jnp.ndarray, size: int) -> jnp.ndarray:
    """(K,) sample positions center+offsets -> (K, size) bilinear profile.

    Row k holds the interpolation weights of position center+offsets[k]
    over the axis — at most two adjacent nonzeros, with out-of-range
    corners exactly zero (torch grid_sample padding_mode='zeros').  Same
    validity semantics as quad_gather._axis_slot_weights."""
    pos = center + offsets
    base, w0, w1 = _axis_slot_weights(pos, size)
    i = jax.lax.broadcasted_iota(jnp.int32, (offsets.shape[0], size), 1)
    b = base[:, None]
    return jnp.where(i == b, w0[:, None], 0.0) + jnp.where(
        i == b + 1, w1[:, None], 0.0
    )


def _bilinear_window(heatmap: jnp.ndarray, cx, cy, offsets: jnp.ndarray) -> jnp.ndarray:
    """Sample heatmap (H, W) at (cx+ox, cy+oy) for all offset pairs.

    Gather-free: the window is a separable bilinear crop, so it is two
    profile matmuls sub = Py @ H @ Px^T (TPU MXU) instead of 4*(K, K)
    scalar gathers — the XLA TPU gather lowering made the old formulation
    ~2 ms of the flagship inference iteration; this is ~0.1 ms.
    Returns (K, K) with K = len(offsets); rows index y, cols index x.
    """
    H, W = heatmap.shape
    py = _axis_profile(cy, offsets, H)  # (K, H)
    px = _axis_profile(cx, offsets, W)  # (K, W)
    rows = jnp.einsum("ah,hw->aw", py, heatmap,
                      preferred_element_type=jnp.float32)
    return jnp.einsum("aw,bw->ab", rows, px,
                      preferred_element_type=jnp.float32).astype(heatmap.dtype)


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
