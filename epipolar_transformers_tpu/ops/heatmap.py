"""Gaussian target heatmap rendering (pure JAX / numpy).

Equivalent of the reference's `Heatmapcreator` + `create_multiple_gaussian_map`
(data/transforms/keypoints2d.py:3-80).  Semantics preserved exactly:
  * effective sigma is `sigma * sqrt(2)` (keypoints2d.py:10);
  * the heatmap grid lives in full-resolution image coordinates,
    grid = idx*downsample + downsample/2 - 0.5 (== pix2coord);
  * the squared distance term is clipped to 4.60517019 BEFORE exp, so far-away
    pixels get exp(-4.60517) ~= 0.01, not 0 (keypoints2d.py:30-31);
  * invisible joints are zeroed.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_CLIP = 4.60517019  # -ln(0.01) (reference keypoints2d.py:30)


def make_heatmap_grid(heatmap_size: tuple[int, int], downsample: int, sigma: float) -> np.ndarray:
    """Precompute the (2, H, W) grid of (y, x) image coords / sigma'."""
    H, W = heatmap_size
    sig = sigma * 2 ** 0.5
    grid = np.mgrid[0:H, 0:W].astype(np.float32)  # grid[0]=y rows, grid[1]=x cols
    offset = downsample / 2.0 - 0.5
    return (grid * downsample + offset) / sig


def render_gaussian_heatmaps(
    coords_xy: jnp.ndarray,
    heatmap_size: tuple[int, int],
    sigma: float,
    downsample: int,
    visibility: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render (J, H, W) Gaussian heatmaps from full-res image coords.

    Args:
        coords_xy: (J, 2) (x, y) keypoint coordinates in image space.
        visibility: optional (J,) bool/float mask; invisible joints -> 0 map.
    """
    H, W = heatmap_size
    sig = sigma * 2 ** 0.5
    grid = jnp.asarray(make_heatmap_grid(heatmap_size, downsample, sigma))  # (2,H,W)
    # reference indexes coords as (y, x) against grid rows (keypoints2d.py:28)
    yx = coords_xy[:, 1::-1] / sig  # (J, 2)
    d = yx[:, :, None, None] - grid[None]  # (J, 2, H, W)
    dist = jnp.sum(d * d, axis=1)  # (J, H, W)
    scoremap = jnp.exp(-jnp.clip(dist, 0.0, _CLIP))
    if visibility is not None:
        vis = jnp.asarray(visibility).astype(bool)
        scoremap = jnp.where(vis[:, None, None], scoremap, 0.0)
    return scoremap
