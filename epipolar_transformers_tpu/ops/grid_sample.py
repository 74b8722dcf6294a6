"""Bilinear grid sampling with PyTorch-parity semantics (pure JAX).

The reference relies on `F.grid_sample` at a pre-1.4 torch version whose
default behavior is `align_corners=True` + zero padding (reference:
modeling/layers/epipolar.py:199-213, modeling/backbones/basic_batch.py:49-51).
Out-of-range samples contribute exact zeros — the epipolar layer depends on
this ("sim == 0 -> -1e10" masking, epipolar.py:298) — so border handling here
matches torch bit-for-bit: a sample is a weighted sum of up to 4 neighbors,
each neighbor's contribution masked to 0 when it falls outside the image.

Layout is channels-last (TPU-native NHWC); the channel axis rides along the
gather so XLA vectorizes over it.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """Sample a single image at normalized grid locations.

    Args:
        image: (H, W, C) source feature map.
        grid: (..., 2) normalized (x, y) in (-1, 1); x indexes W, y indexes H.
        align_corners: True matches the reference's torch (<1.4) default.
    Returns:
        (..., C) bilinear samples; zero where all 4 neighbors are out of range.
    """
    H, W, C = image.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yc, xc):
        """Gather image[yc, xc] with zeros outside the valid range."""
        valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        vals = image[yi, xi]  # (..., C)
        return jnp.where(valid[..., None], vals, 0.0)

    out = (
        gather(y0, x0) * (wy0 * wx0)[..., None]
        + gather(y0, x1) * (wy0 * wx1)[..., None]
        + gather(y1, x0) * (wy1 * wx0)[..., None]
        + gather(y1, x1) * (wy1 * wx1)[..., None]
    )
    return out


def grid_sample_nhwc(
    images: jnp.ndarray,
    grids: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """Batched version: images (N, H, W, C), grids (N, ..., 2) -> (N, ..., C)."""
    import jax

    return jax.vmap(lambda im, g: grid_sample_2d(im, g, align_corners))(images, grids)
