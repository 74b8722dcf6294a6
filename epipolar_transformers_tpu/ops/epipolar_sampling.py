"""Epipolar-line sample-location generation (pure JAX, fully vectorized).

TPU-native equivalent of `Epipolar.grid2sample_locs` (reference
modeling/layers/epipolar.py:323-418): for every reference-view feature pixel,
compute its epipolar line in the source view (pseudo-inverse reprojection +
epipole cross product), clip the line to the image rectangle with the
reference's numerical-stability rules, and emit `sample_size` uniformly spaced
sample locations between the two intersections, normalized to (-1, 1) for
grid sampling.  Lines that miss the rectangle get far-out-of-range locations
(reference sends them to xmin-10000), which sample to exact zeros and are then
masked by the attention ("sim == 0 -> -1e10").

No Python loops, no data-dependent shapes: the boolean "pick the 2 valid
intersections out of 4" is a stable argsort, so the whole thing jits and vmaps
over the batch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.camera import camera_center_h, coord2pix, normalize_pixel, pix2coord, pinv34

EPSILON = 0.001  # reference epipolar.py:20


class EpipolarGeometry(NamedTuple):
    """Static (trace-time) geometry of the sampling problem."""

    feat_h: int
    feat_w: int
    sample_size: int
    downsample: int
    resize: float  # IMAGE_RESIZE * PREDICT_RESIZE
    correct_normalize: bool

    @property
    def xmin(self) -> float:
        return pix2coord(0.0, self.downsample) * self.resize

    @property
    def xmax(self) -> float:
        return pix2coord(self.feat_w - 1.0, self.downsample) * self.resize

    @property
    def ymin(self) -> float:
        return pix2coord(0.0, self.downsample) * self.resize

    @property
    def ymax(self) -> float:
        return pix2coord(self.feat_h - 1.0, self.downsample) * self.resize

    def grid(self, dtype=np.float32) -> np.ndarray:
        """(3, H*W) homogeneous full-res image coords of every feature pixel.

        reference epipolar.py:35-44: pix2coord then scale by the resize chain.
        """
        y = pix2coord(np.arange(self.feat_h, dtype=np.float64), self.downsample) * self.resize
        x = pix2coord(np.arange(self.feat_w, dtype=np.float64), self.downsample) * self.resize
        gy, gx = np.meshgrid(y, x, indexing="ij")
        return np.stack([gx, gy, np.ones_like(gx)]).reshape(3, -1).astype(dtype)


def epipolar_sample_locs(
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    geom: EpipolarGeometry,
    grid: jnp.ndarray | None = None,
):
    """Sample locations along each pixel's epipolar line in the other view.

    Args:
        P1: (3, 4) reference-view projection (full-res image coords).
        P2: (3, 4) source-view projection.
        geom: static geometry.
        grid: optional precomputed (3, H*W) pixel grid (see `geom.grid`).
    Returns:
        sample_locs: (K, H, W, 2) normalized (x, y) in (-1, 1) for grid_sample.
    """
    H, W, K = geom.feat_h, geom.feat_w, geom.sample_size
    if grid is None:
        grid = jnp.asarray(geom.grid())
    grid = grid.astype(P1.dtype)

    # Epipolar line: l2 = e2 x (P2 P1^+ x1)   (reference epipolar.py:334-352)
    # closed-form right pseudo-inverse (no SVD — see geometry.camera.inv3x3)
    P1inv = pinv34(P1)
    X = P1inv @ grid  # (4, HW)
    x2 = P2 @ X  # (3, HW)
    x2 = x2 / x2[2:3, :]
    center = camera_center_h(P1)  # (4,)
    e2 = P2 @ center
    e2 = e2 / e2[2]
    l2 = jnp.cross(jnp.broadcast_to(e2[:, None], x2.shape), x2, axis=0)  # (3, HW)
    l2 = l2.T  # (HW, 3)

    xmin, xmax, ymin, ymax = geom.xmin, geom.xmax, geom.ymin, geom.ymax
    eps = EPSILON

    a, b, c = l2[:, 0], l2[:, 1], l2[:, 2]

    def stable_div(num, den):
        # reference epipolar.py:369-373: sign(den) * max(|den|, eps)
        sign = jnp.where(den >= 0, 1.0, -1.0)
        return num / (sign * jnp.maximum(jnp.abs(den), eps))

    by1 = stable_div(-(xmin * a + c), b)  # y at x = xmin
    by2 = stable_div(-(xmax * a + c), b)  # y at x = xmax
    bx0 = stable_div(-(ymin * b + c), a)  # x at y = ymin
    bx3 = stable_div(-(ymax * b + c), a)  # x at y = ymax

    # 4 candidate intersections, rectangle-edge membership with half-open
    # corner conventions (reference epipolar.py:374-393)
    p0 = jnp.stack([bx0, jnp.full_like(bx0, ymin)], -1)
    p1 = jnp.stack([jnp.full_like(by1, xmin), by1], -1)
    p2 = jnp.stack([jnp.full_like(by2, xmax), by2], -1)
    p3 = jnp.stack([bx3, jnp.full_like(bx3, ymax)], -1)
    cand = jnp.stack([p0, p1, p2, p3], axis=1)  # (HW, 4, 2)

    mask = jnp.stack(
        [
            (bx0 >= xmin + eps) & (bx0 < xmax - eps),
            (by1 > ymin + eps) & (by1 <= ymax - eps),
            (by2 >= ymin + eps) & (by2 < ymax - eps),
            (bx3 > xmin + eps) & (bx3 <= xmax - eps),
        ],
        axis=-1,
    )  # (HW, 4)
    n_inter = jnp.sum(mask, axis=-1)
    has_line = n_inter >= 2

    # Pick the first two True entries in candidate order (reference uses
    # boolean indexing + view, epipolar.py:398-402). Stable argsort puts True
    # positions first in original order.
    order = jnp.argsort(~mask, axis=-1, stable=True)  # (HW, 4)
    first_two = order[:, :2]  # (HW, 2)
    picked = jnp.take_along_axis(cand, first_two[..., None], axis=1)  # (HW, 2, 2)

    # Lines missing the rectangle -> far out of range (epipolar.py:51-53,403)
    outrange = jnp.asarray([xmin - 10000.0, ymin - 10000.0], dtype=picked.dtype)
    picked = jnp.where(has_line[:, None, None], picked, outrange[None, None, :])

    start = picked[:, 0, :]  # (HW, 2)
    vec = picked[:, 1, :] - start
    steps = jnp.linspace(0.0, 1.0, K, dtype=picked.dtype)  # (K,)
    locs = start[None] + vec[None] * steps[:, None, None]  # (K, HW, 2)

    # back to feature-pixel space then (-1, 1)  (epipolar.py:410-414)
    locs = coord2pix(locs / geom.resize, geom.downsample)
    locs = normalize_pixel(locs, H, W, correct=geom.correct_normalize)
    return locs.reshape(K, H, W, 2)


@partial(jax.jit, static_argnames=("geom",))
def epipolar_sample_locs_batch(P1, P2, geom: EpipolarGeometry):
    """Batched over N: P1, P2 (N, 3, 4) -> (N, K, H, W, 2)."""
    grid = jnp.asarray(geom.grid())
    return jax.vmap(lambda a, b: epipolar_sample_locs(a, b, geom, grid))(P1, P2)
