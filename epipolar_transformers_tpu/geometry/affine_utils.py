"""Normalized (-1, 1) affine parameter builders (pure JAX).

Equivalent of reference vision/affine_utils.py:5-106: build 2x3 affine theta
matrices in grid_sample's normalized coordinate convention for crop / scale /
offset / mirror / rotate, normalize/denormalize point sets, and solve for a
theta from point correspondences by least squares.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity_theta(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=dtype)


def crop2affine(box_xyxy_norm) -> jnp.ndarray:
    """Normalized crop box (x0, y0, x1, y1) in (-1,1) -> theta mapping output
    grid onto the box."""
    x0, y0, x1, y1 = box_xyxy_norm
    return jnp.array(
        [[(x1 - x0) / 2.0, 0.0, (x1 + x0) / 2.0],
         [0.0, (y1 - y0) / 2.0, (y1 + y0) / 2.0]]
    )


def scale2affine(sx, sy) -> jnp.ndarray:
    return jnp.array([[sx, 0.0, 0.0], [0.0, sy, 0.0]])


def offset2affine(dx, dy) -> jnp.ndarray:
    return jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy]])


def mirror2affine(horizontal: bool = True) -> jnp.ndarray:
    if horizontal:
        return jnp.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    return jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])


def rotate2affine(angle_rad) -> jnp.ndarray:
    c = jnp.cos(angle_rad)
    s = jnp.sin(angle_rad)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0]])


def compose(theta_a: jnp.ndarray, theta_b: jnp.ndarray) -> jnp.ndarray:
    """Apply theta_b after theta_a (2x3 each)."""
    A = jnp.concatenate([theta_a, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    B = jnp.concatenate([theta_b, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    return (B @ A)[:2]


def normalize_points(pts, H, W, correct: bool = True):
    """Pixel points -> (-1, 1) (delegates to geometry.camera conventions)."""
    from .camera import normalize_pixel

    return normalize_pixel(pts, H, W, correct)


def denormalize_points(pts, H, W, correct: bool = True):
    from .camera import denormalize_pixel

    return denormalize_pixel(pts, H, W, correct)


def solve_theta(src_pts: jnp.ndarray, dst_pts: jnp.ndarray) -> jnp.ndarray:
    """Least-squares 2x3 affine with dst = theta @ [src, 1]
    (reference affine_utils lstsq theta solver)."""
    n = src_pts.shape[0]
    A = jnp.concatenate([src_pts, jnp.ones((n, 1), src_pts.dtype)], axis=1)
    sol, *_ = jnp.linalg.lstsq(A, dst_pts)
    return sol.T  # (2, 3)


def apply_theta(theta: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    n = pts.shape[0]
    A = jnp.concatenate([pts, jnp.ones((n, 1), pts.dtype)], axis=1)
    return A @ theta.T
