"""Camera geometry primitives (pure JAX, batched).

Functional equivalents of reference vision/multiview.py:8-192.  All functions
are shape-polymorphic over leading batch dims and safe under `jax.jit`/`vmap`.

Coordinate conventions (load-bearing for mm-level parity — reference
vision/multiview.py:25-57,154-163):
  * `pix2coord(x, d) = x*d + d/2 - 0.5`  — feature-map pixel index -> image
    coordinate at feature stride `d` (the center of the d×d pixel block).
  * `normalize` maps pixel indices to (-1, 1).  The "correct" variant
    (USE_CORRECT_NORMALIZE=True, used by all the "fixed" 33.1mm configs) is
    align_corners=True semantics: x_norm = 2x/(W-1) - 1.  The legacy variant
    is x_norm = 2(x+0.5)/W - 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) 3x3 inverse, batched over leading dims.

    TPU-friendly: pure arithmetic instead of LU/LAPACK loops — tiny-matrix
    `jnp.linalg.inv/solve/pinv` lower to iterative code that is slow on TPU
    (and the standalone graph can even crash the Mosaic-era XLA pipeline).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def pinv34(P: jnp.ndarray) -> jnp.ndarray:
    """Right pseudo-inverse of a full-row-rank (..., 3, 4) projection:
    P^+ = P^T (P P^T)^{-1} — closed form via inv3x3 (no SVD).

    Projection matrices are badly scaled (focal ~1e3, translations ~1e3-1e6),
    and normal equations square the condition number, so rows and columns are
    diagonally equilibrated first: P = Dr^{-1} P' Dc^{-1} with P' rows/cols
    O(1), then P^+ = Dc^{-1} P'^+ Dr^{-1} ... (scalings applied as vectors).
    """
    # row equilibration
    rn = jnp.linalg.norm(P, axis=-1, keepdims=True)  # (..., 3, 1)
    Pr = P / rn
    # column equilibration
    cn = jnp.linalg.norm(Pr, axis=-2, keepdims=True)  # (..., 1, 4)
    Pe = Pr / cn
    PPt = Pe @ jnp.swapaxes(Pe, -1, -2)
    pinv_e = jnp.swapaxes(Pe, -1, -2) @ inv3x3(PPt)  # (..., 4, 3)
    # undo scaling: P = (Pe * cn) * rn (broadcast), so
    # P^+ = (1/cn)^T-scaled rows of pinv_e, (1/rn)-scaled cols
    return pinv_e / jnp.swapaxes(cn, -1, -2) / jnp.swapaxes(rn, -1, -2)


def camera_center(KRT: jnp.ndarray) -> jnp.ndarray:
    """Center of projection C (world coords) of P=[A|b]: C = -A^{-1} b.

    reference: vision/multiview.py:8-23.

    Args:
        KRT: (..., 3, 4) projection matrices.
    Returns:
        (..., 3) camera centers.
    """
    A = KRT[..., :, :3]
    b = KRT[..., :, 3]
    return -(inv3x3(A) @ b[..., None])[..., 0]


def camera_center_h(KRT: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous camera center (..., 4) with trailing 1 (torch variant,
    reference vision/multiview.py:16-21)."""
    c = camera_center(KRT)
    return jnp.concatenate([c, jnp.ones_like(c[..., :1])], axis=-1)


def normalize_pixel(pts: jnp.ndarray, H: int, W: int, correct: bool = True) -> jnp.ndarray:
    """Pixel indices -> (-1, 1). pts[..., 0] is x (width), pts[..., 1] is y.

    reference: vision/multiview.py:25-37.
    """
    x, y = pts[..., 0], pts[..., 1]
    if correct:
        x = -1.0 + 2.0 * x / (W - 1)
        y = -1.0 + 2.0 * y / (H - 1)
    else:
        x = -1.0 + 2.0 * (x + 0.5) / W
        y = -1.0 + 2.0 * (y + 0.5) / H
    return jnp.stack([x, y], axis=-1)


def denormalize_pixel(pts: jnp.ndarray, H: int, W: int, correct: bool = True) -> jnp.ndarray:
    """(-1, 1) -> pixel indices. Inverse of `normalize_pixel`.

    reference: vision/multiview.py:39-57.
    """
    x, y = pts[..., 0], pts[..., 1]
    if correct:
        x = (x + 1.0) * (W - 1) / 2.0
        y = (y + 1.0) * (H - 1) / 2.0
    else:
        x = (x + 1.0) * W / 2.0 - 0.5
        y = (y + 1.0) * H / 2.0 - 0.5
    return jnp.stack([x, y], axis=-1)


def pix2coord(x, downsample):
    """Feature-pixel index -> full-resolution image coordinate.

    reference: vision/multiview.py:154-157.
    """
    return x * downsample + downsample / 2.0 - 0.5


def coord2pix(y, downsample):
    """Full-resolution image coordinate -> feature-pixel index.

    reference: vision/multiview.py:159-163.
    """
    return (y + 0.5 - downsample / 2.0) / downsample


def crossmat(vec: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix [v]_x, batched over leading dims.

    reference: vision/multiview.py:149-152.
    """
    zeros = jnp.zeros_like(vec[..., 0])
    rows = [
        jnp.stack([zeros, -vec[..., 2], vec[..., 1]], axis=-1),
        jnp.stack([vec[..., 2], zeros, -vec[..., 0]], axis=-1),
        jnp.stack([-vec[..., 1], vec[..., 0], zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def fundamental_matrix(P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    """Fundamental matrix F from two projection matrices: F = [e2]_x P2 P1^+.

    reference: vision/multiview.py:85-147.

    Args:
        P1, P2: (..., 3, 4).
    Returns:
        (..., 3, 3) with x2^T F x1 = 0.
    """
    P1inv = pinv34(P1)
    P2P1inv = P2 @ P1inv
    C = camera_center_h(P1)
    e2 = (P2 @ C[..., None])[..., 0]
    return crossmat(e2) @ P2P1inv


def neighbor_cameras(krt_by_cam: dict) -> dict:
    """Rank other cameras by distance between centers of projection.

    Host-side helper used by dataset grouping (numpy, not traced).
    reference: vision/multiview.py:59-83.

    Args:
        krt_by_cam: {cam_id: (3, 4) KRT}.
    Returns:
        {cam_id: (list of other cam_ids sorted by distance,
                  np.ndarray of those distances)}.
    """
    cams = list(krt_by_cam.keys())
    centers = {}
    for k, krt in krt_by_cam.items():
        krt = np.asarray(krt)
        centers[k] = -np.linalg.inv(krt[:, :3]) @ krt[:, 3]
    rank = {}
    for k0, c0 in centers.items():
        dist = {k1: float(np.linalg.norm(c0 - c1)) for k1, c1 in centers.items()}
        order = sorted(cams, key=lambda c: dist[c])
        sorted_dist = np.array(sorted(dist.values()))
        assert order[0] == k0
        rank[k0] = (order[1:], sorted_dist[1:])
    return rank


def project_point_radial(x, f, c, k, p, R=None, T=None):
    """Project world points with radial+tangential distortion (H36M camera).

    reference: vision/multiview.py:165-192.  Pure jnp, used for rendering GT
    2D points from mocap 3D.

    Args:
        x: (N, 3) world points.
        f: scalar focal. c: (2,) or (2,1) center. k: (3,) radial. p: (2,) tangential.
        R: (3, 3), T: (3,) or (3,1) camera pose (optional).
    Returns:
        (N, 2) pixel points.
    """
    x = jnp.asarray(x)
    c = jnp.asarray(c).reshape(2)
    k = jnp.asarray(k).reshape(3)
    p = jnp.asarray(p).reshape(2)
    if R is None or T is None:
        xcam = x.T
    else:
        T = jnp.asarray(T).reshape(3, 1)
        xcam = jnp.asarray(R) @ (x.T - T)
    y = xcam[:2] / xcam[2]
    r2 = jnp.sum(y ** 2, axis=0)
    radial = 1 + k[0] * r2 + k[1] * r2 ** 2 + k[2] * r2 ** 3
    tan = 2 * p[0] * y[1] + 2 * p[1] * y[0]
    y = y * (radial + tan)[None, :] + jnp.outer(jnp.array([p[1], p[0]]), r2)
    ypixel = f * y + c[:, None]
    return ypixel.T


def compose_KRT(K: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """KRT = K [R | -R T] where T is the camera center in world coords.

    Matches the reference dataset convention (data/datasets/joints_dataset.py:
    Rt = [R | -R.T_world], KRT = K @ Rt).
    """
    T = T.reshape(*T.shape[:-2], 3, 1) if T.ndim >= 2 else T.reshape(3, 1)
    Rt = jnp.concatenate([R, -R @ T], axis=-1)
    return K @ Rt
