"""Multi-view triangulation (pure JAX, batched, jit/vmap-safe).

TPU-native rebuild of reference vision/triangulation.py + the vendored pymvg
DLT (vision/multi_camera_system.py:199-225).  Where the reference loops in
Python over joints and RANSAC iterations with cv2 calls (triangulation.py:
122-153 — the eval-time hot loop), everything here is one batched SVD /
masked reduction, so a full 17-joint x 100-hypothesis RANSAC is a single XLA
program.

Notes on parity:
  * `dlt_triangulate` == Hartley-Zisserman find3d (multi_camera_system.py:
    208-225): rows x*P[2]-P[0], y*P[2]-P[1], smallest right singular vector.
    Masked-out views contribute zero rows, which leave A^T A (and hence the
    null vector) unchanged — exact equivalence to dropping the rows.
  * `triangulate_pymvg` replicates the adaptive confidence-threshold decay
    (triangulation.py:426-435): lower by 0.05 until >= 2 views pass.
  * RANSAC uses jax.random instead of python `random`; the reference's
    results tolerate seed differences (SURVEY §7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .camera import camera_center

RANSAC_ITER = 100  # reference triangulation.py:97


def _dlt_A(pts: jnp.ndarray, Ps: jnp.ndarray, weights: jnp.ndarray | None) -> jnp.ndarray:
    """Stack DLT rows: (V, 2) points + (V, 3, 4) cameras -> (2V, 4)."""
    rx = pts[:, 0:1] * Ps[:, 2, :] - Ps[:, 0, :]
    ry = pts[:, 1:2] * Ps[:, 2, :] - Ps[:, 1, :]
    A = jnp.concatenate([rx, ry], axis=-1).reshape(-1, 4)  # interleave x,y per view
    if weights is not None:
        w = jnp.repeat(weights.astype(A.dtype), 2)
        A = A * w[:, None]
    return A


def dlt_triangulate(pts: jnp.ndarray, Ps: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Linear (SVD) triangulation of one 3D point from V views.

    Args:
        pts: (V, 2) pixel observations.
        Ps: (V, 3, 4) projection matrices.
        weights: optional (V,) 0/1 view mask.
    Returns:
        (3,) world point.
    """
    A = _dlt_A(pts, Ps, weights)
    _, _, vt = jnp.linalg.svd(A)
    v = vt[-1]
    return v[:3] / v[3]


def dlt_triangulate_pair(P1, P2, p1, p2) -> jnp.ndarray:
    """Two-view homogeneous DLT (== cv2.triangulatePoints then dehomogenize,
    reference triangulation.py:139-141,156-160)."""
    pts = jnp.stack([p1, p2])
    Ps = jnp.stack([P1, P2])
    return dlt_triangulate(pts, Ps)


def point_line_distances(p3d: jnp.ndarray, pts: jnp.ndarray, KRTs: jnp.ndarray) -> jnp.ndarray:
    """Distance from p3d to each view's back-projected ray.

    reference triangulation.py:87-95,144-147: the ray passes through the
    camera center c and x1 = A^{-1} (u, v, 1) + c.
    """
    A = KRTs[:, :, :3]
    centers = camera_center(KRTs)  # (V, 3)
    ones = jnp.ones_like(pts[:, :1])
    dirs = jnp.linalg.solve(A, jnp.concatenate([pts, ones], axis=-1)[..., None])[..., 0]
    x1 = dirs + centers
    d1 = x1 - p3d
    d2 = centers - p3d
    cro = jnp.cross(d1, d2)
    return jnp.linalg.norm(cro, axis=-1) / (jnp.linalg.norm(x1 - centers, axis=-1) + 1e-12)


def _ransac_one_joint(pts, KRTs, selected, key, ransac_thres, n_iter):
    """Vectorized RANSAC for one joint.

    Returns (best3d, best_inlier_mask, best_count). Candidate pairs are drawn
    uniformly over the selected views (reference triangulation.py:133-153);
    a==b draws are discarded, matching the reference's `continue`.
    """
    V = pts.shape[0]
    nsel = jnp.sum(selected)
    probs = selected / jnp.maximum(nsel, 1)
    ka, kb = jax.random.split(key)
    a = jax.random.categorical(ka, jnp.log(probs + 1e-30), shape=(n_iter,))
    b = jax.random.categorical(kb, jnp.log(probs + 1e-30), shape=(n_iter,))
    valid = a != b

    def hypothesis(ai, bi):
        return dlt_triangulate_pair(KRTs[ai], KRTs[bi], pts[ai], pts[bi])

    p3ds = jax.vmap(hypothesis)(a, b)  # (n_iter, 3)
    dists = jax.vmap(lambda p: point_line_distances(p, pts, KRTs))(p3ds)  # (n_iter, V)
    inliers = (dists < ransac_thres) & selected.astype(bool)[None, :]
    counts = jnp.sum(inliers, axis=-1)
    # invalid pairs and NaN hypotheses never win (reference: acc stays 0)
    good = valid & jnp.all(jnp.isfinite(p3ds), axis=-1)
    scores = jnp.where(good, counts, -1)
    best = jnp.argmax(scores)  # first max == earliest iteration, matches `>` update
    best_count = scores[best]
    won = best_count > 0  # reference only replaces best3D when acc > 0
    best3d = jnp.where(won, p3ds[best], jnp.zeros(3, dtype=pts.dtype))
    best_inliers = jnp.where(won, inliers[best], jnp.zeros(V, dtype=bool))
    return best3d, best_inliers, jnp.maximum(best_count, 0)


@partial(jax.jit, static_argnames=("n_iter",))
def triangulate_ransac(
    pts: jnp.ndarray,
    KRTs: jnp.ndarray,
    confs: jnp.ndarray,
    key: jax.Array,
    conf_thres: float = 0.05,
    ransac_thres: float = 3.0,
    n_iter: int = RANSAC_ITER,
) -> jnp.ndarray:
    """'naive' triangulation (reference triangulation.py:99-154).

    Args:
        pts: (V, J, 2) per-view 2D predictions (full-res image coords).
        KRTs: (V, 3, 4).
        confs: (V, J).
    Returns:
        (J, 3) world points; zeros where < 2 confident views.
    """
    J = pts.shape[1]
    keys = jax.random.split(key, J)

    def per_joint(j_pts, j_conf, j_key):
        selected = (j_conf > conf_thres).astype(pts.dtype)
        p3d, _, _ = _ransac_one_joint(j_pts, KRTs, selected, j_key, ransac_thres, n_iter)
        return jnp.where(jnp.sum(selected) > 1, p3d, jnp.zeros(3, dtype=pts.dtype))

    return jax.vmap(per_joint, in_axes=(1, 1, 0))(pts, confs, keys)


@partial(jax.jit, static_argnames=("n_iter",))
def triangulate_refine(
    pts: jnp.ndarray,
    KRTs: jnp.ndarray,
    confs: jnp.ndarray,
    key: jax.Array,
    conf_thres: float = 0.05,
    ransac_thres: float = 3.0,
    n_iter: int = RANSAC_ITER,
) -> jnp.ndarray:
    """RANSAC then DLT re-fit over the winning inlier set.

    reference triangulation.py:162-232 (re-fit when > 1 inlier).
    """
    J = pts.shape[1]
    keys = jax.random.split(key, J)

    def per_joint(j_pts, j_conf, j_key):
        selected = (j_conf > conf_thres).astype(pts.dtype)
        p3d, inliers, count = _ransac_one_joint(j_pts, KRTs, selected, j_key, ransac_thres, n_iter)
        refit = dlt_triangulate(j_pts, KRTs, inliers.astype(pts.dtype))
        p3d = jnp.where(count > 1, refit, p3d)
        return jnp.where(jnp.sum(selected) > 1, p3d, jnp.zeros(3, dtype=pts.dtype))

    return jax.vmap(per_joint, in_axes=(1, 1, 0))(pts, confs, keys)


def _adaptive_selection(conf: jnp.ndarray, conf_thres: float, step: float = 0.05):
    """Adaptive threshold decay: lower by `step` until >= 2 views selected.

    reference triangulation.py:426-435 (stops once thresh < -1).
    """
    n_steps = int((conf_thres + 1.0) / step) + 2
    threshs = conf_thres - step * jnp.arange(n_steps, dtype=conf.dtype)
    counts = jnp.sum(conf[None, :] > threshs[:, None], axis=-1)
    ok = counts > 1
    first = jnp.argmax(ok)  # first threshold with >= 2 views
    idx = jnp.where(jnp.any(ok), first, n_steps - 1)
    return conf > threshs[idx]


@partial(jax.jit, static_argnames=("conf_thres",))
def triangulate_pymvg(
    pts: jnp.ndarray,
    Ks: jnp.ndarray,
    RTs: jnp.ndarray,
    confs: jnp.ndarray,
    conf_thres: float = 0.05,
) -> jnp.ndarray:
    """Confidence-thresholded all-view DLT == the reference 'pymvg' mode.

    reference triangulation.py:400-441 + multi_camera_system.py:199-225.
    The pymvg camera there is built with zero distortion and P = K @ RT, so
    undistortion is the identity and this is exactly a masked DLT.

    Args:
        pts: (V, J, 2); Ks: (V, 3, 3); RTs: (V, 3, 4); confs: (V, J).
    Returns:
        (J, 3).
    """
    Ps = Ks @ RTs

    def per_joint(j_pts, j_conf):
        sel = _adaptive_selection(j_conf, conf_thres)
        return dlt_triangulate(j_pts, Ps, sel.astype(pts.dtype))

    return jax.vmap(per_joint, in_axes=(1, 1))(pts, confs)
