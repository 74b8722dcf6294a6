"""Host-side (numpy, float64) eval geometry.

The reference evaluates triangulation on CPU in float64 (cv2/pymvg); mm-level
MPJPE parity needs the same precision, while the on-device float32 versions
in geometry/triangulate.py serve the high-throughput path.  Same math,
numpy implementation.
"""

from __future__ import annotations

import numpy as np


def dlt_triangulate_np(pts: np.ndarray, Ps: np.ndarray) -> np.ndarray:
    """Hartley-Zisserman DLT (reference multi_camera_system.py:208-225)."""
    A = []
    for (x, y), P in zip(pts, Ps):
        A.append(x * P[2] - P[0])
        A.append(y * P[2] - P[1])
    _, _, vt = np.linalg.svd(np.asarray(A, dtype=np.float64))
    v = vt[-1]
    return v[:3] / v[3]


def _camera_centers_invA(KRTs: np.ndarray):
    A = KRTs[:, :, :3]
    invA = np.linalg.inv(A)
    centers = -np.einsum("vij,vj->vi", invA, KRTs[:, :, 3])
    return centers, invA


def _point_line_dist(p3d, pts, centers, invA):
    """Distance from p3d to each view's back-projected ray
    (reference triangulation.py:87-95,144-147)."""
    ones = np.ones((len(pts), 1))
    dirs = np.einsum("vij,vj->vi", invA, np.concatenate([pts, ones], 1))
    x1 = dirs + centers
    cro = np.cross(x1 - p3d, centers - p3d)
    return np.linalg.norm(cro, axis=1) / (np.linalg.norm(x1 - centers, axis=1) + 1e-12)


def triangulate_ransac_np(
    pts: np.ndarray,
    KRTs: np.ndarray,
    confs: np.ndarray,
    conf_thres: float = 0.05,
    ransac_thres: float = 3.0,
    n_iter: int = 100,
    refine: bool = False,
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """'naive' / 'refine' triangulation (reference triangulation.py:99-232):
    RANSAC over random view pairs with point-to-ray inlier counting; with
    `refine`, a DLT re-fit over the winning inliers (> 1)."""
    rng = rng or np.random.RandomState(0)
    pts = np.asarray(pts, dtype=np.float64)
    KRTs = np.asarray(KRTs, dtype=np.float64)
    V, J = confs.shape
    centers, invA = _camera_centers_invA(KRTs)
    out = np.zeros((J, 3))
    for k in range(J):
        sel = np.where(confs[:, k] > conf_thres)[0]
        if len(sel) <= 1:
            continue
        cands = pts[sel, k]
        best_acc, best3d, best_inliers = 0, np.zeros(3), []
        for _ in range(n_iter):
            a, b = rng.choice(len(sel), 2, replace=False)
            p3d = dlt_triangulate_np(cands[[a, b]], KRTs[sel][[a, b]])
            if not np.isfinite(p3d).all():
                continue
            d = _point_line_dist(p3d, cands, centers[sel], invA[sel])
            inliers = np.where(d < ransac_thres)[0]
            if len(inliers) > best_acc:
                best_acc, best3d, best_inliers = len(inliers), p3d, inliers
        if refine and len(best_inliers) > 1:
            best3d = dlt_triangulate_np(cands[best_inliers], KRTs[sel][best_inliers])
        out[k] = best3d
    return out


def triangulate_epipolar_np(
    pts: np.ndarray,
    KRTs: np.ndarray,
    Ks: np.ndarray,
    RTs: np.ndarray,
    confs: np.ndarray,
    corr_pos: np.ndarray,
    other_KRTs: np.ndarray,
    conf_thres: float = 0.05,
    ransac_thres: float = 3.0,
    resize: float = 1.0,
    downsample: int = 4,
    dlt: bool = False,
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """Epipolar-correspondence-assisted triangulation (reference
    triangulation.py:234-348): when < 2 views clear the confidence threshold,
    the epipolar transformer's correspondence map supplies a second
    observation in the paired view; with `dlt`, confident views go straight
    to DLT; otherwise RANSAC (+DLT re-fit over > 2 inliers).

    corr_pos: (V, h, w, 2) feature-pixel best-match maps.
    """
    rng = rng or np.random.RandomState(0)
    pts = np.asarray(pts, dtype=np.float64)
    KRTs = np.asarray(KRTs, dtype=np.float64)
    other_KRTs = np.asarray(other_KRTs, dtype=np.float64)
    V, J = confs.shape
    centers, invA = _camera_centers_invA(KRTs)
    Ps = np.asarray(Ks, dtype=np.float64) @ np.asarray(RTs, dtype=np.float64)
    out = np.zeros((J, 3))
    for k in range(J):
        conf = confs[:, k]
        sel = conf > conf_thres
        if sel.sum() == 0:
            sel = np.zeros_like(sel)
            sel[np.argmax(conf)] = True
        if sel.sum() == 1:
            # one confident view + its epipolar correspondence (:277-289)
            v = int(np.where(sel)[0][0])
            cand = pts[v, k]
            pix = (cand / resize + 0.5 - downsample / 2.0) / downsample  # coord2pix
            h, w = corr_pos.shape[1:3]
            xi = int(np.clip(pix[0], 0, w - 1))
            yi = int(np.clip(pix[1], 0, h - 1))
            other = corr_pos[v, yi, xi]
            other = (other * downsample + downsample / 2.0 - 0.5) * resize  # pix2coord
            stacked = np.stack([cand, other])
            out[k] = dlt_triangulate_np(stacked, np.stack([KRTs[v], other_KRTs[v]]))
            continue
        sel_idx = np.where(sel)[0]
        cands = pts[sel_idx, k]
        if dlt:
            out[k] = dlt_triangulate_np(cands, Ps[sel_idx])
            continue
        best_acc, best3d, best_inliers = 0, np.zeros(3), []
        for _ in range(100):
            a, b = rng.choice(len(sel_idx), 2, replace=False)
            p3d = dlt_triangulate_np(cands[[a, b]], KRTs[sel_idx][[a, b]])
            if not np.isfinite(p3d).all():
                continue
            d = _point_line_dist(p3d, cands, centers[sel_idx], invA[sel_idx])
            inliers = np.where(d < ransac_thres)[0]
            if len(inliers) > best_acc:
                best_acc, best3d, best_inliers = len(inliers), p3d, inliers
        if len(best_inliers) > 2:
            best3d = dlt_triangulate_np(cands[best_inliers], Ps[sel_idx][best_inliers])
        out[k] = best3d
    return out


def triangulate_pymvg_np(
    pts: np.ndarray,
    Ks: np.ndarray,
    RTs: np.ndarray,
    confs: np.ndarray,
    conf_thres: float = 0.05,
) -> np.ndarray:
    """Adaptive confidence-thresholded DLT (reference triangulation.py:400-441).

    Args:
        pts: (V, J, 2); Ks: (V, 3, 3); RTs: (V, 3, 4); confs: (V, J).
    Returns:
        (J, 3) float64.
    """
    pts = np.asarray(pts, dtype=np.float64)
    Ps = np.asarray(Ks, dtype=np.float64) @ np.asarray(RTs, dtype=np.float64)
    confs = np.asarray(confs)
    J = pts.shape[1]
    out = np.zeros((J, 3))
    for k in range(J):
        thresh = conf_thres
        while True:
            sel = np.where(confs[:, k] > thresh)[0]
            if thresh < -1:
                break
            if len(sel) <= 1:
                thresh -= 0.05
            else:
                break
        out[k] = dlt_triangulate_np(pts[sel, k], Ps[sel])
    return out
