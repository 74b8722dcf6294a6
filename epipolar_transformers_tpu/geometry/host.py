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
