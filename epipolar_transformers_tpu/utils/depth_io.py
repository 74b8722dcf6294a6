"""Depth map loaders (tiff/png/pgm) — reference utils/depth_io.py."""

from __future__ import annotations

import numpy as np


def load_depth(path: str, scale: float = 1.0) -> np.ndarray:
    """Load a depth image as float32 (meters when `scale` converts units).

    Supports 16-bit png / pgm / tiff via cv2 (IMREAD_UNCHANGED keeps depth).
    """
    import cv2

    depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if depth is None:
        raise FileNotFoundError(path)
    if depth.ndim == 3:
        depth = depth[..., 0]
    return depth.astype(np.float32) * scale


def rhd_depth_decode(depth_rgb: np.ndarray) -> np.ndarray:
    """RHD packs depth into two uint8 channels: d = (top*256 + bottom)/65535
    (RHD dataset convention)."""
    top = depth_rgb[..., 0].astype(np.float32)
    bottom = depth_rgb[..., 1].astype(np.float32)
    return (top * 256.0 + bottom) / 65535.0


def save_depth_png(path: str, depth: np.ndarray, scale: float = 1000.0):
    """Store float depth as 16-bit png (mm by default)."""
    import cv2

    cv2.imwrite(path, np.clip(depth * scale, 0, 65535).astype(np.uint16))
