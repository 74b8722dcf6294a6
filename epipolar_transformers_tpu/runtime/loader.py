"""ctypes bindings for the native host data-path kernels (warp.cpp).

Auto-builds `libwarp.so` with g++ -O3 -fopenmp on first use (cached beside
the source); every entry point has a numpy fallback so the pipeline works
without a compiler.  See runtime/warp.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "warp.cpp")
_LIB = os.path.join(_HERE, "libwarp.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native warp build failed (%s); using numpy fallback", e)
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    lib.warp_affine_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.gaussian_heatmaps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.remap_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def warp_affine(src: np.ndarray, trans: np.ndarray, out_size) -> np.ndarray:
    """cv2.warpAffine(INTER_LINEAR, border 0) equivalent.

    Args: src (H, W, C) float32; trans (2, 3) forward src->dst; out_size
    (W_out, H_out) in the cv2 convention.
    """
    W_out, H_out = int(out_size[0]), int(out_size[1])
    src = np.ascontiguousarray(src, dtype=np.float32)
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    lib = get_lib()
    if lib is None:
        return _warp_affine_np(src, trans, (W_out, H_out), squeeze)
    dst = np.empty((H_out, W_out, src.shape[2]), dtype=np.float32)
    t = np.ascontiguousarray(trans, dtype=np.float64)
    lib.warp_affine_bilinear(
        _fptr(src), src.shape[0], src.shape[1], src.shape[2],
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _fptr(dst), H_out, W_out,
    )
    return dst[..., 0] if squeeze else dst


def _warp_affine_np(src, trans, out_size, squeeze):
    W_out, H_out = out_size
    M = np.concatenate([np.asarray(trans, np.float64), [[0, 0, 1]]], axis=0)
    Minv = np.linalg.inv(M)
    xs, ys = np.meshgrid(np.arange(W_out), np.arange(H_out))
    sx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    sy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    out = _remap_np(src, sx.astype(np.float32), sy.astype(np.float32))
    return out[..., 0] if squeeze else out


def render_heatmaps(coords_xy: np.ndarray, hm_size, sigma: float,
                    downsample: float, visibility=None) -> np.ndarray:
    """Gaussian target heatmaps (J, h, w) — native Heatmapcreator."""
    H, W = int(hm_size[0]), int(hm_size[1])
    coords = np.ascontiguousarray(coords_xy[:, :2], dtype=np.float32)
    J = coords.shape[0]
    vis = None
    if visibility is not None:
        vis = np.ascontiguousarray(np.asarray(visibility, np.float32).reshape(-1))
    lib = get_lib()
    if lib is None:
        from ..ops.heatmap import make_heatmap_grid

        grid = make_heatmap_grid((H, W), downsample, sigma)
        sig = sigma * np.sqrt(2)
        d = coords[:, 1::-1, None, None] / sig - grid[None]
        dist = np.einsum("jchw,jchw->jhw", d, d)
        out = np.exp(-np.clip(dist, 0, 4.60517019)).astype(np.float32)
        if vis is not None:
            out[vis <= 0] = 0.0
        return out
    out = np.empty((J, H, W), dtype=np.float32)
    lib.gaussian_heatmaps(
        _fptr(coords), _fptr(vis) if vis is not None else None,
        J, H, W, ctypes.c_float(sigma), ctypes.c_float(downsample), _fptr(out),
    )
    return out


def remap(src: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    """Bilinear remap (undistortion hot path)."""
    src = np.ascontiguousarray(src, dtype=np.float32)
    squeeze = src.ndim == 2
    if squeeze:
        src = src[..., None]
    lib = get_lib()
    if lib is None:
        out = _remap_np(src, map_x, map_y)
        return out[..., 0] if squeeze else out
    H, W = map_x.shape
    dst = np.empty((H, W, src.shape[2]), dtype=np.float32)
    mx = np.ascontiguousarray(map_x, np.float32)
    my = np.ascontiguousarray(map_y, np.float32)
    lib.remap_bilinear(
        _fptr(src), src.shape[0], src.shape[1], src.shape[2],
        _fptr(mx), _fptr(my), _fptr(dst), H, W,
    )
    return dst[..., 0] if squeeze else dst


def _remap_np(src, map_x, map_y):
    H_s, W_s, C = src.shape
    x0 = np.floor(map_x).astype(int)
    y0 = np.floor(map_y).astype(int)
    wx = (map_x - x0)[..., None]
    wy = (map_y - y0)[..., None]
    out = np.zeros(map_x.shape + (C,), np.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xx = x0 + dx
            yy = y0 + dy
            valid = (xx >= 0) & (xx < W_s) & (yy >= 0) & (yy < H_s)
            w = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
            vals = src[np.clip(yy, 0, H_s - 1), np.clip(xx, 0, W_s - 1)]
            out += np.where(valid[..., None], vals * w, 0.0)
    return out
