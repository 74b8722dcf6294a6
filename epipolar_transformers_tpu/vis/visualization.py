"""Offline visualization / introspection tools.

Equivalents of reference vision/visualization.py:319-643 + scripts/video.py:
  * pointcloud export: saved eval predictions -> per-sample pickle dumps for
    notebook viewers (visualization.py:320-466);
  * epipolar-line introspection: run a live Epipolar module on a batch and
    dump sample locations / attention weights / correspondence maps
    (the data side of the interactive Cursor tooling, :472-537);
  * AUC curves from accumulated PCK counts (:178-190);
  * video assembly: frame dumps -> side-by-side mp4 grid (scripts/video.py).

All functions are headless: they write files rather than opening windows
(interactive matplotlib cursors have no place on a TPU pod).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np


def export_pointclouds(predictions_path: str, out_dir: str, limit: int = -1):
    """Eval prediction dumps -> per-sample pkl point clouds
    (reference visualization.py:320-466 stores {pred3d, gt3d, locs, scos})."""
    with open(predictions_path, "rb") as f:
        preds = pickle.load(f)
    os.makedirs(out_dir, exist_ok=True)
    n = len(preds) if limit < 0 else min(limit, len(preds))
    for i in range(n):
        with open(os.path.join(out_dir, f"pointcloud_{i:05d}.pkl"), "wb") as f:
            pickle.dump(preds[i], f)
    return n


def epipolar_introspection(cfg, variables, batch: Dict[str, np.ndarray],
                           out_path: Optional[str] = None):
    """Run the Epipolar layer in debug mode on real features and dump every
    geometric intermediate (reference Epipolar(debug=True) returns
    sample_locs/intersections/etc., epipolar.py:264-265 + visualization.py:
    472-537).  Returns the dict (and writes it when out_path given)."""
    import jax
    import jax.numpy as jnp

    from ..models.epipolar import Epipolar
    from ..ops.epipolar_sampling import epipolar_sample_locs

    model = Epipolar(cfg)
    geom = model.geometry

    P1 = jnp.asarray(batch["KRT"], dtype=jnp.float32)
    P2 = jnp.asarray(batch["other_KRT"], dtype=jnp.float32)
    sample_locs = jax.vmap(lambda a, b: epipolar_sample_locs(a, b, geom))(P1, P2)

    feat1 = jnp.asarray(batch["feat"])
    feat2 = jnp.asarray(batch["other_feat"])
    out, corr_pos, depth, _ = model.apply(
        variables, feat1, feat2, P1, P2, train=False
    )
    dump = {
        "sample_locs": np.asarray(sample_locs),
        "corr_pos": np.asarray(corr_pos),
        "attention": np.asarray(depth),
        "fused": np.asarray(out),
    }
    if out_path:
        with open(out_path, "wb") as f:
            pickle.dump(dump, f)
    return dump


def auc_curve(err_joints: np.ndarray, total_joints: np.ndarray,
              max_threshold: float):
    """Accumulated per-image error counts -> (thresholds, accuracy, AUC)
    (reference visualization.py:178-190 + metrics2d.py:111-116)."""
    thresholds = np.linspace(0, max_threshold, num=int(max_threshold))
    acc = err_joints.sum(axis=0) / max(total_joints.sum(), 1)
    # trapezoidal AUC normalized by the threshold range
    trapezoid = getattr(np, "trapezoid", np.trapz)
    auc = trapezoid(acc, thresholds) / max_threshold
    return thresholds, acc, float(auc)


def assemble_video(frame_dirs, out_path: str, fps: int = 10, grid_cols: int = 2):
    """Side-by-side mp4 from per-view frame directories
    (reference scripts/video.py:44-125)."""
    import cv2

    frame_lists = [sorted(os.listdir(d)) for d in frame_dirs]
    n_frames = min(len(fl) for fl in frame_lists)
    assert n_frames > 0, "no frames found"
    first = cv2.imread(os.path.join(frame_dirs[0], frame_lists[0][0]))
    h, w = first.shape[:2]
    rows = -(-len(frame_dirs) // grid_cols)
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w * grid_cols, h * rows)
    )
    for i in range(n_frames):
        canvas = np.zeros((h * rows, w * grid_cols, 3), np.uint8)
        for v, (d, fl) in enumerate(zip(frame_dirs, frame_lists)):
            img = cv2.imread(os.path.join(d, fl[i]))
            r, c = divmod(v, grid_cols)
            canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
        writer.write(canvas)
    writer.release()
    return n_frames
