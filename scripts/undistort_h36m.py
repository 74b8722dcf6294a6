"""Precompute undistorted H36M images into `undistoredimages.zip`.

Equivalent of reference scripts/undistort_h36m.py: per-item cv2.undistort of
1000x1000 frames dominates loading (SURVEY §7 hard parts), so the reference
precomputes undistorted zips selected via DATASETS.DATA_FORMAT
'undistoredzip'.  This version precomputes the inverse-distortion remap ONCE
per camera and applies it with the native OpenMP remap kernel.

Usage:
    python scripts/undistort_h36m.py --root datasets --anno datasets/h36m/annot/h36m_train.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def camera_maps(K, dist, size):
    """Inverse-distortion sampling maps (map_x, map_y) for cv2-style remap."""
    import cv2

    w, h = size
    return cv2.initUndistortRectifyMap(
        K, dist, None, K, (w, h), cv2.CV_32FC1
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets")
    ap.add_argument("--anno", required=True)
    ap.add_argument("--out", default=None, help="output zip (default: <root>/h36m/undistoredimages.zip)")
    ap.add_argument("--limit", type=int, default=-1)
    args = ap.parse_args()

    import cv2

    from epipolar_transformers_tpu.runtime import loader as native

    with open(args.anno, "rb") as f:
        db = pickle.load(f)

    out_path = args.out or os.path.join(args.root, "h36m", "undistoredimages.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    maps_cache = {}
    n = 0
    with zipfile.ZipFile(out_path, "a", zipfile.ZIP_STORED) as zf:
        existing = set(zf.namelist())
        for rec in db:
            if args.limit >= 0 and n >= args.limit:
                break
            member = os.path.join("images", rec["image"])
            if member in existing:
                continue
            cam = rec["camera"]
            K = np.array([
                [float(cam["fx"]), 0, float(cam["cx"])],
                [0, float(cam["fy"]), float(cam["cy"])],
                [0, 0, 1.0],
            ])
            kk = np.asarray(cam["k"], dtype=np.float64).reshape(-1)
            pp = np.asarray(cam["p"], dtype=np.float64).reshape(-1)
            dist = np.array([kk[0], kk[1], pp[0], pp[1], kk[2]])
            src = cv2.imread(os.path.join(args.root, rec["source"], "images", rec["image"]))
            if src is None:
                continue
            src = src[:1000]
            key = (rec["source"], rec.get("camera_id", 0))
            if key not in maps_cache:
                maps_cache[key] = camera_maps(K, dist, (src.shape[1], src.shape[0]))
            mx, my = maps_cache[key]
            und = native.remap(src.astype(np.float32), mx, my)
            ok, buf = cv2.imencode(".jpg", und.astype(np.uint8),
                                   [cv2.IMWRITE_JPEG_QUALITY, 95])
            assert ok
            zf.writestr(member, buf.tobytes())
            n += 1
    print(f"wrote {n} undistorted images to {out_path}")


if __name__ == "__main__":
    main()
