"""Generate an on-disk fake H36M dataset in the reference layout.

The licensed H36M images/annotations are not shipped, so the real-data IO
path (cv2 JPEG decode of 1000x1000 frames -> cv2.undistort -> affine crop ->
heatmap render, reference data/datasets/joints_dataset.py:186-429) can only
be integration-tested against a stand-in that has the *same on-disk shape*:

    <out>/h36m/annot/h36m_train.pkl            H36M-format db records
    <out>/h36m/annot/h36m_validation.pkl
    <out>/h36m/images/<seq_dir>/<frame>.jpg    1002x1000 BGR JPEGs
    <out>/h36m/images.zip                      same frames, zip@member syntax
    <out>/h36m/undistoredimages.zip            pre-undistorted variant
                                               (reference scripts/undistort_h36m.py
                                                + DATA_FORMAT 'undistoredzip')

Geometry is real: a ring of pinhole cameras with H36M-like radial+tangential
distortion observes randomized 17-joint skeletons; images are per-joint
colored Gaussian splats rendered at the *distorted* projections, so after
cv2.undistort the splats sit exactly at the pinhole projections and a
keypoint network can genuinely learn localization from the JPEGs.  Records
carry the exact key schema MultiViewH36M expects (camera R/T/f/c/k/p, 2D in
distorted pixels, camera-frame and world 3D, center/scale crop boxes).

Usage:
    python scripts/make_fake_h36m.py [--out datasets] [--train-groups 64]
        [--val-groups 16] [--image-size 1000] [--no-zips] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import sys
import zipfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from epipolar_transformers_tpu.data.datasets.synthetic import make_camera_ring  # noqa: E402
from epipolar_transformers_tpu.ops.synthetic_render import joint_colors  # noqa: E402

_CLIP = 4.60517019  # -ln(0.01)

# H36M-magnitude distortion (annot cameras carry k ~ [-0.2, 0.24, -0.002],
# p ~ 1e-3); nonzero so cv2.undistort / cv2.undistortPoints do real work.
DIST_K = np.array([-0.207, 0.244, -0.0021])
DIST_P = np.array([0.0014, -0.0007])


def distort_points(pts: np.ndarray, K: np.ndarray, k=DIST_K, p=DIST_P) -> np.ndarray:
    """OpenCV distortion model: pinhole pixels -> distorted pixels."""
    x = (pts[:, 0] - K[0, 2]) / K[0, 0]
    y = (pts[:, 1] - K[1, 2]) / K[1, 1]
    r2 = x * x + y * y
    radial = 1 + k[0] * r2 + k[1] * r2 ** 2 + k[2] * r2 ** 3
    xd = x * radial + 2 * p[0] * x * y + p[1] * (r2 + 2 * x * x)
    yd = y * radial + p[0] * (r2 + 2 * y * y) + 2 * p[1] * x * y
    return np.stack([xd * K[0, 0] + K[0, 2], yd * K[1, 1] + K[1, 2]], axis=1)


def render_frame(pts2d: np.ndarray, colors: np.ndarray, hw, sigma: float = 10.0,
                 rng: np.random.RandomState | None = None) -> np.ndarray:
    """Windowed colored-Gaussian splat render, uint8 BGR (H+2, W)."""
    H, W = hw
    img = np.zeros((H, W, 3), np.float32)
    # low-frequency background gradient so the JPEGs aren't degenerate
    gy = np.linspace(0.06, 0.16, H, dtype=np.float32)[:, None]
    gx = np.linspace(0.10, 0.04, W, dtype=np.float32)[None, :]
    img += (gy + gx)[..., None]
    sig = sigma * np.sqrt(2.0)
    rad = int(np.ceil(sig * np.sqrt(_CLIP))) + 2
    for j, (px, py) in enumerate(pts2d):
        y0 = min(max(int(py) - rad, 0), H)
        y1 = min(max(int(py) + rad + 1, 0), H)
        x0 = min(max(int(px) - rad, 0), W)
        x1 = min(max(int(px) + rad + 1, 0), W)
        if y0 >= y1 or x0 >= x1:
            continue
        yy = (np.arange(y0, y1, dtype=np.float32) - py) / sig
        xx = (np.arange(x0, x1, dtype=np.float32) - px) / sig
        dist = yy[:, None] ** 2 + xx[None, :] ** 2
        val = np.exp(-np.clip(dist, 0, _CLIP)) - np.float32(np.exp(-_CLIP))
        img[y0:y1, x0:x1] += val[..., None] * colors[j]
    np.clip(img, 0.0, 1.0, out=img)
    # RGB splat colors -> BGR file convention (the loader flips back)
    bgr = (img[..., ::-1] * 255).astype(np.uint8)
    # reference frames are 1002x1000; the loader crops img[:1000]
    pad = np.tile(bgr[-1:], (2, 1, 1))
    return np.concatenate([bgr, pad], axis=0)


def make_split(out_root: str, split: str, n_groups: int, image_size: int,
               seed: int, jpeg_quality: int, zips: bool) -> str:
    import cv2

    hw = (image_size, image_size)
    # focal/radius sized so skeletons occupy ~1/3 of the frame (H36M-like)
    rig = make_camera_ring(image_size=hw, focal=1.15 * image_size, radius=3000.0)
    colors = joint_colors(17)
    rng = np.random.RandomState(seed)
    img_root = osp.join(out_root, "h36m", "images")
    os.makedirs(osp.join(out_root, "h36m", "annot"), exist_ok=True)
    db = []
    jpegs = []  # (member, path) for zip assembly
    subject = 1 if split == "train" else 9
    for g in range(n_groups):
        action = 2 + g % 15  # cycle all INDEX_TO_ACTION names
        center = np.array([0.0, 0.0, 1000.0]) + rng.uniform(-150, 150, 3)
        X = center[None] + rng.uniform(-350.0, 350.0, (17, 3))
        for cam in range(4):
            R, Tc, K = rig["R"][cam], rig["T"][cam].reshape(3, 1), rig["K"][cam]
            cam3d = (R @ (X.T - Tc)).T
            proj = (K @ cam3d.T).T
            pin2d = proj[:, :2] / proj[:, 2:]
            dist2d = distort_points(pin2d, K)
            seq = f"s_{subject:02d}_act_{action:02d}_subact_01_ca_{cam + 1:02d}"
            name = osp.join(seq, f"{seq}_{g + 1:06d}.jpg")
            path = osp.join(img_root, name)
            os.makedirs(osp.dirname(path), exist_ok=True)
            frame = render_frame(dist2d, colors, hw, sigma=0.01 * image_size)
            cv2.imwrite(path, frame, [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
            jpegs.append((osp.join("images", name), path))
            bb_c = 0.5 * (dist2d.min(0) + dist2d.max(0))
            extent = (dist2d.max(0) - dist2d.min(0)).max()
            db.append({
                "subject": subject, "action": action, "subaction": 1,
                "image_id": g, "camera_id": cam, "source": "h36m",
                "image": name,
                "joints_2d": dist2d.astype(np.float64),
                "joints_3d": X.astype(np.float64),
                "joints_3d_camera": cam3d.astype(np.float64),
                "joints_vis": np.ones((17, 3)),
                "center": bb_c.astype(np.float64),
                "scale": np.full(2, 1.3 * extent / 200.0),
                "camera": {
                    "R": R, "T": rig["T"][cam].reshape(3, 1),
                    "fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2],
                    "k": DIST_K.reshape(3, 1), "p": DIST_P.reshape(2, 1),
                },
            })
    anno = osp.join(out_root, "h36m", "annot",
                    f"h36m_{'train' if split == 'train' else 'validation'}.pkl")
    with open(anno, "wb") as f:
        pickle.dump(db, f)

    if zips:
        # images.zip: raw distorted frames (DATA_FORMAT 'zip');
        # undistoredimages.zip: pre-undistorted (DATA_FORMAT 'undistoredzip',
        # the reference's fast path via scripts/undistort_h36m.py)
        dist_cv = np.array([DIST_K[0], DIST_K[1], DIST_P[0], DIST_P[1], DIST_K[2]])
        with zipfile.ZipFile(osp.join(out_root, "h36m", "images.zip"), "a") as zraw, \
                zipfile.ZipFile(osp.join(out_root, "h36m", "undistoredimages.zip"),
                                "a") as zund:
            for (member, path), rec in zip(jpegs, db):
                zraw.write(path, member)
                img = cv2.imread(path, cv2.IMREAD_COLOR)
                K = np.array([[rec["camera"]["fx"], 0, rec["camera"]["cx"]],
                              [0, rec["camera"]["fy"], rec["camera"]["cy"]],
                              [0, 0, 1.0]])
                # match the loader: crop [:H] first, then undistort; the
                # stored member is the already-cropped 1000x1000 frame
                und = cv2.undistort(img[:image_size], K, dist_cv)
                ok, buf = cv2.imencode(".jpg", und, [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
                assert ok
                zund.writestr(member, buf.tobytes())
    return anno


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="datasets")
    ap.add_argument("--train-groups", type=int, default=64)
    ap.add_argument("--val-groups", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jpeg-quality", type=int, default=92)
    ap.add_argument("--no-zips", action="store_true")
    args = ap.parse_args(argv)
    for split, n, seed in (("train", args.train_groups, args.seed),
                           ("validation", args.val_groups, args.seed + 7919)):
        anno = make_split(args.out, split, n, args.image_size, seed,
                          args.jpeg_quality, not args.no_zips)
        print(f"{split}: {n} groups ({4 * n} frames) -> {anno}")


if __name__ == "__main__":
    main()
