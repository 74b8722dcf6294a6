"""H36M-style per-view item construction (host, numpy+cv2).

Equivalent of reference data/datasets/joints_dataset.py:29-429: load/undistort
the image, compose the crop: KRT = (trans . K) . [R | -R T], update joint
visibility after the affine crop, and render Gaussian target heatmaps.
Returns numpy dicts in NHWC/channels-last layout (the trainer's collate
stacks them).

The 20-joint union <-> 17-joint actual mapping (MPII-compatible heads,
joints_dataset.py:53-158) and the S9 damaged-sequence filter
(joints_dataset.py:174-184) are preserved.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from ...config import Config
from ...ops.heatmap import make_heatmap_grid
from ..transforms.affine import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    affine_transform,
    get_affine_transform,
)

UNION_JOINTS = {
    0: "root", 1: "rhip", 2: "rkne", 3: "rank", 4: "lhip", 5: "lkne",
    6: "lank", 7: "belly", 8: "thorax", 9: "neck", 10: "upper neck",
    11: "nose", 12: "head", 13: "head top", 14: "lsho", 15: "lelb",
    16: "lwri", 17: "rsho", 18: "relb", 19: "rwri",
}

# indices of the 17 actual joints inside the 20-joint union
# (reference modeling/model.py:269)
ACTUAL_IN_UNION = np.array([0, 1, 2, 3, 4, 5, 6, 7, 9, 11, 12, 14, 15, 16, 17, 18, 19])


def undistort_points(pts: np.ndarray, K: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """cv2.undistortPoints(..., P=K) equivalent."""
    import cv2

    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 1, 2)
    return cv2.undistortPoints(pts, K, dist, P=K).reshape(-1, 2)


class JointsDataset:
    """Base class; subclasses fill self.db with H36M-style records."""

    # real-image pipeline (cv2 decode + undistort per item): eligible for
    # DATALOADER.NUM_WORKERS process workers (data/pipeline.py)
    io_bound = True

    actual_joints: dict = {}

    def __init__(self, cfg: Config, root: str, is_train: bool):
        self.cfg = cfg
        self.root = root
        self.is_train = is_train
        self.db: list = []
        self.num_joints = cfg.KEYPOINT.NUM_PTS
        self.image_size = cfg.DATASETS.IMAGE_SIZE  # (W, H) per reference usage
        self.heatmap_size = cfg.KEYPOINT.HEATMAP_SIZE
        self.sigma = cfg.KEYPOINT.SIGMA
        self.data_format = cfg.DATASETS.DATA_FORMAT
        self.scale_factor = cfg.DATASETS.SCALE_FACTOR
        self.rotation_factor = cfg.DATASETS.ROT_FACTOR
        self.u2a_mapping: dict = {}
        self._hm_grid = make_heatmap_grid(
            tuple(self.heatmap_size), cfg.BACKBONE.DOWNSAMPLE, self.sigma
        )

    # -------------------------------------------------- joint mapping
    def get_mapping(self):
        union_values = list(UNION_JOINTS.values())
        mapping = {k: "*" for k in UNION_JOINTS}
        for k, v in self.actual_joints.items():
            mapping[union_values.index(v)] = k
        return mapping

    def do_mapping(self):
        for item in self.db:
            joints = item["joints_2d"]
            joints_vis = item["joints_vis"]
            n = len(self.u2a_mapping)
            ju = np.zeros((n, 2))
            jv = np.zeros((n, 3))
            for i in range(n):
                if self.u2a_mapping[i] != "*":
                    idx = int(self.u2a_mapping[i])
                    ju[i] = joints[idx]
                    jv[i] = joints_vis[idx]
            item["joints_2d"] = ju
            item["joints_vis"] = jv

    # -------------------------------------------------- filters
    @staticmethod
    def isdamaged(db_rec) -> bool:
        """S9 'Greeting-2' / 'SittingDown-2' / 'Waiting-1' damage filter
        (reference joints_dataset.py:174-184)."""
        if db_rec["subject"] != 9:
            return False
        if db_rec["action"] == 5 and db_rec["subaction"] == 2:
            return True
        if db_rec["action"] == 10 and db_rec["subaction"] == 2:
            return True
        if db_rec["action"] == 13 and db_rec["subaction"] == 1:
            return True
        return False

    @staticmethod
    def get_key_str(datum) -> str:
        return "s_{:02}_act_{:02}_subact_{:02}_imgid_{:06}".format(
            datum["subject"], datum["action"], datum["subaction"], datum["image_id"]
        )

    def __len__(self):
        return len(self.db)

    # -------------------------------------------------- image IO
    def _read_image(self, db_rec) -> np.ndarray:
        import cv2

        if self.data_format == "undistoredzip":
            image_dir = "undistoredimages.zip@"
        elif self.data_format == "zip":
            image_dir = "images.zip@"
        else:
            image_dir = ""
        path = osp.join(self.root, db_rec["source"], image_dir, "images", db_rec["image"])
        if "zip" in self.data_format:
            from ...utils import zipreader

            img = zipreader.imread(path)
        else:
            img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        img = img[:1000]  # crop 1002x1000 -> 1000x1000 (joints_dataset.py:218)
        return img

    def _gauss_heatmaps(self, joints_xy: np.ndarray) -> np.ndarray:
        """(J, h, w) Gaussian targets on the precomputed grid."""
        sig = self.sigma * np.sqrt(2)
        yx = joints_xy[:, 1::-1] / sig
        d = yx[:, :, None, None] - self._hm_grid[None]
        dist = np.einsum("jchw,jchw->jhw", d, d)
        return np.exp(-np.clip(dist, 0, 4.60517019)).astype(np.float32)

    # -------------------------------------------------- item
    def __getitem__(self, idx: int):
        import cv2

        cfg = self.cfg
        db_rec = self.db[idx]
        needs_image = cfg.DATASETS.TASK not in ("lifting", "lifting_direct", "lifting_rot")

        # DATALOADER.BENCHMARK: per-stage loader timing (reference
        # joints_dataset.py:187,280-281 prints tic/toc; here stages
        # accumulate into profiling.DATALOADER_STAGES)
        if cfg.DATALOADER.BENCHMARK:
            import time as _time

            from ...utils.profiling import DATALOADER_STAGES as _stages

            _t = [_time.perf_counter()]

            def _mark(stage):
                now = _time.perf_counter()
                _stages.add(stage, now - _t[0])
                _t[0] = now
        else:
            def _mark(stage):
                return None

        joints = db_rec["joints_2d"].copy()
        joints_3d = db_rec["joints_3d"].copy()
        joints_3d_camera = db_rec["joints_3d_camera"].copy()
        joints_vis = db_rec["joints_vis"].copy()
        center = np.array(db_rec["center"], dtype=np.float64).copy()
        scale = np.array(db_rec["scale"], dtype=np.float64).copy()

        normed = joints_3d_camera - joints_3d_camera[0]
        keypoint_scale = np.linalg.norm(normed[8] - normed[0])
        # guard degenerate records (MPII has no real 3D; scale would be 0)
        normed = normed / max(keypoint_scale, 1e-8)

        camera = db_rec["camera"]
        R = np.asarray(camera["R"], dtype=np.float64)
        T = np.asarray(camera["T"], dtype=np.float64).reshape(3, 1)
        K = np.array(
            [
                [float(camera["fx"]), 0, float(camera["cx"])],
                [0, float(camera["fy"]), float(camera["cy"])],
                [0, 0, 1.0],
            ]
        )
        kk = np.asarray(camera["k"], dtype=np.float64).reshape(-1)
        pp = np.asarray(camera["p"], dtype=np.float64).reshape(-1)
        dist = np.array([kk[0], kk[1], pp[0], pp[1], kk[2]])
        world3d = (R.T @ joints_3d_camera.T + T).T
        Rt = np.concatenate([R, (-R @ T)], axis=1)

        img = None
        if needs_image:
            _mark("setup")
            img = self._read_image(db_rec)
            _mark("read")
            if self.data_format != "undistoredzip":
                img = cv2.undistort(img, K, dist)
            _mark("undistort")

        joints = undistort_points(joints[:, :2], K, dist)
        center = undistort_points(center[None], K, dist)[0]

        rotation = 0
        if self.is_train:
            sf, rf = self.scale_factor, self.rotation_factor
            scale = scale * np.clip(np.random.randn() * sf + 1, 1 - sf, 1 + sf)
            rotation = (
                np.clip(np.random.randn() * rf, -rf * 2, rf * 2)
                if np.random.random() <= 0.6
                else 0
            )

        trans = get_affine_transform(center, scale, rotation, self.image_size)
        cropK = np.concatenate([trans, [[0.0, 0.0, 1.0]]], axis=0) @ K
        KRT = cropK @ Rt

        if needs_image:
            # native OpenMP warp (runtime/warp.cpp), cv2-parity tested
            from ...runtime import loader as native

            img = native.warp_affine(
                img.astype(np.float32), trans,
                (int(self.image_size[0]), int(self.image_size[1])),
            )
            _mark("warp")

        for i in range(self.num_joints):
            if joints_vis[i, 0] > 0.0:
                joints[i, :2] = affine_transform(joints[i, :2], trans)
                if (
                    np.min(joints[i, :2]) < 0
                    or joints[i, 0] >= self.image_size[0]
                    or joints[i, 1] >= self.image_size[1]
                ):
                    joints_vis[i, :] = 0

        from ...runtime import loader as native

        target = native.render_heatmaps(
            joints, tuple(self.heatmap_size), self.sigma, cfg.BACKBONE.DOWNSAMPLE
        )
        _mark("heatmap")

        ret = {
            "heatmap": target.transpose(1, 2, 0),  # (h, w, J) NHWC
            "visibility": joints_vis[:, 0].astype(np.float32),
            "KRT": KRT.astype(np.float32),
            "points-2d": joints.astype(np.float32),
            "points-3d": world3d,
            "camera-points-3d": joints_3d_camera,
            "normed-points-3d": normed.astype(np.float32),
            "scale": np.float32(keypoint_scale),
            "action": np.int32(db_rec["action"]),
            "K": cropK.astype(np.float32),
            "RT": Rt.astype(np.float32),
        }
        if needs_image:
            # BGR -> normalized float RGB NHWC (torchvision-compatible)
            rgb = img[..., ::-1] / 255.0
            ret["img"] = ((rgb - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
        if cfg.KEYPOINT.TRIANGULATION == "rpsm" and not self.is_train:
            ret["origK"] = K.astype(np.float32)
            ret["crop_center"] = center.astype(np.float32)
            ret["crop_scale"] = np.asarray(scale, dtype=np.float32)
        return ret
