"""Synthetic multi-view pose dataset (numpy, deterministic).

Stands in for MultiViewH36M (reference data/datasets/multiview_h36m.py) in
tests and benchmarks: a fixed ring of pinhole cameras observes randomized
skeletons; images are Gaussian joint splats with per-joint colors, so a
keypoint network can actually learn localization end-to-end.  Items follow
the reference's __getitem__ contract (joints_dataset.py:403-427 +
multiview_h36m.py:120-157): per-view dicts with img / heatmap / visibility /
KRT / K / RT / points-2d / points-3d / camera, plus the TOPK-nearest other
view attached for epipolar fusion, and all-view stacks at test time.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ...config import Config
from ...geometry.camera import neighbor_cameras
from ...ops.heatmap import make_heatmap_grid


def make_camera_ring(
    n_views: int = 4,
    radius: float = 4000.0,
    target=(0.0, 0.0, 1000.0),
    focal: float = 1000.0,
    image_size=(256, 256),
):
    """Ring of cameras looking at `target` (world mm). Returns K/R/T/RT/KRT."""
    H, W = image_size
    Ks, Rs, Ts = [], [], []
    target = np.asarray(target, dtype=np.float64)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views + 0.3
        center = np.array([radius * np.cos(ang), radius * np.sin(ang), 1200.0 + 100.0 * i])
        z = target - center
        z /= np.linalg.norm(z)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        K = np.array([[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]])
        Ks.append(K)
        Rs.append(R)
        Ts.append(center)
    Ks, Rs, Ts = map(np.array, (Ks, Rs, Ts))
    RTs = np.concatenate([Rs, -Rs @ Ts[..., None]], axis=-1)
    KRTs = Ks @ RTs
    return {"K": Ks, "R": Rs, "T": Ts, "RT": RTs, "KRT": KRTs, "image_size": image_size}


class SyntheticMultiview:
    """Deterministic synthetic rig; one item == one skeleton instant.

    Train items return (ref view + nearest other view); test items return all
    V views stacked with each view's nearest other view, mirroring
    multiview_h36m.py:226-252.
    """

    def __init__(self, cfg: Config, is_train: bool, n_samples: int = 256, seed: int = 0):
        self.cfg = cfg
        self.is_train = is_train
        self.n_samples = n_samples
        self.seed = seed
        H, W = cfg.DATASETS.IMAGE_SIZE
        self.image_size = (int(H), int(W))
        self.num_joints = cfg.KEYPOINT.NUM_PTS
        # focal scaled to the image so skeletons (lateral extent <~400mm at
        # 4000mm range) always project in-frame
        focal = 4.0 * min(self.image_size)
        self.rig = make_camera_ring(image_size=self.image_size, focal=focal)
        self.n_views = len(self.rig["KRT"])
        rank = neighbor_cameras({i: self.rig["KRT"][i] for i in range(self.n_views)})
        self.nearest = {cam: rank[cam][0][0] for cam in rank}
        hm_h, hm_w = cfg.KEYPOINT.HEATMAP_SIZE
        self.hm_size = (int(hm_h), int(hm_w))
        self.downsample = cfg.BACKBONE.DOWNSAMPLE
        self.sigma = cfg.KEYPOINT.SIGMA
        # precompute heatmap grid (image coords / sigma')
        self._hm_grid = make_heatmap_grid(self.hm_size, self.downsample, self.sigma)
        # image-splat grid at full res, sigma 6
        self._img_grid = make_heatmap_grid(self.image_size, 1, 3.0)
        # maximally distinct per-joint colors (evenly spaced hues) so joint
        # identity is unambiguous — random colors collide and cap JDR
        hues = np.linspace(0.0, 1.0, self.num_joints, endpoint=False)
        self._joint_colors = np.stack(
            [self._hsv_to_rgb(h, 0.9, 1.0) for h in hues]
        ).astype(np.float32)

    @staticmethod
    def _hsv_to_rgb(h, s, v):
        i = int(h * 6) % 6
        f = h * 6 - int(h * 6)
        p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
        return [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][i]

    def __len__(self):
        return self.n_samples

    # ------------------------------------------------------------ helpers
    def _skeleton(self, idx: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        center = np.array([0.0, 0.0, 1000.0]) + rng.uniform(-80, 80, 3)
        offsets = rng.uniform(-200.0, 200.0, (self.num_joints, 3))
        return center[None] + offsets

    def _project(self, view: int, X: np.ndarray) -> np.ndarray:
        P = self.rig["KRT"][view]
        Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        x = (P @ Xh.T).T
        return x[:, :2] / x[:, 2:]

    def _gauss_maps(self, grid, sigma, coords_xy, clip=4.60517019):
        """(J, h, w) Gaussian maps on a precomputed grid (keypoints2d.py:28-31).

        `grid` is (2, h, w) of (y, x) image coords already divided by
        sigma*sqrt(2); `sigma` is the matching raw sigma.
        """
        yx = coords_xy[:, ::-1]  # grid rows are (y, x)
        d = yx[:, :, None, None] / (sigma * np.sqrt(2)) - grid[None]
        dist = np.einsum("jchw,jchw->jhw", d, d)
        return np.exp(-np.clip(dist, 0, clip)).astype(np.float32)

    def _render_image(self, pts2d: np.ndarray) -> np.ndarray:
        maps = self._gauss_maps(self._img_grid, 3.0, pts2d)  # (J, H, W)
        img = np.einsum("jhw,jc->hwc", maps, self._joint_colors).astype(np.float32)
        return np.clip(img, 0.0, 1.0)

    def _view_dict(self, view: int, X: np.ndarray) -> Dict[str, np.ndarray]:
        pts2d = self._project(view, X)
        heatmap = self._gauss_maps(self._hm_grid, self.sigma, pts2d)  # (J, h, w)
        return {
            "img": self._render_image(pts2d),
            "heatmap": heatmap.transpose(1, 2, 0),  # (h, w, J) NHWC
            "visibility": np.ones(self.num_joints, dtype=np.float32),
            "KRT": self.rig["KRT"][view].astype(np.float32),
            "K": self.rig["K"][view].astype(np.float32),
            "RT": self.rig["RT"][view].astype(np.float32),
            "points-2d": pts2d.astype(np.float32),
            "camera": np.int32(view),
        }

    # ------------------------------------------------------------ items
    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        X = self._skeleton(idx)
        if self.is_train:
            # global RNG on purpose: a fresh ref view each epoch (the
            # reference also re-draws per visit, multiview_h36m.py:140-143);
            # idx-seeded choice would train each skeleton from ONE view only
            ref = int(np.random.randint(self.n_views))
            other = self.nearest[ref]
            item = self._view_dict(ref, X)
            other_item = self._view_dict(other, X)
            item.update(
                {
                    "other_img": other_item["img"],
                    "other_KRT": other_item["KRT"],
                    "other_heatmap": other_item["heatmap"],
                    "other_camera": np.int32(other),
                    "points-3d": X.astype(np.float32),
                    "action": np.int32(0),
                }
            )
            return item
        # test: stack all views + each view's nearest other (multiview_h36m.py:226-252)
        views = [self._view_dict(v, X) for v in range(self.n_views)]
        others = [self._view_dict(self.nearest[v], X) for v in range(self.n_views)]
        item = {k: np.stack([v[k] for v in views]) for k in views[0]}
        item["other_img"] = np.stack([o["img"] for o in others])
        item["other_KRT"] = np.stack([o["KRT"] for o in others])
        item["other_camera"] = np.stack([o["camera"] for o in others])
        item["points-3d"] = X.astype(np.float32)
        item["action"] = np.int32(0)
        return item
