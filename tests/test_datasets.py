"""Data layer: H36M-format and RHD-format datasets driven end-to-end on
synthetic fixtures (tiny pickles + rendered images written to tmp dirs)."""

import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.datasets.multiview_h36m import H36MDataset, MultiViewH36M
from epipolar_transformers_tpu.data.datasets.rhd import RHDDataset
from epipolar_transformers_tpu.data.transforms.keypoints3d import (
    atan2,
    canonical_trafo,
    flip_hand,
    palm_coord,
)
from tests.conftest import make_camera_ring


# --------------------------------------------------------------- fixtures
def _h36m_cfg():
    d = {
        "DATASETS": {
            "TASK": "multiview_keypoint",
            "IMAGE_SIZE": (64, 64),
            "IMAGE_RESIZE": 1.0,
            "PREDICT_RESIZE": 1.0,
            "DATA_FORMAT": "jpg",
            "H36M": {"MAPPING": False, "FILTER_DAMAGE": True, "REAL3D": True,
                     "TRAIN_SAMPLE": 0, "TEST_SAMPLE": 0},
        },
        "BACKBONE": {"DOWNSAMPLE": 4},
        "KEYPOINT": {"NUM_PTS": 17, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0},
        "EPIPOLAR": {"TOPK": 1},
    }
    return update_from_dict(Config(), d)


def _make_h36m_fixture(tmp_path, n_groups=2):
    """Write a tiny H36M-format annot pickle + images."""
    rig = make_camera_ring(image_size=(1000, 1000), focal=1000.0)
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "h36m" / "images"  # root/<source>/images (reference layout)
    os.makedirs(img_dir, exist_ok=True)
    db = []
    for g in range(n_groups):
        X = np.array([0.0, 0.0, 1000.0]) + rng.uniform(-200, 200, (17, 3))
        for cam in range(4):
            R = rig["R"][cam]
            Tc = rig["T"][cam].reshape(3, 1)
            K = rig["K"][cam]
            cam3d = (R @ (X.T - Tc)).T
            proj = (K @ cam3d.T).T
            pts2d = proj[:, :2] / proj[:, 2:]
            img_name = f"g{g}_c{cam}.jpg"
            img = (rng.rand(1002, 1000, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(img_dir / img_name), img)
            db.append({
                "subject": 1, "action": 2, "subaction": 1, "image_id": g,
                "camera_id": cam, "source": "h36m", "image": img_name,
                "joints_2d": pts2d.astype(np.float64),
                "joints_3d": X.astype(np.float64),
                "joints_3d_camera": cam3d.astype(np.float64),
                "joints_vis": np.ones((17, 3)),
                "center": np.array([500.0, 500.0]),
                "scale": np.array([5.0, 5.0]),
                "camera": {
                    "R": R, "T": rig["T"][cam].reshape(3, 1),
                    "fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2],
                    "k": np.zeros((3, 1)), "p": np.zeros((2, 1)),
                },
            })
    anno = tmp_path / "annot.pkl"
    with open(anno, "wb") as f:
        pickle.dump(db, f)
    return str(tmp_path), str(anno)


def test_multiview_h36m_train_item(tmp_path):
    cfg = _h36m_cfg()
    root, anno = _make_h36m_fixture(tmp_path)
    ds = MultiViewH36M(cfg, root, anno, is_train=True)
    assert len(ds) == 2
    np.random.seed(0)
    item = ds[0]
    assert item["img"].shape == (64, 64, 3)
    assert item["other_img"].shape == (64, 64, 3)
    assert item["heatmap"].shape == (16, 16, 17)
    assert item["KRT"].shape == (3, 4)
    assert item["other_KRT"].shape == (3, 4)
    # KRT must project world points-3d to the cropped points-2d
    X = np.concatenate([item["points-3d"], np.ones((17, 1))], axis=1)
    proj = (item["KRT"].astype(np.float64) @ X.T).T
    proj = proj[:, :2] / proj[:, 2:]
    vis = item["visibility"] > 0
    err = np.linalg.norm(proj[vis] - item["points-2d"][vis], axis=-1)
    assert err.max() < 0.5, err.max()


def test_multiview_h36m_test_group(tmp_path):
    cfg = _h36m_cfg()
    root, anno = _make_h36m_fixture(tmp_path)
    ds = MultiViewH36M(cfg, root, anno, is_train=False)
    item = ds[0]
    assert item["img"].shape == (4, 64, 64, 3)
    assert item["other_img"].shape == (4, 64, 64, 3)
    assert item["KRT"].shape == (4, 3, 4)
    # REAL3D retriangulation replaces points-3d consistently across views
    assert item["points-3d"].shape == (4, 17, 3)
    np.testing.assert_allclose(item["points-3d"][0], item["points-3d"][1])


def test_h36m_single_view(tmp_path):
    cfg = _h36m_cfg().replace(DATASETS=_h36m_cfg().DATASETS.replace(TASK="keypoint"))
    root, anno = _make_h36m_fixture(tmp_path)
    ds = H36MDataset(cfg, root, anno, is_train=True)
    item = ds[0]
    assert item["img"].shape == (64, 64, 3)
    assert item["heatmap"].shape == (16, 16, 17)


# --------------------------------------------------------------- RHD
def _make_rhd_fixture(tmp_path, n=3):
    rng = np.random.RandomState(1)
    root = tmp_path / "RHD"
    sub = root / "training"
    for kind in ("color", "mask"):
        os.makedirs(sub / kind, exist_ok=True)
    anno = {}
    for i in range(n):
        img = (rng.rand(320, 320, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(sub / "color" / f"{i:05d}.png"), img)
        mask = np.zeros((320, 320), np.uint8)
        mask[100:200, 100:200] = 20  # right hand pixels
        cv2.imwrite(str(sub / "mask" / f"{i:05d}.png"), mask)
        uv = rng.rand(42, 2) * 300 + 10
        vis = np.ones((42, 1))
        xyz = rng.randn(42, 3) * 0.05 + np.array([0, 0, 0.5])
        anno[i] = {"uv_vis": np.concatenate([uv, vis], 1), "xyz": xyz,
                   "K": np.eye(3)}
    with open(sub / "anno_training.pickle", "wb") as f:
        pickle.dump(anno, f)
    return str(root)


def test_rhd_dataset(tmp_path):
    d = {
        "LIFTING": {"ENABLED": True, "CROP_SIZE": 128, "IMAGE_SIZE": 320},
        "KEYPOINT": {"NUM_PTS": 21, "HEATMAP_SIZE": (32, 32), "SIGMA": 4.0},
        "DATASETS": {"TASK": "lifting_direct"},
    }
    cfg = update_from_dict(Config(), d)
    root = _make_rhd_fixture(tmp_path)
    ds = RHDDataset(cfg, root, "training", is_train=False)
    assert len(ds) == 3
    item = ds[0]
    assert item["img"].shape == (128, 128, 3)
    assert item["heatmap"].shape == (32, 32, 21)
    assert item["can-points-3d"].shape == (21, 3)
    assert item["rotation"].shape == (3, 3)
    assert item["hand-side"] in (0, 1)
    # canonical @ rot reproduces the normalized coords
    rec = item["can-points-3d"] @ item["rotation"]
    np.testing.assert_allclose(rec, item["normed-points-3d"], atol=1e-4)


# --------------------------------------------------------------- kp3d math
def test_canonical_trafo_invariants(rng):
    coords = rng.randn(21, 3)
    coords -= coords[0]
    canonical, rot = canonical_trafo(coords)
    # canonical @ rot == input (reference defines rot as the inverse map)
    np.testing.assert_allclose(canonical @ rot, coords, atol=1e-10)
    # align node lands on the y axis (x ~ 0, z ~ 0)
    assert abs(canonical[12, 0]) < 1e-8
    assert abs(canonical[12, 2]) < 1e-8
    # rot node z ~ 0
    assert abs(canonical[20, 2]) < 1e-8


def test_atan2_matches_numpy():
    for y, x in [(1, 1), (1, -1), (-1, 1), (-1, -1), (0.5, 2.0), (-2.0, 0.3)]:
        assert abs(atan2(y, x) - np.arctan2(y, x)) < 1e-6


def test_palm_coord_and_flip(rng):
    pts = rng.randn(42, 3)
    p = palm_coord(pts)
    assert p.shape == (42, 3)
    np.testing.assert_allclose(p[0], 0.5 * (pts[0] + pts[12]))
    np.testing.assert_allclose(p[21], 0.5 * (pts[21] + pts[33]))
    f = flip_hand(p[:21])
    np.testing.assert_allclose(f[:, 2], -p[:21, 2])
