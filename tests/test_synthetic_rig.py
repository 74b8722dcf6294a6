"""Synthetic rig: fast windowed rendering parity + scale/rot augmentation.

The flagship-shape validation runs (256px, 17 joints) need the window-splat
renderer (the full-grid einsum starves the chip) and train-time scale/rot
augmentation composed into KRT exactly as the reference does
(joints_dataset.py:309-314,334-337).  These tests pin:
  * windowed Gaussian maps == full-grid maps, bit-for-bit in float32;
  * windowed color splat == full einsum render to float tolerance;
  * augmented KRT still projects the true 3D joints onto `points-2d`;
  * heatmap peaks track the augmented 2D joints;
  * flagship val skeletons are disjoint from train (held-out seed).
"""

import numpy as np
import pytest

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.datasets.synthetic import SyntheticMultiview
from epipolar_transformers_tpu.data.pipeline import build_dataset


def _cfg(overrides=None):
    base = {
        "DATASETS": {
            "TRAIN": ("synthetic_multiview_train",),
            "TEST": ("synthetic_multiview_val",),
            "TASK": "multiview_keypoint",
            "IMAGE_SIZE": (64, 64),
        },
        "BACKBONE": {"DOWNSAMPLE": 4},
        "KEYPOINT": {"NUM_PTS": 7, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0},
    }
    if overrides:
        for k, v in overrides.items():
            base.setdefault(k, {}).update(v)
    return update_from_dict(Config(), base)


def test_windowed_gauss_maps_match_full_grid():
    ds = SyntheticMultiview(_cfg(), is_train=False, n_samples=4)
    rng = np.random.RandomState(3)
    # in-frame, near-edge, and out-of-frame joints
    coords = np.concatenate(
        [
            rng.uniform(0, 64, (5, 2)),
            np.array([[0.3, 0.2], [63.7, 63.9], [-30.0, 10.0], [100.0, 70.0]]),
        ]
    )
    full = ds._gauss_maps(ds._hm_grid, ds.sigma, coords)
    fast = ds._gauss_maps_fast(ds._hm_grid, ds.sigma, coords, ds.downsample)
    np.testing.assert_array_equal(full, fast)
    # image-resolution grid too (downsample 1, sigma 3)
    full_img = ds._gauss_maps(ds._img_grid, 3.0, coords)
    fast_img = ds._gauss_maps_fast(ds._img_grid, 3.0, coords, 1)
    np.testing.assert_array_equal(full_img, fast_img)


def test_windowed_render_matches_einsum():
    ds = SyntheticMultiview(_cfg(), is_train=False, n_samples=4)
    rng = np.random.RandomState(5)
    pts2d = rng.uniform(-5, 69, (ds.num_joints, 2))
    maps = ds._gauss_maps(ds._img_grid, 3.0, pts2d)
    ref = np.clip(
        np.einsum("jhw,jc->hwc", maps, ds._joint_colors), 0.0, 1.0
    ).astype(np.float32)
    fast = ds._render_image(pts2d)
    np.testing.assert_allclose(fast, ref, atol=1e-5)


@pytest.mark.parametrize("aug", [False, True])
def test_aug_krt_projects_points2d(aug):
    over = {"DATASETS": {"SCALE_FACTOR": 0.25, "ROT_FACTOR": 30.0}} if aug else None
    ds = SyntheticMultiview(_cfg(over), is_train=True, n_samples=8)
    assert ds.augment == aug
    np.random.seed(11)
    item = ds[2]
    X = item["points-3d"].astype(np.float64)
    Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    x = (item["KRT"].astype(np.float64) @ Xh.T).T
    proj = x[:, :2] / x[:, 2:]
    np.testing.assert_allclose(proj, item["points-2d"], atol=1e-3)
    # other view's KRT must be consistent with the same world points
    oxh = (item["other_KRT"].astype(np.float64) @ Xh.T).T
    oproj = oxh[:, :2] / oxh[:, 2:]
    H, W = ds.image_size
    # most other-view joints remain in frame under the rig's aug ranges
    inside = ((oproj[:, 0] >= 0) & (oproj[:, 0] < W)).mean()
    assert inside > 0.5


def test_aug_heatmap_peaks_track_augmented_joints():
    over = {"DATASETS": {"SCALE_FACTOR": 0.25, "ROT_FACTOR": 30.0}}
    ds = SyntheticMultiview(_cfg(over), is_train=True, n_samples=8)
    np.random.seed(7)
    item = ds[1]
    hm = item["heatmap"]  # (h, w, J)
    pts = item["points-2d"]
    vis = item["visibility"]
    hs = ds.downsample
    for j in range(ds.num_joints):
        if vis[j] == 0:
            assert hm[:, :, j].max() == 0.0
            continue
        iy, ix = np.unravel_index(np.argmax(hm[:, :, j]), hm.shape[:2])
        # peak pixel center in image coords: idx*ds + ds/2 - 0.5
        px = ix * hs + hs / 2.0 - 0.5
        py = iy * hs + hs / 2.0 - 0.5
        assert abs(px - pts[j, 0]) <= hs and abs(py - pts[j, 1]) <= hs


def test_aug_draw_matches_reference_distribution():
    over = {"DATASETS": {"SCALE_FACTOR": 0.25, "ROT_FACTOR": 30.0}}
    ds = SyntheticMultiview(_cfg(over), is_train=True, n_samples=4)
    np.random.seed(0)
    scales, rots = zip(*(ds._draw_aug() for _ in range(4000)))
    scales, rots = np.array(scales), np.array(rots)
    assert scales.min() >= 0.75 and scales.max() <= 1.25
    assert rots.min() >= -60.0 and rots.max() <= 60.0
    # rotation suppressed with probability 0.4 (reference joints_dataset.py:313)
    frac_zero = (rots == 0.0).mean()
    assert 0.3 < frac_zero < 0.5


def test_flagship_val_skeletons_are_held_out():
    cfg = update_from_dict(Config(), {
            "DATASETS": {
                "TRAIN": ("synthetic_flagship_train",),
                "TEST": ("synthetic_flagship_val",),
                "TASK": "multiview_keypoint",
                "IMAGE_SIZE": (64, 64),
            },
            "KEYPOINT": {"NUM_PTS": 5, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0},
        }
    )
    train = build_dataset(cfg, "synthetic_flagship_train")
    val = build_dataset(cfg, "synthetic_flagship_val")
    assert len(train) == 512 and len(val) == 64
    # same idx, different seed -> different skeletons
    assert not np.allclose(train._skeleton(0), val._skeleton(0))


def test_no_aug_path_unchanged_from_round2():
    """Without SCALE/ROT factors the item contract (and geometry) is exactly
    the round-2 rig: identity K/KRT from the ring, all-visible joints."""
    ds = SyntheticMultiview(_cfg(), is_train=True, n_samples=4)
    np.random.seed(1)
    item = ds[0]
    assert item["visibility"].min() == 1.0
    ring_krts = [ds.rig["KRT"][v].astype(np.float32) for v in range(ds.n_views)]
    assert any(np.array_equal(item["KRT"], k) for k in ring_krts)
