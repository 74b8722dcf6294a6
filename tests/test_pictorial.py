"""RPSM: recovers GT 3D pose from GT heatmaps on the synthetic rig."""

import numpy as np
import pytest

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.datasets.synthetic import SyntheticMultiview
from epipolar_transformers_tpu.geometry.body import HumanBody, compute_limb_length
from epipolar_transformers_tpu.geometry.pictorial import (
    compute_grid,
    compute_pairwise,
    infer,
    rpsm,
)


def _cfg():
    d = {
        "DATASETS": {"IMAGE_SIZE": (64, 64), "IMAGE_RESIZE": 1.0, "PREDICT_RESIZE": 1.0},
        "BACKBONE": {"DOWNSAMPLE": 4},
        "KEYPOINT": {"NUM_PTS": 17, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0},
    }
    return update_from_dict(Config(), d)


def test_compute_grid():
    g = compute_grid(2000.0, np.array([10.0, 20.0, 30.0]), 4)
    assert g.shape == (64, 3)
    np.testing.assert_allclose(g.mean(0), [10, 20, 30], atol=1e-9)
    assert g[:, 0].min() == 10 - 1000 and g[:, 0].max() == 10 + 1000


def test_infer_prefers_limb_consistent_bins():
    body = HumanBody()
    nb = 8
    rng = np.random.RandomState(0)
    unary = rng.rand(17, nb).astype(np.float32) * 0.1
    # make bin 3 clearly best for every joint, and allow all transitions
    unary[:, 3] = 1.0
    pairwise = {}
    for node in body.skeleton:
        for child in node["children"]:
            pairwise[(node["idx"], child)] = np.ones((nb, nb), np.float32)
    pose = infer(unary, pairwise, body)
    assert [b for _, b in pose] == [3] * 17


@pytest.mark.slow
def test_rpsm_recovers_gt_pose():
    cfg = _cfg()
    ds = SyntheticMultiview(cfg, is_train=False, n_samples=2)
    item = ds[0]
    V = item["img"].shape[0]
    heatmaps = item["heatmap"].transpose(0, 3, 1, 2)  # (V, J, h, w)
    gt = item["points-3d"]
    body = HumanBody()
    limb = compute_limb_length(body, gt)
    H, W = cfg.DATASETS.IMAGE_SIZE
    boxes = [
        {"center": np.array([W / 2.0, H / 2.0]), "scale": np.array([W / 200.0, H / 200.0])}
        for _ in range(V)
    ]
    cams = item["K"] @ item["RT"]
    pose = rpsm(
        cams, heatmaps, center=gt[0], boxes=boxes, body=body, limb_length=limb,
        img_size=(W, H), grid_size=2000.0, first_nbins=16, recur_nbins=2,
        recur_depth=6, tolerance=150.0,
    )
    err = np.linalg.norm(pose - gt, axis=-1)
    # RPSM is bounded by bin resolution + heatmap stride; expect decent recovery
    assert err.mean() < 60.0, err
