"""Tester modes: SAVE_PRED dumps, triangulation variants, TRAIN_BN /
RECOMPUTE_BN, host RANSAC/epipolar triangulation."""

import os
import pickle

import numpy as np
import pytest
import jax

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.pipeline import make_data_loader
from epipolar_transformers_tpu.engine import create_train_state
from epipolar_transformers_tpu.engine.tester import test as run_eval
from epipolar_transformers_tpu.engine.trainer import select_model_inputs
from epipolar_transformers_tpu.geometry.host import (
    triangulate_epipolar_np,
    triangulate_ransac_np,
)
from tests.conftest import make_camera_ring


def _cfg(**overrides):
    d = {
        "DATASETS": {"TRAIN": ("synthetic_multiview_train",),
                     "TEST": ("synthetic_multiview_val",),
                     "TASK": "multiview_keypoint", "IMAGE_SIZE": (64, 64),
                     "IMAGE_RESIZE": 1.0, "PREDICT_RESIZE": 1.0},
        "BACKBONE": {"ENABLED": True, "BODY": "epipolarposeR-18", "DOWNSAMPLE": 4,
                     "PRETRAINED": False},
        "KEYPOINT": {"ENABLED": True, "NUM_PTS": 5, "HEATMAP_SIZE": (16, 16),
                     "SIGMA": 2.0, "NFEATS": 256, "LOSS": "joint",
                     "LOSS_PER_JOINT": False, "TRIANGULATION": "pymvg"},
        "EPIPOLAR": {"SAMPLESIZE": 8, "MERGE": "late", "ATTENTION": "avg",
                     "SIMILARITY": "dot", "PARAMETERIZED": ("z",),
                     "ZRESIDUAL": True, "SHARE_WEIGHTS": True,
                     "USE_CORRECT_NORMALIZE": True, "PRETRAINED": False},
        "SOLVER": {"OPTIMIZER": "adam", "IMS_PER_BATCH": 2},
        "TEST": {"IMS_PER_BATCH": 1, "THRESHOLDS": (1, 2, 5, 10, 20)},
    }
    cfg = update_from_dict(Config(), d)
    return update_from_dict(cfg, overrides) if overrides else cfg


def _state(cfg):
    loader = make_data_loader(cfg, is_train=True)
    inputs = select_model_inputs(cfg, next(iter(loader)))
    return create_train_state(cfg, jax.random.PRNGKey(0), inputs)


def _project(KRTs, X):
    Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    x = np.einsum("vij,nj->vni", KRTs, Xh)
    return x[..., :2] / x[..., 2:]


# ------------------------------------------------------------ host triang.
def test_host_ransac_and_refine():
    ring = make_camera_ring()
    rng = np.random.RandomState(0)
    X = rng.randn(6, 3) * 200 + [0, 0, 1000]
    pts = _project(ring["KRT"], X)
    pts[2] += 50.0  # outlier view
    confs = np.ones((4, 6))
    out = triangulate_ransac_np(pts, ring["KRT"], confs, 0.05, 3.0)
    assert np.linalg.norm(out - X, axis=-1).max() < 5.0
    out_r = triangulate_ransac_np(pts, ring["KRT"], confs, 0.05, 3.0, refine=True)
    assert np.linalg.norm(out_r - X, axis=-1).max() < 5.0
    # too few confident views -> zeros
    confs2 = np.zeros((4, 6))
    confs2[0] = 1.0
    out0 = triangulate_ransac_np(pts, ring["KRT"], confs2)
    np.testing.assert_allclose(out0, 0.0)


def test_host_epipolar_triangulation_single_view_fallback():
    """With 1 confident view, the corr_pos map supplies the second ray."""
    ring = make_camera_ring(image_size=(64, 64), focal=256.0)
    X = np.array([[30.0, -20.0, 1010.0]])
    pts = _project(ring["KRT"], X)  # (4, 1, 2)
    other_order = [1, 0, 3, 2]
    other_KRTs = ring["KRT"][other_order]
    other_pts = _project(other_KRTs, X)  # projection into each view's pair
    # corr_pos in feature pixels (stride 4): corr_pos[v][y, x] = match of
    # feature pixel (x, y); fill the whole map with the correct match
    corr = np.zeros((4, 16, 16, 2))
    for v in range(4):
        corr[v, :, :] = (other_pts[v, 0] + 0.5 - 2.0) / 4.0  # coord2pix
    confs = np.zeros((4, 1))
    confs[2] = 0.9  # only view 2 confident
    out = triangulate_epipolar_np(
        pts, ring["KRT"], ring["K"], ring["RT"], confs, corr, other_KRTs,
        conf_thres=0.5, resize=1.0, downsample=4,
    )
    assert np.linalg.norm(out[0] - X[0]) < 2.0, out


def test_host_epipolar_dlt_mode():
    ring = make_camera_ring()
    rng = np.random.RandomState(1)
    X = rng.randn(5, 3) * 150 + [0, 0, 1000]
    pts = _project(ring["KRT"], X)
    confs = np.ones((4, 5))
    corr = np.zeros((4, 16, 16, 2))
    out = triangulate_epipolar_np(
        pts, ring["KRT"], ring["K"], ring["RT"], confs, corr, ring["KRT"],
        dlt=True,
    )
    assert np.linalg.norm(out - X, axis=-1).max() < 1.0


# ------------------------------------------------------------ tester modes
@pytest.mark.parametrize("mode", ["naive", "refine", "epipolar_dlt"])
def test_eval_triangulation_modes(mode):
    cfg = _cfg(KEYPOINT={"TRIANGULATION": mode})
    state = _state(cfg)
    results = run_eval(cfg, state, max_batches=1)
    assert "EPEmean_global" in results
    assert np.isfinite(results["EPEmean_global"])


def test_eval_save_pred(tmp_path):
    cfg = _cfg(VIS={"SAVE_PRED": True, "SAVE_PRED_FREQ": 1},
               OUTPUT_DIR=str(tmp_path))
    state = _state(cfg)
    run_eval(cfg, state, max_batches=2)
    path = os.path.join(str(tmp_path), "predictions.pkl")
    assert os.path.exists(path)
    with open(path, "rb") as f:
        preds = pickle.load(f)
    assert len(preds) == 2
    assert preds[0]["batch_locs"].shape == (4, 5, 2)
    assert os.path.exists(os.path.join(str(tmp_path), "pck.pkl"))


def test_eval_train_bn_and_recompute_bn():
    cfg = _cfg(TEST={"IMS_PER_BATCH": 1, "TRAIN_BN": True,
                     "THRESHOLDS": (5, 10, 20)})
    state = _state(cfg)
    results = run_eval(cfg, state, max_batches=1)
    assert np.isfinite(results["EPEmean_global"])

    cfg2 = _cfg(TEST={"IMS_PER_BATCH": 1, "RECOMPUTE_BN": True,
                      "THRESHOLDS": (5, 10, 20)})
    results2 = run_eval(cfg2, state, max_batches=1)
    assert np.isfinite(results2["EPEmean_global"])
