"""CLI visualization dispatch + tester frame dump + loader benchmark mode
(reference main.py:65-72, engine/tester.py:138-166, trainer.py:83-95)."""

import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.utils.profiling import DATALOADER_STAGES
from epipolar_transformers_tpu.vis.visualization import (
    assemble_video,
    dump_eval_frames,
    render_pose_frame,
    visualization,
)


def _cfg(tmp_path, **vis):
    d = {
        "DATASETS": {"TASK": "multiview_keypoint", "IMAGE_SIZE": (64, 64),
                     "TRAIN": ("synthetic_multiview_train",),
                     "TEST": ("synthetic_multiview_val",)},
        "KEYPOINT": {"NUM_PTS": 17, "HEATMAP_SIZE": (16, 16)},
        "OUTPUT_DIR": str(tmp_path / "out"),
        "VIS": vis,
    }
    return update_from_dict(Config(), d)


def test_render_pose_frame_draws(rng):
    img = rng.randn(64, 64, 3).astype(np.float32) * 0.1
    joints = rng.rand(17, 2) * 60 + 2
    frame = render_pose_frame(img, joints, kind="human36m")
    assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8


def test_dump_and_assemble_video(tmp_path, rng):
    cfg = _cfg(tmp_path, VIDEO=True)
    group = {
        "img": rng.randn(4, 64, 64, 3).astype(np.float32) * 0.1,
        "visibility": np.ones((4, 17), np.float32),
    }
    locs = rng.rand(4, 17, 2) * 60
    for idx in range(3):
        n = dump_eval_frames(cfg, group, locs, "ds0", idx)
        assert n == 4
    produced = visualization(cfg)
    mp4 = os.path.join(cfg.OUTPUT_DIR, "video", "ds0.mp4")
    assert produced["video/ds0"] == 3
    assert os.path.exists(mp4)


def test_visualization_pointcloud_mode(tmp_path, rng):
    cfg = _cfg(tmp_path, POINTCLOUD=True)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    preds = [{"pred3d": rng.randn(17, 3), "gt3d": rng.randn(17, 3)}
             for _ in range(4)]
    with open(os.path.join(cfg.OUTPUT_DIR, "predictions.pkl"), "wb") as f:
        pickle.dump(preds, f)
    produced = visualization(cfg)
    assert produced["pointclouds"] == 4
    pc = os.path.join(cfg.OUTPUT_DIR, "pointclouds", "pointcloud_00000.pkl")
    assert os.path.exists(pc)


def test_visualization_auc_mode(tmp_path, rng):
    cfg = _cfg(tmp_path, AUC=True)
    cfg = cfg.replace(TEST=cfg.TEST.replace(MAX_TH=10))
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "pck.pkl"), "wb") as f:
        pickle.dump({"err_joints": np.ones((5, 10)),
                     "total_joints": np.full((5,), 1.0)}, f)
    produced = visualization(cfg)
    assert 0.0 <= produced["auc"] <= 10.0
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "auc.pkl"))


def test_visualization_noop_without_flags(tmp_path):
    assert visualization(_cfg(tmp_path)) == {}


# ----------------------------------------------------- DATALOADER.BENCHMARK
def test_dataloader_benchmark_stages(tmp_path):
    """BENCHMARK must accumulate per-stage __getitem__ timings (reference
    joints_dataset.py:187,280-281) — previously a dead flag."""
    from tests.test_datasets import _h36m_cfg, _make_h36m_fixture
    from epipolar_transformers_tpu.data.datasets.multiview_h36m import MultiViewH36M

    cfg = _h36m_cfg()
    cfg = update_from_dict(cfg, {"DATALOADER": {"BENCHMARK": True}})
    root, anno = _make_h36m_fixture(tmp_path)
    ds = MultiViewH36M(cfg, root, anno, is_train=False)
    DATALOADER_STAGES.reset()
    _ = ds[0]
    avgs = DATALOADER_STAGES.averages()
    for stage in ("read", "undistort", "warp", "heatmap"):
        assert stage in avgs and avgs[stage] >= 0.0
    DATALOADER_STAGES.reset()


def test_trainer_benchmark_mode_skips_model(tmp_path):
    """train() under DATALOADER.BENCHMARK iterates data only and returns
    None (reference trainer.py:22,71,83-95)."""
    from epipolar_transformers_tpu.engine.trainer import train

    cfg = _cfg(tmp_path)
    cfg = update_from_dict(cfg, {
        "DATALOADER": {"BENCHMARK": True},
        "KEYPOINT": {"NUM_PTS": 5},
        "SOLVER": {"IMS_PER_BATCH": 2, "MAX_EPOCHS": 1},
    })
    assert train(cfg, max_steps=3) is None


def test_hand_comparison_panels(tmp_path, rng):
    """The reference's DEFAULT vis mode (visualization.py:545-643): saved
    lifting predictions -> per-sample 3D hand pred-vs-GT panel PNGs,
    dispatched flaglessly for lifting tasks."""
    pytest.importorskip("matplotlib")
    from epipolar_transformers_tpu.vis.visualization import hand_comparison_panels

    d = {
        "DATASETS": {"TASK": "keypoint_lifting_rot"},
        "LIFTING": {"ENABLED": True},
        "KEYPOINT": {"NUM_PTS": 21},
        "OUTPUT_DIR": str(tmp_path / "out"),
    }
    cfg = update_from_dict(Config(), d)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    preds = []
    for _ in range(2):
        inputs = {
            "visibility": np.ones(21, np.float32),
            "can-points-3d": rng.randn(21, 3).astype(np.float32),
            "normed-points-3d": rng.randn(21, 3).astype(np.float32),
        }
        out = {
            "can_pred": rng.randn(21, 3).astype(np.float32),
            "normed_pred": rng.randn(21, 3).astype(np.float32),
        }
        preds.append((inputs, out))
    pred_path = os.path.join(cfg.OUTPUT_DIR, "predictions.pkl")
    with open(pred_path, "wb") as f:
        pickle.dump(preds, f)

    n = hand_comparison_panels(pred_path, str(tmp_path / "panels"))
    assert n == 2
    assert os.path.exists(tmp_path / "panels" / "hand_panel_00000.png")

    # flagless dispatch for lifting tasks (the reference's default mode)
    produced = visualization(cfg)
    assert produced["hand_panels"] == 2
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "hand_panels",
                                       "hand_panel_00001.png"))


def test_lifting_save_pred(tmp_path):
    """_test_lifting honors VIS.SAVE_PRED with the reference's per-sample
    (inputs, outputs) pair format (tester.py:178-186)."""
    import jax

    from epipolar_transformers_tpu.config.catalog import DatasetCatalog
    from epipolar_transformers_tpu.data.pipeline import collate
    from epipolar_transformers_tpu.engine import create_train_state
    from epipolar_transformers_tpu.engine.tester import test as run_test
    from epipolar_transformers_tpu.engine.trainer import select_model_inputs
    from tests.test_datasets import _make_rhd_fixture

    root = _make_rhd_fixture(tmp_path / "rhd_fixture", n=3)
    data_dir = str(tmp_path / "datasets")
    os.makedirs(os.path.join(data_dir, "RHD_published_v2"), exist_ok=True)
    dst = os.path.join(data_dir, "RHD_published_v2", "evaluation")
    os.makedirs(dst, exist_ok=True)
    for kind in ("color", "mask"):
        os.symlink(os.path.join(root, "training", kind), os.path.join(dst, kind))
    os.link(os.path.join(root, "training", "anno_training.pickle"),
            os.path.join(dst, "anno_evaluation.pickle"))

    d = {
        "LIFTING": {"ENABLED": True, "CROP_SIZE": 128, "IMAGE_SIZE": 320},
        "KEYPOINT": {"NUM_PTS": 21, "HEATMAP_SIZE": (32, 32), "SIGMA": 4.0},
        "DATASETS": {"TASK": "lifting_direct", "TEST": ("rhd_val",)},
        "TEST": {"IMS_PER_BATCH": 3},
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": 3},
        "VIS": {"SAVE_PRED": True, "SAVE_PRED_FREQ": 1, "SAVE_PRED_LIMIT": 2},
        "OUTPUT_DIR": str(tmp_path / "out"),
    }
    cfg = update_from_dict(Config(), d)

    import unittest.mock as mock
    with mock.patch.object(DatasetCatalog, "DATA_DIR", data_dir):
        from epipolar_transformers_tpu.data.datasets.rhd import RHDDataset
        ds = RHDDataset(cfg, os.path.join(data_dir, "RHD_published_v2"),
                        "evaluation", is_train=False)
        inputs = select_model_inputs(cfg, collate([ds[i] for i in range(3)]))
        state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
        run_test(cfg, state, max_batches=1)

    pred_path = os.path.join(cfg.OUTPUT_DIR, "predictions.pkl")
    assert os.path.exists(pred_path)
    with open(pred_path, "rb") as f:
        saved = pickle.load(f)
    assert len(saved) == 2  # SAVE_PRED_LIMIT
    ins, outs = saved[0]
    assert "can-points-3d" in ins and "can_pred" in outs
    assert outs["can_pred"].shape == (21, 3)
