"""DATALOADER.DEVICE_RENDER: on-device synthetic-rig splatting.

The device renderer (ops/synthetic_render.py) must reproduce the host
renderer (data/datasets/synthetic.py windowed splats) to float tolerance —
the host path is itself proven equal to the full-grid formulation the
device evaluates — and the trainer must train end-to-end from param-only
batches on the sharded mesh.
"""

import pytest
import numpy as np

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.datasets.synthetic import SyntheticMultiview
from epipolar_transformers_tpu.data.pipeline import collate
from epipolar_transformers_tpu.engine import train
from epipolar_transformers_tpu.engine.trainer import (
    materialize_model_inputs,
    select_render_inputs,
)
from epipolar_transformers_tpu.ops.synthetic_render import make_batch_renderer


def _cfg(device_render: bool, augment: bool = True):
    d = {
        "DATASETS": {
            "TRAIN": ("synthetic_multiview_train",),
            "TEST": ("synthetic_multiview_val",),
            "TASK": "multiview_keypoint",
            "IMAGE_SIZE": (64, 64),
            "IMAGE_RESIZE": 1.0,
            "PREDICT_RESIZE": 1.0,
            "SCALE_FACTOR": 0.25 if augment else 0.0,
            "ROT_FACTOR": 30 if augment else 0,
        },
        "BACKBONE": {"ENABLED": True, "BODY": "epipolarposeR-18",
                     "DOWNSAMPLE": 4, "PRETRAINED": False},
        "KEYPOINT": {"ENABLED": True, "NUM_PTS": 5, "HEATMAP_SIZE": (16, 16),
                     "SIGMA": 2.0, "LOSS": "joint", "LOSS_PER_JOINT": False},
        "EPIPOLAR": {"SAMPLESIZE": 8, "MERGE": "late", "ATTENTION": "avg",
                     "SIMILARITY": "dot", "PARAMETERIZED": ("z",),
                     "ZRESIDUAL": True, "SHARE_WEIGHTS": True,
                     "PRETRAINED": False, "USE_CORRECT_NORMALIZE": True},
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": 8,
                   "MAX_EPOCHS": 1},
        "DATALOADER": {"DEVICE_RENDER": device_render},
        "TENSORBOARD": {"USE": False},
        "OUTPUT_DIR": "",
    }
    return update_from_dict(Config(), d)


def test_device_render_matches_host_render():
    """Same RNG stream -> the device splat of a param item equals the host
    render of the same item (img, other_img, heatmap), including under
    scale/rot augmentation (aug is drawn host-side in both modes, in the
    same np.random call order because rendering consumes no RNG)."""
    cfg_h = _cfg(device_render=False)
    cfg_d = _cfg(device_render=True)
    ds_h = SyntheticMultiview(cfg_h, is_train=True, n_samples=8, seed=3)
    ds_d = SyntheticMultiview(cfg_d, is_train=True, n_samples=8, seed=3)
    assert ds_d.device_render and not ds_h.device_render

    np.random.seed(11)
    host_items = [ds_h[i] for i in range(4)]
    np.random.seed(11)
    light_items = [ds_d[i] for i in range(4)]

    for li in light_items:
        assert "img" not in li and "other_points-2d" in li
    host = collate(host_items)
    light = collate(light_items)
    # the same host-side geometry went into both modes
    np.testing.assert_array_equal(host["points-2d"], light["points-2d"])
    np.testing.assert_array_equal(host["KRT"], light["KRT"])

    rendered = make_batch_renderer(cfg_d)(select_render_inputs(cfg_d, light))
    np.testing.assert_allclose(np.asarray(rendered["img"]), host["img"],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rendered["other_img"]),
                               host["other_img"], rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rendered["heatmap"]),
                               host["heatmap"], rtol=0, atol=2e-5)
    # pass-through keys survive, param keys are dropped
    assert "points-2d" not in rendered
    np.testing.assert_array_equal(np.asarray(rendered["other_KRT"]),
                                  host["other_KRT"])


def test_materialize_model_inputs_both_modes():
    cfg_d = _cfg(device_render=True)
    ds_d = SyntheticMultiview(cfg_d, is_train=True, n_samples=8, seed=3)
    np.random.seed(0)
    batch = collate([ds_d[i] for i in range(2)])
    out = materialize_model_inputs(cfg_d, batch)
    assert out["img"].shape == (2, 64, 64, 3)
    assert out["heatmap"].shape == (2, 16, 16, 5)

    cfg_h = _cfg(device_render=False)
    ds_h = SyntheticMultiview(cfg_h, is_train=True, n_samples=8, seed=3)
    np.random.seed(0)
    batch = collate([ds_h[i] for i in range(2)])
    out = materialize_model_inputs(cfg_h, batch)
    assert out["img"].shape == (2, 64, 64, 3)


@pytest.mark.slow
def test_train_steps_from_param_batches():
    """train() runs end-to-end from device-render batches on the sharded
    mesh (the full epipolar multiview model, 3 steps, finite loss)."""
    cfg = _cfg(device_render=True)
    state = train(cfg, max_steps=3)
    assert int(state.step) == 3
