"""End-to-end slices on the synthetic multiview rig:
  * GT-heatmap -> soft-argmax -> f64 triangulation recovers 3D to ~mm;
  * single-view keypoint training reduces the loss;
  * multiview epipolar training step runs sharded over the 8-device CPU mesh;
  * eval loop produces MPJPE/JDR/PCK metrics.
"""

import numpy as np
import pytest
import jax

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.datasets.synthetic import SyntheticMultiview
from epipolar_transformers_tpu.data.pipeline import DataLoader, make_data_loader
from epipolar_transformers_tpu.engine import create_train_state, make_train_step, train
from epipolar_transformers_tpu.engine import test as run_eval
from epipolar_transformers_tpu.engine.trainer import select_model_inputs
from epipolar_transformers_tpu.geometry.host import triangulate_pymvg_np
from epipolar_transformers_tpu.ops import find_tensor_peak_batch
from epipolar_transformers_tpu.parallel.mesh import make_mesh, shard_batch

import jax.numpy as jnp


def _base_cfg(task="keypoint", body="poseR-18", n_train=32):
    d = {
        "DATASETS": {
            "TRAIN": ("synthetic_multiview_train",),
            "TEST": ("synthetic_multiview_val",),
            "TASK": task,
            "IMAGE_SIZE": (64, 64),
            "IMAGE_RESIZE": 1.0,
            "PREDICT_RESIZE": 1.0,
        },
        "BACKBONE": {"ENABLED": True, "BODY": body, "DOWNSAMPLE": 4},
        "KEYPOINT": {
            "ENABLED": True, "NUM_PTS": 5, "HEATMAP_SIZE": (16, 16),
            "SIGMA": 2.0, "NFEATS": 256, "TRIANGULATION": "pymvg",
            "LOSS": "joint", "LOSS_PER_JOINT": False, "CONF_THRES": 0.05,
        },
        "EPIPOLAR": {
            "SAMPLESIZE": 8, "MERGE": "late", "ATTENTION": "avg",
            "SIMILARITY": "dot", "PARAMETERIZED": ("z",), "ZRESIDUAL": True,
            "SHARE_WEIGHTS": True, "USE_CORRECT_NORMALIZE": True,
            "PRETRAINED": False,
        },
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": 8,
                   "MAX_EPOCHS": 1},
        "TEST": {"IMS_PER_BATCH": 1, "THRESHOLDS": (1, 2, 5, 10, 20)},
        "OUTPUT_DIR": "",
    }
    return update_from_dict(Config(), d)


def test_gt_heatmaps_triangulate_to_gt_3d():
    """Dataset + soft-argmax decode + DLT triangulation closes the loop:
    GT heatmaps must reproduce the GT 3D skeleton to ~mm."""
    cfg = _base_cfg()
    ds = SyntheticMultiview(cfg, is_train=False, n_samples=4)
    item = ds[0]
    V = item["img"].shape[0]
    locs, scores = [], []
    for v in range(V):
        hm = jnp.asarray(item["heatmap"][v].transpose(2, 0, 1))  # (J, h, w)
        l, s = find_tensor_peak_batch(hm, cfg.KEYPOINT.SIGMA, cfg.BACKBONE.DOWNSAMPLE)
        locs.append(np.asarray(l))
        scores.append(np.asarray(s))
    locs = np.stack(locs)
    scores = np.stack(scores)
    pred3d = triangulate_pymvg_np(locs, item["K"], item["RT"], scores)
    err = np.linalg.norm(pred3d - item["points-3d"], axis=-1)
    assert err.mean() < 10.0, err  # image-coord decode is ~1px at stride 4


@pytest.mark.slow
def test_single_view_training_reduces_loss():
    cfg = _base_cfg(task="keypoint")
    loader = make_data_loader(cfg, is_train=True)
    batch = next(iter(loader))
    inputs = select_model_inputs(cfg, batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    step = make_train_step(cfg)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, inputs, sub)  # overfit one batch
        losses.append(float(metrics["loss"]))
    # near-zero-init heatmaps start with a small loss (GT background is 0.01
    # by the clipped-exp render); overfitting one batch must still cut it
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.5, losses


@pytest.mark.slow
def test_multiview_epipolar_train_step_on_mesh():
    """The flagship zresidual config shape: shared-weight epipolar PoseResNet,
    one train step sharded over the virtual 8-device CPU mesh."""
    cfg = _base_cfg(task="multiview_keypoint", body="epipolarposeR-18")
    mesh = make_mesh()
    assert mesh.devices.size == 8
    loader = make_data_loader(cfg, is_train=True)
    batch = next(iter(loader))
    inputs = select_model_inputs(cfg, batch)
    with mesh:
        state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
        step = make_train_step(cfg)
        sharded = shard_batch(inputs, mesh)
        state, metrics = step(state, sharded, jax.random.PRNGKey(1))
        state, metrics = step(state, sharded, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_loop_produces_metrics():
    cfg = _base_cfg(task="multiview_keypoint", body="epipolarposeR-18")
    loader = make_data_loader(cfg, is_train=True)
    batch = next(iter(loader))
    inputs = select_model_inputs(cfg, batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    results = run_eval(cfg, state, max_batches=2)
    assert "EPEmean_global" in results
    assert "JDR" in results
    assert any(k.startswith("PCK@") for k in results)
    assert any(k.startswith("MPJPE@") for k in results)
    assert np.isfinite(results["EPEmean_global"])
