"""Reprojection-consistency branch + DepthOracle + MULTITEST eval path."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.ops.epipolar_attention import AttentionParams
from epipolar_transformers_tpu.ops.epipolar_reproject import (
    expected_match_locs,
    gt_grid,
    reproject_consistency,
    reprojection_loss,
)
from epipolar_transformers_tpu.ops.epipolar_sampling import (
    EpipolarGeometry,
    epipolar_sample_locs,
)
from epipolar_transformers_tpu.models.oracle import depth_oracle_warp

GEOM = EpipolarGeometry(16, 16, 8, 4, 1.0, True)
PARAMS = AttentionParams(attention="avg", similarity="dot",
                         softmax_scale=1 / np.sqrt(8))


def test_expected_match_locs_weighted_mean(rng):
    locs = jnp.asarray(rng.rand(8, 4, 4, 2).astype(np.float32))
    w = jnp.asarray(np.full((8, 4, 4), 1 / 8, np.float32))
    out = expected_match_locs(locs, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(locs).mean(0), atol=1e-6)


def test_reproject_shapes_and_loss(camera_ring, rng):
    P1 = jnp.asarray(camera_ring["KRT"][0].astype(np.float32))
    P2 = jnp.asarray(camera_ring["KRT"][1].astype(np.float32))
    feat1 = jnp.asarray(rng.randn(16, 16, 8).astype(np.float32))
    feat2 = jnp.asarray(rng.randn(16, 16, 8).astype(np.float32))
    locs = epipolar_sample_locs(P1, P2, GEOM).astype(jnp.float32)
    depth = jax.nn.softmax(jnp.asarray(rng.randn(8, 16, 16).astype(np.float32)), axis=0)
    reproj, mask = reproject_consistency(feat1, feat2, locs, depth, P1, P2, GEOM, PARAMS)
    assert reproj.shape == (16, 16, 2)
    assert mask.shape == (16, 16, 1)
    assert np.isfinite(np.asarray(reproj)).all()
    grid = jnp.asarray(gt_grid(GEOM))
    loss = reprojection_loss(reproj, grid, mask)
    assert np.isfinite(float(loss))
    # differentiable w.r.t. features
    g = jax.grad(
        lambda f: reprojection_loss(
            reproject_consistency(f, feat2, locs, depth, P1, P2, GEOM, PARAMS)[0],
            grid,
            mask,
        )
    )(feat1)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_reproject_loss_in_training_step(camera_ring):
    """REPROJECT_LOSS_WEIGHT wires an extra finite loss into the train step."""
    from epipolar_transformers_tpu.data.pipeline import make_data_loader
    from epipolar_transformers_tpu.engine import create_train_state, make_train_step
    from epipolar_transformers_tpu.engine.trainer import select_model_inputs

    d = {
        "DATASETS": {"TRAIN": ("synthetic_multiview_train",),
                     "TEST": ("synthetic_multiview_val",),
                     "TASK": "multiview_keypoint", "IMAGE_SIZE": (64, 64),
                     "IMAGE_RESIZE": 1.0, "PREDICT_RESIZE": 1.0},
        "BACKBONE": {"ENABLED": True, "BODY": "epipolarposeR-18", "DOWNSAMPLE": 4,
                     "PRETRAINED": False},
        "KEYPOINT": {"ENABLED": True, "NUM_PTS": 5, "HEATMAP_SIZE": (16, 16),
                     "SIGMA": 2.0, "NFEATS": 256, "LOSS": "joint",
                     "LOSS_PER_JOINT": False},
        "EPIPOLAR": {"SAMPLESIZE": 8, "MERGE": "late", "ATTENTION": "avg",
                     "SIMILARITY": "dot", "PARAMETERIZED": ("z",),
                     "ZRESIDUAL": True, "SHARE_WEIGHTS": True,
                     "USE_CORRECT_NORMALIZE": True, "PRETRAINED": False,
                     "REPROJECT_LOSS_WEIGHT": 0.1},
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": 2},
    }
    cfg = update_from_dict(Config(), d)
    loader = make_data_loader(cfg, is_train=True)
    inputs = select_model_inputs(cfg, next(iter(loader)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    step = make_train_step(cfg)
    state, metrics = step(state, inputs, jax.random.PRNGKey(1))
    assert "reproject_loss" in metrics
    assert np.isfinite(float(metrics["reproject_loss"]))
    assert np.isfinite(float(metrics["loss"]))


def test_depth_oracle_shapes(rng):
    N, H, W, C = 2, 16, 16, 4
    feat = jnp.asarray(rng.randn(N, 2, H, W, C).astype(np.float32))
    depth = jnp.asarray(rng.rand(N, H, W).astype(np.float32) * 100 + 50)
    K = jnp.asarray(np.stack([np.diag([100.0, 100.0, 1.0])] * N).astype(np.float32))
    R = jnp.asarray(np.stack([np.eye(3)] * N).astype(np.float32))
    t = jnp.asarray(np.zeros((N, 3), np.float32))
    bbox = jnp.asarray(np.tile([0.0, 0.0, 16.0, 16.0], (N, 1)).astype(np.float32))
    out = depth_oracle_warp(feat, depth, depth, K, R, t, K, R, t, bbox, bbox)
    assert out.shape == (N, 2, H, W, 2 * C)
    assert np.isfinite(np.asarray(out)).all()
