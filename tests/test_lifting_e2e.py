"""Lifting tasks end-to-end: RHD fixture -> LiftingNet training reduces loss;
rot task produces rotation outputs; rodrigues properties."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.pipeline import DataLoader, collate
from epipolar_transformers_tpu.engine import create_train_state, make_train_step
from epipolar_transformers_tpu.engine.trainer import select_model_inputs
from epipolar_transformers_tpu.models.lifting import multiview_to_global, rodrigues
from tests.test_datasets import _make_rhd_fixture


def _lifting_cfg(task="lifting_direct"):
    d = {
        "LIFTING": {"ENABLED": True, "CROP_SIZE": 128, "IMAGE_SIZE": 320},
        "KEYPOINT": {"NUM_PTS": 21, "HEATMAP_SIZE": (32, 32), "SIGMA": 4.0},
        "DATASETS": {"TASK": task},
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": 3},
    }
    return update_from_dict(Config(), d)


def test_rodrigues_is_rotation(rng):
    y = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    R = np.asarray(rodrigues(y))
    for i in range(4):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) == pytest.approx(1.0, abs=1e-5)


def test_multiview_to_global(rng):
    coords = jnp.asarray(rng.randn(2, 21, 3).astype(np.float32))
    R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    out = multiview_to_global(coords, R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(coords), atol=1e-6)


def test_lifting_direct_training_reduces_loss(tmp_path):
    from epipolar_transformers_tpu.data.datasets.rhd import RHDDataset

    cfg = _lifting_cfg("lifting_direct")
    root = _make_rhd_fixture(tmp_path, n=3)
    ds = RHDDataset(cfg, root, "training", is_train=False)
    batch = collate([ds[i] for i in range(3)])
    inputs = select_model_inputs(cfg, batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    step = make_train_step(cfg)
    rng_key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(25):
        rng_key, sub = jax.random.split(rng_key)
        state, metrics = step(state, inputs, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.9, losses
    assert "EPEmean_can" in metrics


def test_lifting_rot_outputs(tmp_path):
    from epipolar_transformers_tpu.data.datasets.rhd import RHDDataset

    cfg = _lifting_cfg("keypoint_lifting_rot").replace(
        BACKBONE=_lifting_cfg().BACKBONE.replace(BODY="poseR-18", ENABLED=True)
    )
    # keypoint_lifting_rot consumes GT heatmaps through LiftingNet w/ pool=2
    root = _make_rhd_fixture(tmp_path, n=2)
    ds = RHDDataset(cfg, root, "training", is_train=False)
    batch = collate([ds[i] for i in range(2)])
    inputs = select_model_inputs(cfg, batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    step = make_train_step(cfg)
    state, metrics = step(state, inputs, jax.random.PRNGKey(1))
    assert "rot_loss" in metrics
    assert "EPEmean" in metrics
    assert np.isfinite(float(metrics["loss"]))
