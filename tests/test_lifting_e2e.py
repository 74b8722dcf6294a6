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


# --------------------------------------------------------------------------- #
# VIS.MULTIVIEW global-frame fusion eval (reference model.py:461-476)
# --------------------------------------------------------------------------- #

def _rotations(rng, n):
    """Proper rotation matrices from QR of random gaussians."""
    out = []
    for _ in range(n):
        q, r = np.linalg.qr(rng.randn(3, 3))
        q = q * np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        out.append(q)
    return np.stack(out).astype(np.float32)


def _multiview_lifting_setup(rng, medium=True, upperbound=False, V=4):
    d = {
        "LIFTING": {
            "ENABLED": True,
            "MULTIVIEW_MEDIUM": medium,
            "MULTIVIEW_UPPERBOUND": upperbound,
        },
        "KEYPOINT": {"NUM_PTS": 21, "HEATMAP_SIZE": (32, 32), "SIGMA": 4.0},
        "DATASETS": {"TASK": "keypoint_lifting_rot"},
        "VIS": {"MULTIVIEW": True},
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": V},
    }
    cfg = update_from_dict(Config(), d)
    J = 21
    inputs = {
        "heatmap": rng.rand(V, 32, 32, J).astype(np.float32),
        "hand-side": np.zeros((V,), np.float32),
        "visibility": (rng.rand(V, J) > 0.2).astype(np.float32),
        "can-points-3d": rng.randn(V, J, 3).astype(np.float32),
        "normed-points-3d": rng.randn(V, J, 3).astype(np.float32),
        "rotation": _rotations(rng, V),
        "R": _rotations(rng, V),
        "scale": (1.0 + rng.rand(V)).astype(np.float32),
        "unit": np.full((V,), 1000.0, np.float32),
        "points-3d": np.repeat(rng.randn(1, J, 3).astype(np.float32), V, axis=0),
    }
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    _, metric_dict, out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        inputs, is_train=False,
    )
    # host-side recomputation of the fusion from the model's own normed_pred
    normed = np.asarray(out["normed_pred"], np.float64)
    Rg = np.asarray(inputs["R"], np.float64)
    global_pred = normed @ np.transpose(np.linalg.inv(Rg), (0, 2, 1))
    gp = (global_pred - global_pred[0]) * inputs["scale"][:, None, None]
    tg = np.asarray(inputs["points-3d"][0], np.float64)
    tg = tg - tg[0]
    return cfg, inputs, metric_dict, gp, tg


def test_multiview_global_eval_mean_and_median(rng):
    for medium in (False, True):
        cfg, inputs, metric_dict, gp, tg = _multiview_lifting_setup(
            np.random.RandomState(3), medium=medium
        )
        assert "EPEmean_global" in metric_dict
        V = gp.shape[0]
        if medium:
            # torch .median(0) fusion = LOWER median per coordinate
            fused = np.sort(gp, axis=0)[(V - 1) // 2]
        else:
            fused = gp.mean(0)
        err = np.linalg.norm(fused - tg, axis=-1) * 1000.0
        err = np.minimum(err, cfg.TEST.EPEMEAN_MAX_DIST)
        expect = err.mean()
        np.testing.assert_allclose(
            float(metric_dict["EPEmean_global"]), expect, rtol=2e-4
        )


def test_multiview_global_eval_upperbound(rng):
    cfg, inputs, metric_dict, gp, tg = _multiview_lifting_setup(
        np.random.RandomState(4), upperbound=True
    )
    assert "EPEmean_global" in metric_dict
    # reference metrics3d.py:63-70: per-view min over JOINTS, then the
    # visibility mask collapsed to view level
    err = np.linalg.norm(gp - tg, axis=-1).min(axis=1) * 1000.0
    vis = inputs["visibility"][:, 0].astype(bool)
    expect = err[vis].mean() if vis.any() else err.mean()
    np.testing.assert_allclose(
        float(metric_dict["EPEmean_global"]), expect, rtol=2e-4
    )


def test_multiview_global_eval_off_when_training(rng):
    cfg, inputs, _, _, _ = _multiview_lifting_setup(np.random.RandomState(5))
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    step = make_train_step(cfg)
    _, metrics = step(state, inputs, jax.random.PRNGKey(1))
    assert "EPEmean_global" not in metrics


def test_lifting_engine_eval_branch(tmp_path, monkeypatch):
    """engine/tester.test() dispatches lifting tasks to the metric-dict
    aggregation loop (reference tester.py:131-137)."""
    import os

    from epipolar_transformers_tpu.config.catalog import DatasetCatalog
    from epipolar_transformers_tpu.engine.tester import test as run_test

    root = _make_rhd_fixture(tmp_path / "rhd_fixture", n=3)
    data_dir = str(tmp_path / "datasets")
    os.makedirs(os.path.join(data_dir, "RHD_published_v2"), exist_ok=True)
    dst = os.path.join(data_dir, "RHD_published_v2", "evaluation")
    os.makedirs(dst, exist_ok=True)
    for kind in ("color", "mask"):
        os.symlink(os.path.join(root, "training", kind), os.path.join(dst, kind))
    os.link(os.path.join(root, "training", "anno_training.pickle"),
            os.path.join(dst, "anno_evaluation.pickle"))
    monkeypatch.setattr(DatasetCatalog, "DATA_DIR", data_dir)

    cfg = _lifting_cfg("lifting_direct")
    cfg = update_from_dict(cfg, {"DATASETS": {"TEST": ("rhd_val",)},
                                 "TEST": {"IMS_PER_BATCH": 3}})
    ds_batch = None
    from epipolar_transformers_tpu.data.datasets.rhd import RHDDataset
    ds = RHDDataset(cfg, os.path.join(data_dir, "RHD_published_v2"), "evaluation",
                    is_train=False)
    ds_batch = collate([ds[i] for i in range(3)])
    inputs = select_model_inputs(cfg, ds_batch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    results = run_test(cfg, state, max_batches=1)
    assert "EPEmean_can" in results and np.isfinite(results["EPEmean_can"])
    # single-loss dicts collapse to 'loss' (reference model.py:478-484)
    assert "loss" in results and np.isfinite(results["loss"])


def test_multiview_global_eval_without_scale(rng):
    """Datasets that provide no 'scale' fuse unscaled — the float-1.0
    branch must not be indexed (regression: kp_scale[..., None] on a
    python float raised TypeError at trace time)."""
    cfg, inputs, _, gp, tg = _multiview_lifting_setup(rng, medium=False)
    inputs = {k: v for k, v in inputs.items() if k != "scale"}
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    _, metric_dict, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        inputs, is_train=False,
    )
    assert "EPEmean_global" in metric_dict
    assert np.isfinite(float(metric_dict["EPEmean_global"]))
