"""Construction-time pretrained initialization (reference
modeling/model.py:37-54 + utils/checkpoint.py:49-57): the multiview model
must pull single-view backbone weights from the BackboneCatalog checkpoint
dir, and foreign-format cfg.WEIGHTS (.pth) must route through torch_import
inside create_train_state."""

import os

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.config.catalog import BackboneCatalog
from epipolar_transformers_tpu.engine.trainer import create_train_state
from epipolar_transformers_tpu.utils.checkpoint import Checkpointer
from epipolar_transformers_tpu.utils.pretrained import (
    apply_pretrained,
    resolve_checkpoint,
)
from tests.test_torch_import import _tiny_torch_posenet_sd


def _multiview_cfg(share_weights=True, pretrained=True, body="epipolarposeR-18"):
    d = {
        "DATASETS": {"TASK": "multiview_keypoint", "IMAGE_SIZE": (64, 64)},
        "BACKBONE": {"BODY": body, "DOWNSAMPLE": 4},
        "KEYPOINT": {"NUM_PTS": 5, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0,
                     "LOSS": "joint"},
        "EPIPOLAR": {"SHARE_WEIGHTS": share_weights, "PRETRAINED": pretrained,
                     "MERGE": "late", "SAMPLESIZE": 8, "TOPK": 1,
                     "PARAMETERIZED": ("z",), "ZRESIDUAL": True},
    }
    return update_from_dict(Config(), d)


def _sample_inputs(rng, n=1):
    return {
        "img": rng.rand(n, 64, 64, 3).astype(np.float32),
        "other_img": rng.rand(n, 64, 64, 3).astype(np.float32),
        "KRT": np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]), (n, 1, 1)).astype(np.float32),
        "other_KRT": np.tile(np.hstack([np.eye(3), np.ones((3, 1))]), (n, 1, 1)).astype(np.float32),
        "heatmap": rng.rand(n, 16, 16, 5).astype(np.float32),
        "visibility": np.ones((n, 5), np.float32),
    }


def _write_torch_single_view_ckpt(ckpt_dir, rng):
    """A torch-format single-view pose net checkpoint as the reference
    produces it: keys under 'backbone.module.' (DataParallel wrapper),
    {'model': state_dict} payload, plus the last_checkpoint tag."""
    os.makedirs(ckpt_dir, exist_ok=True)
    sd = {"backbone.module." + k: torch.from_numpy(np.asarray(v))
          for k, v in _tiny_torch_posenet_sd(rng).items()}
    path = os.path.join(ckpt_dir, "model.pth")
    torch.save({"model": sd}, path)
    with open(os.path.join(ckpt_dir, "last_checkpoint"), "w") as f:
        f.write("model.pth")
    return path, sd


def test_resolve_checkpoint_prefers_tag(tmp_path):
    d = str(tmp_path)
    open(os.path.join(d, "model_final.ckpt"), "wb").close()
    open(os.path.join(d, "older.ckpt"), "wb").close()
    assert resolve_checkpoint(d).endswith("model_final.ckpt")
    with open(os.path.join(d, "last_checkpoint"), "w") as f:
        f.write("older.ckpt")
    assert resolve_checkpoint(d).endswith("older.ckpt")
    assert resolve_checkpoint(str(tmp_path / "nope")) is None


def test_multiview_from_torch_single_view_catalog(tmp_path, monkeypatch, rng):
    """EPIPOLAR.PRETRAINED: catalog checkpoint lands in the `reference`
    submodule, converted exactly (conv OIHW->HWIO; BN stats into
    batch_stats) — reference modeling/model.py:37-43."""
    monkeypatch.setattr(BackboneCatalog, "OUTS_DIR", str(tmp_path))
    ckpt_dir = os.path.join(str(tmp_path), "benchmark", "keypoint_h36m")
    _, sd = _write_torch_single_view_ckpt(ckpt_dir, rng)

    cfg = _multiview_cfg(share_weights=True, pretrained=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0), _sample_inputs(rng))

    got = np.asarray(state.params["reference"]["conv1"]["kernel"])
    want = np.transpose(sd["backbone.module.conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    got_var = np.asarray(state.batch_stats["reference"]["bn1"]["var"])
    np.testing.assert_allclose(got_var, sd["backbone.module.bn1.running_var"].numpy())
    # zero-init fusion BN must stay identity-at-init after the import
    # (SURVEY hard parts; reference BN.py:48-52)
    fuse_bn = state.params["reference"]["epipolar_sampler"]["bn"]["norm"]
    assert np.allclose(np.asarray(fuse_bn["scale"]), 0.0)


def test_separate_backbone_gets_same_weights(tmp_path, monkeypatch, rng):
    """not SHARE_WEIGHTS: the frozen sibling `backbone` loads the same
    single-view weights (reference modeling/model.py:47-54)."""
    monkeypatch.setattr(BackboneCatalog, "OUTS_DIR", str(tmp_path))
    ckpt_dir = os.path.join(str(tmp_path), "benchmark", "keypoint_h36m")
    _write_torch_single_view_ckpt(ckpt_dir, rng)

    cfg = _multiview_cfg(share_weights=False, pretrained=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0), _sample_inputs(rng))
    np.testing.assert_allclose(
        np.asarray(state.params["reference"]["conv1"]["kernel"]),
        np.asarray(state.params["backbone"]["conv1"]["kernel"]))


def test_native_ckpt_graft(tmp_path, monkeypatch, rng):
    """A framework-native single-view .ckpt (params under 'backbone') grafts
    onto the multiview 'reference' submodule."""
    # build a single-view state and save it as the catalog checkpoint
    single_cfg = update_from_dict(Config(), {
        "DATASETS": {"TASK": "keypoint", "IMAGE_SIZE": (64, 64)},
        "BACKBONE": {"BODY": "poseR-18", "DOWNSAMPLE": 4},
        "KEYPOINT": {"NUM_PTS": 5, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0,
                     "LOSS": "joint"},
    })
    inputs = {k: v for k, v in _sample_inputs(rng).items()
              if k in ("img", "heatmap", "visibility")}
    single_state = create_train_state(single_cfg, jax.random.PRNGKey(1), inputs)
    ckpt_dir = os.path.join(str(tmp_path), "benchmark", "keypoint_h36m")
    Checkpointer(ckpt_dir).save("model_003", single_state, epoch=3)

    monkeypatch.setattr(BackboneCatalog, "OUTS_DIR", str(tmp_path))
    cfg = _multiview_cfg(share_weights=True, pretrained=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0), _sample_inputs(rng))
    np.testing.assert_allclose(
        np.asarray(state.params["reference"]["conv1"]["kernel"]),
        np.asarray(single_state.params["backbone"]["conv1"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["reference"]["bn1"]["mean"]),
        np.asarray(single_state.batch_stats["backbone"]["bn1"]["mean"]))


def test_cfg_weights_pth_import(tmp_path, rng):
    """cfg.WEIGHTS='*.pth' routes through torch_import with WEIGHTS_PREFIX
    (reference utils/checkpoint.py:49 load(prefix='module.'))."""
    sd = {"module.backbone." + k: torch.from_numpy(np.asarray(v))
          for k, v in _tiny_torch_posenet_sd(rng).items()}
    path = str(tmp_path / "w.pth")
    torch.save({"model": sd}, path)

    cfg = update_from_dict(Config(), {
        "DATASETS": {"TASK": "keypoint", "IMAGE_SIZE": (64, 64)},
        "BACKBONE": {"BODY": "poseR-18", "DOWNSAMPLE": 4},
        "KEYPOINT": {"NUM_PTS": 5, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0,
                     "LOSS": "joint"},
        "WEIGHTS": path,
        "WEIGHTS_PREFIX": "module.",
    })
    inputs = {k: v for k, v in _sample_inputs(rng).items()
              if k in ("img", "heatmap", "visibility")}
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    got = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    want = np.transpose(sd["module.backbone.conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)


def test_pretrained_disabled_keeps_init(tmp_path, monkeypatch, rng):
    monkeypatch.setattr(BackboneCatalog, "OUTS_DIR", str(tmp_path))
    ckpt_dir = os.path.join(str(tmp_path), "benchmark", "keypoint_h36m")
    _, sd = _write_torch_single_view_ckpt(ckpt_dir, rng)
    cfg = _multiview_cfg(share_weights=True, pretrained=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0), _sample_inputs(rng))
    got = np.asarray(state.params["reference"]["conv1"]["kernel"])
    want = np.transpose(sd["backbone.module.conv1.weight"].numpy(), (2, 3, 1, 0))
    assert not np.allclose(got, want)
