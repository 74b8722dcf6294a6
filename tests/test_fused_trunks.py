"""Eval-time 2N-batch trunk fusion == two separate backbone passes.

ModelBuilder batches the reference/other views through one trunk+deconv
call at eval (MERGE='late' + SHARE_WEIGHTS + running-stat BN); this must be
numerically identical to the reference's two-pass structure
(reference modeling/model.py:241-247).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.models import ModelBuilder


def _cfg(**epipolar):
    d = {
        "DATASETS": {
            "TRAIN": ("synthetic_multiview_train",),
            "TEST": ("synthetic_multiview_val",),
            "TASK": "multiview_keypoint",
            "IMAGE_SIZE": (32, 32),
            "IMAGE_RESIZE": 1.0,
            "PREDICT_RESIZE": 1.0,
        },
        "BACKBONE": {"ENABLED": True, "BODY": "epipolarposeR-18",
                     "PRETRAINED": False, "DOWNSAMPLE": 4},
        "KEYPOINT": {"ENABLED": True, "NUM_PTS": 5, "HEATMAP_SIZE": (8, 8),
                     "SIGMA": 2.0, "NFEATS": 256},
        "EPIPOLAR": {"SAMPLESIZE": 4, "MERGE": "late", "ATTENTION": "avg",
                     "SIMILARITY": "dot", "PARAMETERIZED": ("z",),
                     "ZRESIDUAL": True, "SHARE_WEIGHTS": True,
                     "PRETRAINED": False, "USE_CORRECT_NORMALIZE": True,
                     **epipolar},
    }
    return update_from_dict(Config(), d)


def _inputs(rng, n=2):
    img = rng.randn(n, 32, 32, 3).astype(np.float32)
    other = rng.randn(n, 32, 32, 3).astype(np.float32)
    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    P1 = (K @ np.concatenate([np.eye(3), [[0], [0], [60]]], 1)).astype(np.float32)
    R = np.array([[0.0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    P2 = (K @ np.concatenate([R, [[0], [0], [60]]], 1)).astype(np.float32)
    return {
        "img": jnp.asarray(img),
        "other_img": jnp.asarray(other),
        "KRT": jnp.asarray(np.stack([P1] * n)),
        "other_KRT": jnp.asarray(np.stack([P2] * n)),
    }


@pytest.mark.slow
def test_fused_trunks_match_two_pass(rng, monkeypatch):
    cfg = _cfg()
    model = ModelBuilder(cfg)
    inputs = _inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), inputs, is_train=True)

    assert model._can_fuse_trunks is not None
    _, _, out_fused = model.apply(variables, inputs, is_train=False)

    monkeypatch.setattr(ModelBuilder, "_can_fuse_trunks",
                        lambda self, net_train: False)
    _, _, out_two = model.apply(variables, inputs, is_train=False)

    assert set(out_fused) == set(out_two)
    for k in out_two:
        np.testing.assert_allclose(
            np.asarray(out_fused[k], np.float32),
            np.asarray(out_two[k], np.float32),
            rtol=1e-5, atol=1e-5, err_msg=k)


def test_fusion_gated_off_in_train_and_train_bn(rng):
    """Train mode and TEST.TRAIN_BN compute batch statistics — fusing the
    two passes would change them, so the gate must refuse."""
    cfg = _cfg()
    model = ModelBuilder(cfg)
    # (net_train=True short-circuits before touching submodules, so the
    # gate is callable on the unbound module; the True case is exercised
    # by test_fused_trunks_match_two_pass through apply)
    assert not ModelBuilder._can_fuse_trunks.__get__(model)(True)

    cfg2 = _cfg(MERGE="early")
    m2 = ModelBuilder(cfg2)
    assert not ModelBuilder._can_fuse_trunks.__get__(m2)(False)

    cfg3 = _cfg(SHARE_WEIGHTS=False)
    m3 = ModelBuilder(cfg3)
    assert not ModelBuilder._can_fuse_trunks.__get__(m3)(False)
