"""Hourglass backbone family + Meta layer + align_corners resize."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.models.hourglass import HourglassNet
from epipolar_transformers_tpu.models.meta import Meta
from epipolar_transformers_tpu.ops.resize import resize_bilinear_align_corners


def _cfg(body="HG11", **epi):
    d = {
        "BACKBONE": {"BODY": body, "DOWNSAMPLE": 4, "ENABLED": True},
        "KEYPOINT": {"NUM_PTS": 5, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0,
                     "NFEATS": 64},
        "DATASETS": {"IMAGE_SIZE": (64, 64), "IMAGE_RESIZE": 1.0,
                     "PREDICT_RESIZE": 1.0},
        "EPIPOLAR": {"SAMPLESIZE": 4, "MERGE": "late", "ATTENTION": "avg",
                     "SIMILARITY": "dot", "PARAMETERIZED": (),
                     "USE_CORRECT_NORMALIZE": True, **epi},
    }
    return update_from_dict(Config(), d)


def test_resize_matches_torch_interpolate(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    out = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (10, 14)))
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
            mode="bilinear", align_corners=True,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_hourglass_single_view_shapes():
    cfg = _cfg("HG11")
    model = HourglassNet(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.heatmaps[-1].shape == (2, 16, 16, 5)
    assert out.locs.shape == (2, 5, 2)


def test_hourglass_stacked_intermediate_supervision():
    cfg = _cfg("HG")  # 3 stacks
    model = HourglassNet(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert len(out.heatmaps) == 3
    for hm in out.heatmaps:
        assert hm.shape == (1, 16, 16, 5)


def test_epipolar_hourglass_fusion(camera_ring):
    cfg = _cfg("epipolarHG11")
    model = HourglassNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    other = [jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))]
    KRT = jnp.asarray(np.stack([camera_ring["KRT"][0]] * 2).astype(np.float32))
    oKRT = jnp.asarray(np.stack([camera_ring["KRT"][1]] * 2).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, other_features=other,
                           KRT=KRT, other_KRT=oKRT, train=False)
    out = model.apply(variables, x, other_features=other, KRT=KRT,
                      other_KRT=oKRT, train=False)
    assert out.corr_pos.shape == (2, 16, 16, 2)
    # placeholder depth at eval without SAVE_PRED (Epipolar need_depth gate)
    assert out.depth.shape[0] == 2 and out.depth.shape[-2:] == (16, 16)


def test_meta_layer(camera_ring):
    model = Meta(in_channels=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 8).astype(np.float32))
    KRT = jnp.asarray(np.stack([camera_ring["KRT"][0]] * 2))
    oKRT = jnp.asarray(np.stack([camera_ring["KRT"][1]] * 2))
    variables = model.init(jax.random.PRNGKey(0), KRT, oKRT, x)
    out = model.apply(variables, KRT, oKRT, x)
    assert out.shape == x.shape
    # hypernetwork actually conditions on geometry: different F -> different out
    oKRT2 = jnp.asarray(np.stack([camera_ring["KRT"][2]] * 2))
    out2 = model.apply(variables, KRT, oKRT2, x)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6
