"""Offline analysis scripts (reference scripts/post_visualization.py and
scripts/inspect_h36m_fusion.py analogs): headless smoke tests over
introspection-dump / checkpoint artifacts."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import post_visualization  # noqa: E402
import inspect_fusion  # noqa: E402


K, H, W = 8, 16, 16


@pytest.fixture
def dump(tmp_path):
    rng = np.random.RandomState(0)
    t = np.linspace(-1, 1, K)
    # a plausible line: the same (dx, dy) sweep at every ref pixel
    line = np.stack([t * 0.8, t * 0.3], axis=-1)  # (K, 2)
    locs = np.broadcast_to(line[:, None, None, :], (K, H, W, 2)).copy()
    d = {
        "sample_locs": locs.astype(np.float32),
        "attention": rng.rand(K, H, W).astype(np.float32),
        "corr_pos": rng.randint(0, W, size=(H, W, 2)).astype(np.float32),
        "img": rng.randint(0, 255, (H * 4, W * 4, 3), dtype=np.uint8),
        "other_img": rng.randint(0, 255, (H * 4, W * 4, 3), dtype=np.uint8),
    }
    path = tmp_path / "introspection.pkl"
    with open(path, "wb") as f:
        pickle.dump(d, f)
    return d, str(path)


def test_post_visualization_panel(dump, tmp_path):
    d, path = dump
    out = tmp_path / "panel.png"
    s = post_visualization.render_point_panel(d, 5, 7, str(out))
    assert out.exists() and out.stat().st_size > 0
    assert s["peak"] == pytest.approx(float(d["attention"][:, 7, 5].max()))
    assert "corr_xy" in s and "rgb_argmax_xy" in s


def test_post_visualization_cli_default_grid(dump, tmp_path):
    _, path = dump
    out_dir = tmp_path / "panels"
    post_visualization.main([path, str(out_dir)])
    pngs = [p for p in os.listdir(out_dir) if p.endswith(".png")]
    assert len(pngs) == 4  # the default 2x2 grid of query pixels


def test_post_visualization_without_images(tmp_path):
    """The keypoint-task SAVE_PRED/introspection dump may omit raw images;
    the panel must still render (feature-space only)."""
    rng = np.random.RandomState(1)
    d = {
        "sample_locs": rng.uniform(-1, 1, (2, K, H, W, 2)).astype(np.float32),
        "attention": rng.rand(2, K, H, W).astype(np.float32),
        "corr_pos": None,
    }
    out = tmp_path / "noimg.png"
    s = post_visualization.render_point_panel(d, 3, 3, str(out), item=1)
    assert out.exists()
    assert s["peak"] == pytest.approx(float(d["attention"][1][:, 3, 3].max()))


@pytest.fixture
def prior_checkpoint(tmp_path, camera_ring):
    """A real flax msgpack checkpoint holding an Epipolar prior table."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from epipolar_transformers_tpu.config import Config, update_from_dict
    from epipolar_transformers_tpu.models.epipolar import Epipolar

    cfg = update_from_dict(Config(), {
        "KEYPOINT": {"NFEATS": 8, "HEATMAP_SIZE": (H, W)},
        "BACKBONE": {"DOWNSAMPLE": 4},
        "DATASETS": {"CAMERAS": (0, 1, 2, 3)},
        "EPIPOLAR": {"SAMPLESIZE": K, "PRIOR": True, "SIMILARITY": "prior",
                     "PARAMETERIZED": (), "USE_CORRECT_NORMALIZE": True},
    })
    model = Epipolar(cfg)
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(2, H, W, 8).astype(np.float32))
    P = jnp.asarray(np.stack([camera_ring["KRT"][0]] * 2).astype(np.float32))
    P2 = jnp.asarray(np.stack([camera_ring["KRT"][1]] * 2).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feat, feat, P, P2,
                           camera=jnp.asarray([0, 1]),
                           other_camera=jnp.asarray([1, 0]), train=False)
    path = tmp_path / "model.ckpt"
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"])}))
    return str(path)


def test_inspect_fusion_finds_and_renders(prior_checkpoint, tmp_path):
    out_dir = tmp_path / "fusion"
    inspect_fusion.main([prior_checkpoint, str(out_dir)])
    pngs = [p for p in os.listdir(out_dir) if p.endswith(".png")]
    assert len(pngs) == 1  # one prior table, default center point


def test_inspect_fusion_with_geometry_dump(prior_checkpoint, dump, tmp_path):
    _, dump_path = dump
    out_dir = tmp_path / "fusion_geo"
    inspect_fusion.main([prior_checkpoint, str(out_dir),
                         "--points", "4,4", "8,8", "--dump", dump_path])
    pngs = sorted(p for p in os.listdir(out_dir) if p.endswith(".png"))
    assert len(pngs) == 2


def test_inspect_fusion_rejects_priorless_checkpoint(tmp_path):
    from flax import serialization

    path = tmp_path / "empty.ckpt"
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": {"conv": np.zeros((3, 3), np.float32)}}))
    with pytest.raises(SystemExit):
        inspect_fusion.main([str(path), str(tmp_path / "out")])
