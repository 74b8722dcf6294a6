"""Small support utils: depth IO, KRT files, k-means quantization,
normalized-affine builders, frustum geometry, TB writer."""

import numpy as np
import pytest
import jax.numpy as jnp

from epipolar_transformers_tpu.geometry.affine_utils import (
    apply_theta,
    compose,
    crop2affine,
    identity_theta,
    mirror2affine,
    rotate2affine,
    solve_theta,
)
from epipolar_transformers_tpu.utils.clustering import kmeans, quantize_image
from epipolar_transformers_tpu.utils.depth_io import rhd_depth_decode
from epipolar_transformers_tpu.utils.file_utils import load_krt, save_krt
from epipolar_transformers_tpu.utils.metric_logger import TensorboardWriter
from epipolar_transformers_tpu.vis.ipv_vis import camera_frustum_lines, plot_scene


def test_affine_builders(rng):
    pts = jnp.asarray(rng.rand(5, 2).astype(np.float32) * 2 - 1)
    np.testing.assert_allclose(np.asarray(apply_theta(identity_theta(), pts)),
                               np.asarray(pts), atol=1e-6)
    m = mirror2affine()
    out = np.asarray(apply_theta(m, pts))
    np.testing.assert_allclose(out[:, 0], -np.asarray(pts)[:, 0], atol=1e-6)
    r = rotate2affine(np.pi / 2)
    out = np.asarray(apply_theta(r, jnp.asarray([[1.0, 0.0]])))
    np.testing.assert_allclose(out[0], [0.0, 1.0], atol=1e-6)
    # crop box maps output corners to box corners
    box = crop2affine((-0.5, -0.25, 0.5, 0.75))
    out = np.asarray(apply_theta(box, jnp.asarray([[-1.0, -1.0], [1.0, 1.0]])))
    np.testing.assert_allclose(out, [[-0.5, -0.25], [0.5, 0.75]], atol=1e-6)


def test_solve_theta_roundtrip(rng):
    theta = jnp.asarray(np.array([[0.8, -0.2, 0.1], [0.3, 1.1, -0.4]], np.float32))
    src = jnp.asarray(rng.rand(10, 2).astype(np.float32))
    dst = apply_theta(theta, src)
    est = solve_theta(src, dst)
    np.testing.assert_allclose(np.asarray(est), np.asarray(theta), atol=1e-4)
    comp = compose(identity_theta(), theta)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(theta), atol=1e-6)


def test_krt_file_roundtrip(tmp_path, rng):
    cams = {
        "cam0": {"K": rng.rand(3, 3), "RT": rng.rand(3, 4)},
        "cam1": {"K": rng.rand(3, 3), "RT": rng.rand(3, 4)},
    }
    p = tmp_path / "krt.txt"
    save_krt(str(p), cams)
    loaded = load_krt(str(p))
    assert set(loaded) == {"cam0", "cam1"}
    np.testing.assert_allclose(loaded["cam0"]["K"], cams["cam0"]["K"], rtol=1e-8)
    np.testing.assert_allclose(loaded["cam1"]["KRT"],
                               cams["cam1"]["K"] @ cams["cam1"]["RT"], rtol=1e-8)


def test_kmeans_and_quantize(rng):
    data = np.concatenate([rng.randn(50, 2) + 5, rng.randn(50, 2) - 5])
    cents, labels = kmeans(data, 2, seed=0)
    assert cents.shape == (2, 2)
    assert len(set(labels[:50])) == 1 and len(set(labels[50:])) == 1
    img = rng.rand(8, 8, 3).astype(np.float32)
    q = quantize_image(img, k=4)
    assert q.shape == img.shape
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 4


def test_rhd_depth_decode():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0, 0] = 1  # top byte
    rgb[0, 0, 1] = 4  # bottom byte
    d = rhd_depth_decode(rgb)
    assert d[0, 0] == pytest.approx((256 + 4) / 65535.0)


def test_frustum_and_scene(camera_ring):
    lines = camera_frustum_lines(camera_ring["K"][0], camera_ring["R"][0],
                                 camera_ring["T"][0])
    assert lines.shape == (8, 2, 3)
    np.testing.assert_allclose(lines[0][0], camera_ring["T"][0])
    out = plot_scene(points3d=np.zeros((5, 3)),
                     cameras=[(camera_ring["K"][0], camera_ring["R"][0],
                               camera_ring["T"][0])])
    assert out["points"].shape == (5, 3)
    assert len(out["frusta"]) == 1


def test_tensorboard_writer(tmp_path):
    tb = TensorboardWriter(str(tmp_path), enabled=True)
    tb.write({"loss": 1.0}, step=1, tag="train")
    tb.close()
    import os

    assert any("tfevents" in f for f in os.listdir(tmp_path))
