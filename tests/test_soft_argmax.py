"""Soft-argmax peak decode: behavioral tests + torch-free golden checks
mirroring reference basic_batch.py:17-63 semantics."""

import numpy as np
import jax.numpy as jnp

from epipolar_transformers_tpu.ops import find_tensor_peak_batch, get_max_preds
from epipolar_transformers_tpu.ops.heatmap import render_gaussian_heatmaps
from epipolar_transformers_tpu.geometry import pix2coord


def test_peak_recovers_gaussian_center():
    H = W = 64
    downsample = 4
    sigma = 8.0
    # ground-truth keypoints in full-res image coords
    coords = np.array([[100.0, 60.0], [30.5, 200.0], [128.0, 128.0]])
    hm = np.asarray(
        render_gaussian_heatmaps(jnp.asarray(coords), (H, W), sigma, downsample)
    )
    locs, scores = find_tensor_peak_batch(jnp.asarray(hm), sigma, downsample)
    locs = np.asarray(locs)
    # sub-pixel recovery: peak decode should land within ~1.5 image px
    np.testing.assert_allclose(locs, coords, atol=1.5)
    assert np.all(np.asarray(scores) > 0.9)


def test_peak_at_image_corner():
    """Peak near the border: window clips to zeros outside; no NaNs."""
    H = W = 32
    hm = np.zeros((1, H, W), dtype=np.float32)
    hm[0, 0, 0] = 1.0
    locs, scores = find_tensor_peak_batch(jnp.asarray(hm), 4.0, 4)
    assert np.isfinite(np.asarray(locs)).all()
    # argmax pixel (0,0) -> image coords pix2coord(0,4)=1.5 plus centroid shift
    assert abs(float(locs[0, 0]) - pix2coord(0.0, 4)) < 4.0


def test_scores_are_max_values(rng):
    hm = rng.rand(5, 16, 16).astype(np.float32)
    _, scores = find_tensor_peak_batch(jnp.asarray(hm), 2.0, 4)
    np.testing.assert_allclose(np.asarray(scores), hm.reshape(5, -1).max(-1), rtol=1e-6)


def test_get_max_preds(rng):
    hm = rng.rand(2, 3, 8, 10).astype(np.float32)
    preds, maxvals = get_max_preds(hm)
    assert preds.shape == (2, 3, 2)
    for n in range(2):
        for j in range(3):
            idx = hm[n, j].argmax()
            assert preds[n, j, 0] == idx % 10
            assert preds[n, j, 1] == idx // 10
            assert maxvals[n, j, 0] == hm[n, j].max()


def test_heatmap_render_matches_reference_formula():
    """Exact-value check of the Gaussian render (keypoints2d.py:17-36)."""
    H, W, downsample, sigma = 16, 12, 4, 8.0
    coords = np.array([[20.0, 30.0]])
    hm = np.asarray(render_gaussian_heatmaps(jnp.asarray(coords), (H, W), sigma, downsample))
    sig = sigma * np.sqrt(2)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    gx = (xs * downsample + downsample / 2 - 0.5)
    gy = (ys * downsample + downsample / 2 - 0.5)
    d = ((gx - 20.0) ** 2 + (gy - 30.0) ** 2) / sig ** 2
    expected = np.exp(-np.clip(d, 0, 4.60517019))
    np.testing.assert_allclose(hm[0], expected, rtol=1e-4, atol=1e-5)

    # visibility masking zeroes the map
    hm2 = np.asarray(
        render_gaussian_heatmaps(
            jnp.asarray(coords), (H, W), sigma, downsample, visibility=jnp.asarray([0.0])
        )
    )
    np.testing.assert_allclose(hm2, 0.0)
