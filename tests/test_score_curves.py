"""Matching-score curve tooling (reference scripts/hm36_visualization.py
analog): rgb/feature matching curves along an epipolar line + headless panel
rendering."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
matplotlib = pytest.importorskip("matplotlib")

from epipolar_transformers_tpu.vis.score_curves import (
    draw_score_panel,
    rgb_matching_scores,
    score_curves,
)


def _fake_dump(rng, K=16, h=16, w=16):
    # sample locs: horizontal lines at each pixel's own y
    ys = np.linspace(-1, 1, h)
    sample_locs = np.zeros((K, h, w, 2), np.float32)
    sample_locs[..., 0] = np.linspace(-1, 1, K)[:, None, None]
    sample_locs[..., 1] = ys[None, :, None]
    return {
        "sample_locs": sample_locs,
        "attention": np.abs(rng.rand(1, K, h, w)).astype(np.float32),
        "corr_pos": (rng.rand(1, h, w, 2) * 60).astype(np.float32),
    }


def test_rgb_matching_scores_peaks_on_matching_color(rng):
    H = W = 64
    img_ref = np.zeros((H, W, 3), np.uint8)
    img_other = np.zeros((H, W, 3), np.uint8)
    img_ref[:, :] = (200, 30, 40)            # reddish query point
    img_other[:, :] = (30, 200, 40)          # green everywhere...
    img_other[:, 40:48] = (200, 30, 40)      # ...except a red stripe
    K, h, w = 16, 16, 16
    sample_locs = np.zeros((K, h, w, 2), np.float32)
    sample_locs[..., 0] = np.linspace(-1, 1, K)[:, None, None]
    out = rgb_matching_scores(img_ref, img_other, sample_locs, 32.0, 32.0,
                              downsample=4)
    assert out["scores"].shape == (K,)
    # argmax lands inside the red stripe
    assert 40 <= out["argmax_xy"][0] < 48


def test_score_curves_shapes(rng):
    dump = _fake_dump(rng)
    curves = score_curves(dump, x=30.0, y=30.0, downsample=4)
    assert curves["feat_matching"].shape == (16,)
    assert "corr_xy" in curves
    baseline = _fake_dump(rng)
    curves2 = score_curves(dump, 30.0, 30.0, baseline_dump=baseline)
    assert curves2["baseline_matching"].shape == (16,)


def test_draw_score_panel_writes_png(tmp_path, rng):
    dump = _fake_dump(rng)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    path = draw_score_panel(
        dump, 30.0, 30.0, str(tmp_path / "panel.png"),
        img_ref=img, img_other=img, baseline_dump=_fake_dump(rng))
    assert os.path.exists(path) and os.path.getsize(path) > 1000
