"""Geometric correctness of epipolar sample-location generation."""

import numpy as np
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.geometry import (
    denormalize_pixel,
    fundamental_matrix,
    pix2coord,
)
from epipolar_transformers_tpu.ops.epipolar_sampling import (
    EpipolarGeometry,
    epipolar_sample_locs,
    epipolar_sample_locs_batch,
)

GEOM = EpipolarGeometry(
    feat_h=16, feat_w=16, sample_size=16, downsample=4, resize=1.0, correct_normalize=True
)


def _image_coords(locs_norm, geom):
    """(K, H, W, 2) normalized -> full-res image coords."""
    pix = denormalize_pixel(jnp.asarray(locs_norm), geom.feat_h, geom.feat_w, correct=True)
    return np.asarray(pix2coord(pix, geom.downsample)) * geom.resize


def test_samples_lie_on_epipolar_line(camera_ring):
    P1 = jnp.asarray(camera_ring["KRT"][0])
    P2 = jnp.asarray(camera_ring["KRT"][1])
    locs = epipolar_sample_locs(P1, P2, GEOM)
    assert locs.shape == (16, 16, 16, 2)

    F = np.asarray(fundamental_matrix(P1, P2))
    Fn = F / np.linalg.norm(F)
    grid = GEOM.grid(np.float64)  # (3, HW) ref-view image coords

    img = _image_coords(locs, GEOM).reshape(16, -1, 2)  # (K, HW, 2)
    in_range = np.all(np.abs(np.asarray(locs).reshape(16, -1, 2)) <= 1.0, axis=-1)
    # at least some pixels must produce valid in-image epipolar samples
    assert in_range.sum() > 100

    x2 = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)  # (K, HW, 3)
    # line residual |x2^T F x1| for each sample vs its ref pixel
    resid = np.abs(np.einsum("kpi,ij,jp->kp", x2, Fn, grid))
    # normalize by line norm to get a distance-like quantity
    lines = np.einsum("ij,jp->ip", Fn, grid)  # (3, HW)
    scale = np.linalg.norm(lines[:2], axis=0)  # (HW,)
    dist = resid / (scale[None, :] + 1e-12)
    assert dist[in_range].max() < 1e-3, dist[in_range].max()


def test_samples_span_rectangle(camera_ring):
    """First/last sample sit on the image rectangle boundary (for valid lines)."""
    P1 = jnp.asarray(camera_ring["KRT"][0])
    P2 = jnp.asarray(camera_ring["KRT"][1])
    locs = np.asarray(epipolar_sample_locs(P1, P2, GEOM)).reshape(16, -1, 2)
    img = _image_coords(locs.reshape(16, 16, 16, 2), GEOM).reshape(16, -1, 2)
    valid = np.all(np.abs(locs) <= 1.0, axis=(0, 2))  # pixels whose whole line is valid
    assert valid.sum() > 50
    xmin, xmax, ymin, ymax = GEOM.xmin, GEOM.xmax, GEOM.ymin, GEOM.ymax
    for k in (0, 15):
        pts = img[k][valid]
        on_edge = (
            (np.abs(pts[:, 0] - xmin) < 1e-2)
            | (np.abs(pts[:, 0] - xmax) < 1e-2)
            | (np.abs(pts[:, 1] - ymin) < 1e-2)
            | (np.abs(pts[:, 1] - ymax) < 1e-2)
        )
        assert on_edge.all()


def test_uniform_spacing(camera_ring):
    P1 = jnp.asarray(camera_ring["KRT"][0])
    P2 = jnp.asarray(camera_ring["KRT"][2])
    locs = np.asarray(epipolar_sample_locs(P1, P2, GEOM))  # (K, H, W, 2)
    steps = np.diff(locs, axis=0)
    # consecutive step vectors identical along each line
    np.testing.assert_allclose(steps, np.broadcast_to(steps[:1], steps.shape), atol=1e-5)


def test_no_intersection_goes_out_of_range():
    """A line wholly outside the rectangle must give far out-of-range samples."""
    # camera 2 looks at a region whose epipolar lines miss the small
    # rectangle for extreme pixels; construct a degenerate case directly:
    # P2 projects everything far away by shifting the principal point.
    K1 = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    K2 = np.array([[100.0, 0, 1e6], [0, 100.0, 1e6], [0, 0, 1]])  # way off-image
    R = np.eye(3)
    P1 = K1 @ np.concatenate([R, [[0], [0], [1000.0]]], axis=1)
    P2 = K2 @ np.concatenate([R, [[10.0], [0], [1000.0]]], axis=1)
    locs = np.asarray(epipolar_sample_locs(jnp.asarray(P1), jnp.asarray(P2), GEOM))
    assert np.all(locs < -1.0)


def test_batch_matches_single(camera_ring):
    P1 = jnp.asarray(camera_ring["KRT"][:2])
    P2 = jnp.asarray(camera_ring["KRT"][1:3])
    batched = np.asarray(epipolar_sample_locs_batch(P1, P2, GEOM))
    for i in range(2):
        single = np.asarray(epipolar_sample_locs(P1[i], P2[i], GEOM))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_jit_and_grad_safe(camera_ring):
    """Sampling is jittable; stop_gradient-wrapped usage doesn't leak NaNs."""
    f = jax.jit(lambda a, b: epipolar_sample_locs(a, b, GEOM))
    locs = f(jnp.asarray(camera_ring["KRT"][0]), jnp.asarray(camera_ring["KRT"][3]))
    assert np.isfinite(np.asarray(locs)).all()
