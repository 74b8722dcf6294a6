"""Triangulation suite: exact recovery on a synthetic rig, robustness to
outliers, confidence gating, pymvg-DLT equivalence vs numpy SVD."""

import numpy as np
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.geometry import (
    dlt_triangulate,
    point_line_distances,
    triangulate_pymvg,
    triangulate_ransac,
    triangulate_refine,
)


def _project(KRTs, X):
    Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    x = np.einsum("vij,nj->vni", KRTs, Xh)
    return x[..., :2] / x[..., 2:]


def test_dlt_exact(camera_ring):
    rng = np.random.RandomState(0)
    X = rng.randn(17, 3) * 300 + [0, 0, 1000]
    pts = _project(camera_ring["KRT"], X)  # (V, J, 2)
    out = np.asarray(
        jax.vmap(lambda p: dlt_triangulate(p, jnp.asarray(camera_ring["KRT"])), in_axes=1)(
            jnp.asarray(pts)
        )
    )
    np.testing.assert_allclose(out, X, rtol=1e-4, atol=1e-3)


def test_dlt_matches_numpy_svd(camera_ring):
    """Hartley-Zisserman nullspace solution (multi_camera_system.py:208-225)."""
    X = np.array([[120.0, -40.0, 900.0]])
    pts = _project(camera_ring["KRT"], X)[:, 0]  # (V, 2)
    A = []
    for v in range(4):
        P = camera_ring["KRT"][v]
        x, y = pts[v]
        A.append(x * P[2] - P[0])
        A.append(y * P[2] - P[1])
    _, _, vt = np.linalg.svd(np.array(A))
    gt = vt[-1, :3] / vt[-1, 3]
    out = np.asarray(dlt_triangulate(jnp.asarray(pts), jnp.asarray(camera_ring["KRT"])))
    np.testing.assert_allclose(out, gt, rtol=1e-6)


def test_dlt_masked_views_equivalent_to_dropped(camera_ring):
    X = np.array([[50.0, 20.0, 1100.0]])
    pts = _project(camera_ring["KRT"], X)[:, 0]
    noisy = pts.copy()
    noisy[3] += 500.0  # corrupt view 3, then mask it out
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    out = np.asarray(dlt_triangulate(jnp.asarray(noisy), jnp.asarray(camera_ring["KRT"]), w))
    out2 = np.asarray(
        dlt_triangulate(jnp.asarray(pts[:3]), jnp.asarray(camera_ring["KRT"][:3]))
    )
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-4)


def test_point_line_distance_zero_on_ray(camera_ring):
    X = np.array([[0.0, 100.0, 1000.0]])
    pts = _project(camera_ring["KRT"], X)[:, 0]
    d = np.asarray(
        point_line_distances(jnp.asarray(X[0]), jnp.asarray(pts), jnp.asarray(camera_ring["KRT"]))
    )
    np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_triangulate_pymvg(camera_ring):
    rng = np.random.RandomState(1)
    X = rng.randn(17, 3) * 250 + [0, 0, 1000]
    pts = _project(camera_ring["KRT"], X)
    confs = np.ones((4, 17), dtype=np.float32)
    out = np.asarray(
        triangulate_pymvg(
            jnp.asarray(pts), jnp.asarray(camera_ring["K"]), jnp.asarray(camera_ring["RT"]),
            jnp.asarray(confs), conf_thres=0.05,
        )
    )
    np.testing.assert_allclose(out, X, rtol=1e-4, atol=1e-2)


def test_triangulate_pymvg_adaptive_threshold(camera_ring):
    """Only 1 view above threshold -> decay threshold until 2 selected."""
    X = np.array([[0.0, 0.0, 1000.0]])
    pts = _project(camera_ring["KRT"], X)
    confs = np.array([[0.9], [0.04], [0.01], [0.01]], dtype=np.float32)
    out = np.asarray(
        triangulate_pymvg(
            jnp.asarray(pts), jnp.asarray(camera_ring["K"]), jnp.asarray(camera_ring["RT"]),
            jnp.asarray(confs), conf_thres=0.05,
        )
    )
    # views 0+1 get selected at thresh=0.0; exact recovery from two clean views
    np.testing.assert_allclose(out[0], X[0], atol=1e-2)


def test_triangulate_ransac_rejects_outlier(camera_ring):
    rng = np.random.RandomState(2)
    X = rng.randn(5, 3) * 200 + [0, 0, 1000]
    pts = _project(camera_ring["KRT"], X)
    pts[1] += 80.0  # view 1 is an outlier for every joint
    confs = np.ones((4, 5), dtype=np.float32)
    out = np.asarray(
        triangulate_ransac(
            jnp.asarray(pts), jnp.asarray(camera_ring["KRT"]), jnp.asarray(confs),
            jax.random.PRNGKey(0), conf_thres=0.05, ransac_thres=3.0,
        )
    )
    err = np.linalg.norm(out - X, axis=-1)
    assert err.max() < 5.0, err


def test_triangulate_ransac_too_few_views_gives_zero(camera_ring):
    X = np.array([[0.0, 0.0, 1000.0]])
    pts = _project(camera_ring["KRT"], X)
    confs = np.array([[0.9], [0.01], [0.01], [0.01]], dtype=np.float32)
    out = np.asarray(
        triangulate_ransac(
            jnp.asarray(pts), jnp.asarray(camera_ring["KRT"]), jnp.asarray(confs),
            jax.random.PRNGKey(0),
        )
    )
    np.testing.assert_allclose(out, 0.0)


def test_triangulate_refine_beats_pair_under_noise(camera_ring):
    rng = np.random.RandomState(3)
    X = rng.randn(8, 3) * 200 + [0, 0, 1000]
    pts = _project(camera_ring["KRT"], X) + rng.randn(4, 8, 2) * 0.5
    confs = np.ones((4, 8), dtype=np.float32)
    out = np.asarray(
        triangulate_refine(
            jnp.asarray(pts), jnp.asarray(camera_ring["KRT"]), jnp.asarray(confs),
            jax.random.PRNGKey(1), ransac_thres=10.0,
        )
    )
    err = np.linalg.norm(out - X, axis=-1)
    assert err.mean() < 10.0
