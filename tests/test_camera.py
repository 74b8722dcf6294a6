"""Golden tests for geometry/camera.py vs numpy linear algebra + the
reference's own __main__ fixture (vision/multiview.py:194-208)."""

import numpy as np
import jax.numpy as jnp

from epipolar_transformers_tpu.geometry import (
    camera_center,
    camera_center_h,
    coord2pix,
    crossmat,
    denormalize_pixel,
    fundamental_matrix,
    neighbor_cameras,
    normalize_pixel,
    pix2coord,
    project_point_radial,
)


def test_camera_center(camera_ring):
    # centers recovered from KRT must equal the construction centers
    c = np.asarray(camera_center(jnp.asarray(camera_ring["KRT"])))
    np.testing.assert_allclose(c, camera_ring["T"], rtol=1e-5, atol=1e-6)


def test_camera_center_h(camera_ring):
    ch = np.asarray(camera_center_h(jnp.asarray(camera_ring["KRT"])))
    assert ch.shape == (4, 4)
    np.testing.assert_allclose(ch[:, 3], 1.0)


def test_crossmat():
    v = np.array([1.0, 2.0, 3.0])
    M = np.asarray(crossmat(jnp.asarray(v)))
    w = np.array([0.4, -0.2, 0.9])
    np.testing.assert_allclose(M @ w, np.cross(v, w), rtol=1e-6)
    # batched
    vs = np.random.RandomState(0).randn(5, 3)
    Ms = np.asarray(crossmat(jnp.asarray(vs)))
    for i in range(5):
        np.testing.assert_allclose(Ms[i], np.asarray(crossmat(jnp.asarray(vs[i]))))


def test_fundamental_matrix_epipolar_constraint(camera_ring):
    """x2^T F x1 == 0 for projections of the same world point."""
    KRT = camera_ring["KRT"]
    P1, P2 = KRT[0], KRT[1]
    F = np.asarray(fundamental_matrix(jnp.asarray(P1), jnp.asarray(P2)))
    rng = np.random.RandomState(1)
    X = np.concatenate([rng.randn(10, 3) * 300 + [0, 0, 1000], np.ones((10, 1))], axis=1)
    x1 = (P1 @ X.T).T
    x2 = (P2 @ X.T).T
    x1 /= x1[:, 2:]
    x2 /= x2[:, 2:]
    # scale-normalize the residual by ||F||
    resid = np.abs(np.einsum("ni,ij,nj->n", x2, F / np.linalg.norm(F), x1))
    assert resid.max() < 1e-6


def test_fundamental_matrix_vs_numpy_formula():
    """Cross-check vs the reference's numpy formula (vision/multiview.py:125-147).

    (The reference's own __main__ fixture P1 = R @ ones((3,4)) is rank-1 and
    degenerate — use a well-posed random pair instead.)
    """
    rng = np.random.RandomState(7)
    P1 = rng.randn(3, 4)
    P2 = rng.randn(3, 4)
    # numpy ground truth: F = [e2]_x P2 P1^+
    P1inv = P1.T @ np.linalg.inv(P1 @ P1.T)
    C = -np.linalg.inv(P1[:, :3]) @ P1[:, 3]
    e2 = P2 @ np.append(C, 1.0)
    e2x = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]], [-e2[1], e2[0], 0]])
    F_np = e2x @ (P2 @ P1inv)
    F_jax = np.asarray(fundamental_matrix(jnp.asarray(P1), jnp.asarray(P2)))
    np.testing.assert_allclose(F_jax, F_np, rtol=1e-5, atol=1e-8)


def test_pix_coord_roundtrip():
    x = jnp.linspace(0, 63, 64)
    for d in (2, 4, 8):
        np.testing.assert_allclose(coord2pix(pix2coord(x, d), d), x, atol=1e-6)
    # convention: pixel 0 at stride 4 -> image coordinate 1.5
    assert float(pix2coord(jnp.asarray(0.0), 4)) == 1.5


def test_normalize_pixel_correct_and_legacy():
    pts = jnp.asarray([[0.0, 0.0], [63.0, 31.0]])
    n = np.asarray(normalize_pixel(pts, H=32, W=64, correct=True))
    np.testing.assert_allclose(n[0], [-1.0, -1.0])
    np.testing.assert_allclose(n[1], [1.0, 1.0])
    d = np.asarray(denormalize_pixel(jnp.asarray(n), H=32, W=64, correct=True))
    np.testing.assert_allclose(d, np.asarray(pts), atol=1e-6)
    # legacy variant: x_norm = 2(x+0.5)/W - 1
    nl = np.asarray(normalize_pixel(pts, H=32, W=64, correct=False))
    np.testing.assert_allclose(nl[0], [-1.0 + 1.0 / 64, -1.0 + 1.0 / 32])
    dl = np.asarray(denormalize_pixel(jnp.asarray(nl), H=32, W=64, correct=False))
    np.testing.assert_allclose(dl, np.asarray(pts), atol=1e-6)


def test_neighbor_cameras(camera_ring):
    d = {i: camera_ring["KRT"][i] for i in range(4)}
    rank = neighbor_cameras(d)
    assert set(rank.keys()) == {0, 1, 2, 3}
    for k, (order, dists) in rank.items():
        assert k not in order
        assert len(order) == 3
        assert np.all(np.diff(dists) >= 0)
    # ring geometry: opposite camera is farthest
    assert rank[0][0][-1] == 2


def test_project_point_radial_no_distortion(camera_ring):
    """With zero distortion, project_point_radial == pinhole K projection."""
    K, R, T = camera_ring["K"][0], camera_ring["R"][0], camera_ring["T"][0]
    rng = np.random.RandomState(2)
    X = rng.randn(6, 3) * 200 + [0, 0, 1000]
    f = K[0, 0]
    c = K[:2, 2]
    proj = np.asarray(
        project_point_radial(X, f, c, np.zeros(3), np.zeros(2), R=R, T=T.reshape(3, 1))
    )
    Xh = np.concatenate([X, np.ones((6, 1))], axis=1)
    pin = (camera_ring["KRT"][0] @ Xh.T).T
    pin = pin[:, :2] / pin[:, 2:]
    np.testing.assert_allclose(proj, pin, rtol=1e-5)
