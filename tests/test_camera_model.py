"""CameraModel / MultiCameraSystem: RQ decomposition, distortion round trips,
projection consistency, DLT."""

import numpy as np
import pytest

from epipolar_transformers_tpu.geometry.camera_model import (
    CameraModel,
    MultiCameraSystem,
    rq_decomposition,
)
from tests.conftest import make_camera_ring


def test_rq_decomposition(rng):
    # build a known K (upper triangular, positive diag) and rotation Q
    K = np.array([[500.0, 2.0, 320.0], [0, 510.0, 240.0], [0, 0, 1.0]])
    ang = 0.4
    Q = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    M = K @ Q
    K2, Q2 = rq_decomposition(M)
    np.testing.assert_allclose(K2, K, atol=1e-8)
    np.testing.assert_allclose(Q2, Q, atol=1e-8)


def test_from_M_roundtrip(camera_ring):
    M = camera_ring["KRT"][0]
    cam = CameraModel.from_M(M)
    np.testing.assert_allclose(cam.get_M() / cam.get_M()[2, 2] * M[2, 2], M,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(cam.center(), camera_ring["T"][0], atol=1e-5)


def test_distort_undistort_roundtrip(rng):
    K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1]])
    cam = CameraModel(K, np.eye(3), np.zeros(3),
                      distortion=[-0.2, 0.05, 0.001, -0.002, 0.0])
    pts = rng.rand(20, 2) * [320, 240]
    distorted = cam.distort(pts)
    recovered = cam.undistort(distorted)
    np.testing.assert_allclose(recovered, pts, atol=1e-3)


def test_undistort_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1]])
    D = np.array([-0.2, 0.05, 0.001, -0.002, 0.0])
    cam = CameraModel(K, np.eye(3), np.zeros(3), distortion=D)
    pts = rng.rand(10, 2) * [320, 240]
    ours = cam.undistort(pts)
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, D, P=K).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_project_and_ray_consistency(camera_ring):
    cam = CameraModel.from_KRt(
        camera_ring["K"][0], camera_ring["R"][0],
        -camera_ring["R"][0] @ camera_ring["T"][0],
    )
    X = np.array([[100.0, -50.0, 1000.0]])
    pix = cam.project_3d_to_pixel(X)
    d, c = cam.project_pixel_to_3d_ray(pix)
    # the ray from the center through the pixel passes through X
    to_X = (X[0] - c) / np.linalg.norm(X[0] - c)
    np.testing.assert_allclose(np.abs(d[0] @ to_X), 1.0, atol=1e-8)


def test_multi_camera_system_find3d_find2d(camera_ring):
    cams = [
        CameraModel.from_KRt(camera_ring["K"][v], camera_ring["R"][v],
                             -camera_ring["R"][v] @ camera_ring["T"][v],
                             name=str(v))
        for v in range(4)
    ]
    sys = MultiCameraSystem(cams)
    X = np.array([25.0, -60.0, 980.0])
    obs = [(str(v), sys.find2d(str(v), X)) for v in range(4)]
    rec = sys.find3d(obs)
    np.testing.assert_allclose(rec, X, atol=1e-6)
