"""Native data-path kernels: build + parity vs cv2/numpy references."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from epipolar_transformers_tpu.runtime import loader
from epipolar_transformers_tpu.data.transforms.affine import get_affine_transform
from epipolar_transformers_tpu.ops.heatmap import render_gaussian_heatmaps


def test_native_lib_builds():
    lib = loader.get_lib()
    # even if the toolchain is missing the API must still work via fallback,
    # but on this image g++ exists so the .so should build
    assert lib is not None


def test_warp_affine_matches_cv2(rng):
    src = rng.rand(50, 40, 3).astype(np.float32)
    trans = get_affine_transform(np.array([20.0, 25.0]), np.array([0.2, 0.25]), 15.0, (32, 32))
    ours = loader.warp_affine(src, trans, (32, 32))
    ref = cv2.warpAffine(src, trans.astype(np.float64), (32, 32), flags=cv2.INTER_LINEAR)
    # identical bilinear math; border handling equal (zeros)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_warp_affine_identity(rng):
    src = rng.rand(16, 16).astype(np.float32)
    trans = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = loader.warp_affine(src, trans, (16, 16))
    np.testing.assert_allclose(out, src, atol=1e-6)


def test_render_heatmaps_matches_reference_op(rng):
    import jax.numpy as jnp

    coords = rng.rand(6, 2).astype(np.float32) * 60
    vis = np.array([1, 1, 0, 1, 1, 1], np.float32)
    ours = loader.render_heatmaps(coords, (16, 16), 2.0, 4.0, vis)
    ref = np.asarray(
        render_gaussian_heatmaps(jnp.asarray(coords), (16, 16), 2.0, 4, jnp.asarray(vis))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_remap_matches_cv2(rng):
    src = rng.rand(30, 30, 3).astype(np.float32)
    mx = (rng.rand(20, 20) * 32 - 1).astype(np.float32)
    my = (rng.rand(20, 20) * 32 - 1).astype(np.float32)
    ours = loader.remap(src, mx, my)
    ref = cv2.remap(src, mx, my, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
    np.testing.assert_allclose(ours, ref, atol=2e-3)
