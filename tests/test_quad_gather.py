"""Quad-gather bilinear sampling == grid_sample_2d (torch semantics oracle)."""

import numpy as np
import jax.numpy as jnp

from epipolar_transformers_tpu.ops.grid_sample import grid_sample_2d
from epipolar_transformers_tpu.ops.quad_gather import build_quad, quad_sample_normalized


def test_quad_matches_grid_sample_interior_and_edges(rng):
    H, W, C = 9, 7, 5
    img = rng.randn(H, W, C).astype(np.float32)
    quad = build_quad(jnp.asarray(img))
    # dense sweep including just-outside-range and exactly-on-edge samples
    gx = np.linspace(-1.4, 1.4, 41)
    gy = np.linspace(-1.4, 1.4, 37)
    GX, GY = np.meshgrid(gx, gy)
    grid = np.stack([GX, GY], axis=-1).astype(np.float32)
    ref = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    out = np.asarray(quad_sample_normalized(quad, jnp.asarray(grid), H, W))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_quad_low_edge_exactness(rng):
    """floor(x) == -1 exercises the slot-shift path."""
    H = W = 4
    img = rng.randn(H, W, 2).astype(np.float32)
    quad = build_quad(jnp.asarray(img))
    # normalized coords putting pixel x in (-1, 0): e.g. x_pix = -0.25
    x_pix, y_pix = -0.25, -0.75
    gx = 2 * x_pix / (W - 1) - 1
    gy = 2 * y_pix / (H - 1) - 1
    grid = np.array([[gx, gy]], dtype=np.float32)
    ref = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    out = np.asarray(quad_sample_normalized(quad, jnp.asarray(grid), H, W))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)
    # hand value: only corner (0, 0) is valid, weight = frac_x * frac_y
    expected = img[0, 0] * 0.75 * 0.25
    np.testing.assert_allclose(out[0], expected, rtol=1e-5)
