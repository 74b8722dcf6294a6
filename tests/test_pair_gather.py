"""Pair-row gather bilinear sampling == grid_sample_2d."""

import numpy as np
import jax.numpy as jnp

from epipolar_transformers_tpu.ops.grid_sample import grid_sample_2d
from epipolar_transformers_tpu.ops.quad_gather import build_pair, pair_sample_normalized


def test_pair_matches_grid_sample(rng):
    H, W, C = 9, 7, 5
    img = rng.randn(H, W, C).astype(np.float32)
    pair = build_pair(jnp.asarray(img))
    assert pair.shape == ((H + 1) * W, 2 * C)
    gx = np.linspace(-1.4, 1.4, 41)
    gy = np.linspace(-1.4, 1.4, 37)
    GX, GY = np.meshgrid(gx, gy)
    grid = np.stack([GX, GY], axis=-1).astype(np.float32)
    ref = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    out = np.asarray(pair_sample_normalized(pair, jnp.asarray(grid), H, W))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
