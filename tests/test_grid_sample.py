"""grid_sample parity vs torch.nn.functional.grid_sample (the oracle the
reference's epipolar layer depends on — align_corners=True, zero padding)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from epipolar_transformers_tpu.ops import grid_sample_2d, grid_sample_nhwc


def _torch_grid_sample(img_nchw, grid, align_corners):
    with torch.no_grad():
        out = torch.nn.functional.grid_sample(
            torch.from_numpy(img_nchw),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=align_corners,
        )
    return out.numpy()


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(rng, align_corners):
    N, H, W, C = 2, 9, 13, 5
    img = rng.randn(N, H, W, C).astype(np.float32)
    # cover interior, edges, and far out-of-range samples
    grid = (rng.rand(N, 6, 7, 2).astype(np.float32) * 3.0 - 1.5)
    ours = np.asarray(grid_sample_nhwc(jnp.asarray(img), jnp.asarray(grid), align_corners))
    ref = _torch_grid_sample(img.transpose(0, 3, 1, 2), grid, align_corners)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5)


def test_grid_sample_exact_pixels(rng):
    """Sampling exactly at pixel centers reproduces the image (align_corners=True)."""
    H, W, C = 8, 6, 3
    img = rng.randn(H, W, C).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = 2 * xs / (W - 1) - 1
    gy = 2 * ys / (H - 1) - 1
    grid = np.stack([gx, gy], axis=-1).astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)


def test_grid_sample_out_of_range_is_zero(rng):
    img = rng.rand(4, 4, 2).astype(np.float32) + 1.0  # strictly positive
    grid = np.array([[[-5.0, -5.0], [5.0, 5.0], [0.0, 5.0]]], dtype=np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, 0.0)


def test_grid_sample_gradient_flows(rng):
    import jax

    img = jnp.asarray(rng.randn(5, 5, 2).astype(np.float32))
    grid = jnp.asarray(rng.rand(3, 2).astype(np.float32) * 1.6 - 0.8)

    g = jax.grad(lambda im: jnp.sum(grid_sample_2d(im, grid) ** 2))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
