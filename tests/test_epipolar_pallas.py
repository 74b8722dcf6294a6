"""Fused Pallas attention kernel == two-pass oracle (interpret mode on CPU).

The kernel itself runs compiled on TPU; these tests exercise the identical
kernel body through the Pallas interpreter, so every index/layout decision
is validated without hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.ops.epipolar_attention import (
    AttentionParams,
    epipolar_attention,
)
from epipolar_transformers_tpu.ops.epipolar_attention_pallas import (
    epipolar_attention_pallas,
    supports_pallas_attention,
)


def _batch(rng, N=2, K=8, H=8, W=8, C=16):
    feat1 = rng.randn(N, H, W, C).astype(np.float32)
    other = rng.randn(N, H, W, C).astype(np.float32)
    locs = (rng.rand(N, K, H, W, 2).astype(np.float32) * 2.6 - 1.3)
    return jnp.asarray(feat1), jnp.asarray(other), jnp.asarray(locs)


@pytest.mark.parametrize("profile_mode", ["tent", "slots"])
@pytest.mark.parametrize("softmax_enabled", [True, False])
def test_pallas_matches_oracle(rng, softmax_enabled, profile_mode):
    f1, f2, locs = _batch(rng)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8),
                             softmax_enabled=softmax_enabled)
    assert supports_pallas_attention(params, shared_kv=True, has_prior=False,
                                     n_queries=64)
    out, corr, depth = epipolar_attention_pallas(
        f1, f2, locs, params, interpret=True, profile_mode=profile_mode)
    for n in range(f1.shape[0]):
        r_out, r_corr, r_depth = epipolar_attention(
            f1[n], f2[n], f2[n], locs[n], params)
        np.testing.assert_allclose(np.asarray(out[n]), np.asarray(r_out),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(corr[n]), np.asarray(r_corr),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth[n]), np.asarray(r_depth),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("profile_mode", ["tent", "slots"])
def test_pallas_real_geometry(rng, camera_ring, profile_mode):
    """Parity on real epipolar-geometry sample locations (clipped lines,
    out-of-range sentinels)."""
    from epipolar_transformers_tpu.ops.epipolar_sampling import (
        EpipolarGeometry, epipolar_sample_locs,
    )

    H = W = 16
    P1 = jnp.asarray(camera_ring["KRT"][0])
    P2 = jnp.asarray(camera_ring["KRT"][1])
    geom = EpipolarGeometry(feat_h=H, feat_w=W, sample_size=16, downsample=4,
                            resize=1.0, correct_normalize=True)
    locs = epipolar_sample_locs(P1, P2, geom).astype(jnp.float32)[None]
    f1 = jnp.asarray(rng.randn(1, H, W, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, H, W, 8).astype(np.float32))
    params = AttentionParams(softmax_scale=0.25)
    out, corr, depth = epipolar_attention_pallas(
        f1, f2, locs, params, interpret=True, profile_mode=profile_mode)
    r_out, r_corr, r_depth = epipolar_attention(f1[0], f2[0], f2[0], locs[0],
                                                params)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(r_out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth[0]), np.asarray(r_depth),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(corr[0]), np.asarray(r_corr),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mxu_precision", ["highest", "default"])
def test_pallas_tent_precision_knob(rng, mxu_precision):
    """Both mxu_precision settings trace/run (the interpreter computes f32
    either way; on hardware 'default' lets the heavy contractions round to
    bf16 while the coordinate-broadcast dots stay exact — see the module
    docstring and scripts/probe_pallas_stages.py)."""
    f1, f2, locs = _batch(rng, N=1)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8))
    out, _, depth = epipolar_attention_pallas(
        f1, f2, locs, params, interpret=True, profile_mode="tent",
        mxu_precision=mxu_precision)
    r_out, _, r_depth = epipolar_attention(f1[0], f2[0], f2[0], locs[0],
                                           params)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(r_out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth[0]), np.asarray(r_depth),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("profile_mode", ["tent", "slots"])
def test_pallas_all_out_of_range(rng, profile_mode):
    f1, f2, _ = _batch(rng, N=1)
    locs = jnp.full((1, 8, 8, 8, 2), -9.0)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8))
    out, _, _ = epipolar_attention_pallas(f1, f2, locs, params,
                                          interpret=True,
                                          profile_mode=profile_mode)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
