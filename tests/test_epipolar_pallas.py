"""Fused Pallas attention kernel == two-pass oracle (interpret mode on CPU).

The Mosaic kernel (ops/epipolar_attention_pallas.py) fuses the whole
gather-free chunk body; on non-TPU backends it runs through the Pallas
interpreter, so these tests pin the kernel's math — profile construction,
zero-sentinel masking, prior handling, fusion — against the oracle
independently of the hardware.  TPU-side parity of the compiled kernel is
measured by scripts/bench_attn_pallas.py (f32 max err ~1e-6 on a v5e).
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
    epipolar_attention_pallas_batch,
    supports_pallas_attention,
)


def _batch_case(rng, B=2, K=8, H=6, W=5, C=4):
    feat1 = rng.randn(B, H, W, C).astype(np.float32)
    other1 = rng.randn(B, H, W, C).astype(np.float32)
    other2 = rng.randn(B, H, W, C).astype(np.float32)
    locs = (rng.rand(B, K, H, W, 2).astype(np.float32) * 2.6 - 1.3)
    return (jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
            jnp.asarray(locs))


def _oracle_batch(f1, o1, o2, locs, params, prior=None):
    if prior is None:
        return jax.vmap(
            lambda a, b, c, l: epipolar_attention(a, b, c, l, params)
        )(f1, o1, o2, locs)
    return jax.vmap(
        lambda a, b, c, l, p: epipolar_attention(a, b, c, l, params, p)
    )(f1, o1, o2, locs, prior)


@pytest.mark.parametrize("kw", [
    dict(attention="avg", similarity="dot"),
    dict(attention="avg", similarity="dot", softmax_enabled=False),
])
@pytest.mark.parametrize("q_block", [64, 3])
def test_pallas_matches_oracle(rng, kw, q_block):
    f1, o1, o2, locs = _batch_case(rng)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8), **kw)
    assert supports_pallas_attention(params)
    ref = _oracle_batch(f1, o1, o2, locs, params)
    got = epipolar_attention_pallas_batch(f1, o1, o2, locs, params,
                                          q_block=q_block)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_unsupported_configs():
    for kw in (dict(attention="max", similarity="cos"),
               dict(attention="avg", similarity="cos"),
               dict(attention="avg", similarity="dot", pooling=True)):
        assert not supports_pallas_attention(AttentionParams(**kw))


def test_pallas_with_priors(rng):
    f1, o1, o2, locs = _batch_case(rng)
    prior = jnp.asarray(rng.rand(2, 8, 6, 5).astype(np.float32) * 0.1)
    for priormul in (False, True):
        params = AttentionParams(attention="avg", similarity="dot",
                                 softmax_scale=1 / np.sqrt(8),
                                 priormul=priormul)
        ref = _oracle_batch(f1, o1, o2, locs, params, prior)
        got = epipolar_attention_pallas_batch(f1, o1, o2, locs, params, prior)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"priormul={priormul}")


def test_pallas_prior_similarity(rng):
    """similarity='prior': weights are the prior itself (epipolar.py:288-293)."""
    f1, o1, o2, locs = _batch_case(rng)
    prior = jnp.asarray(rng.rand(2, 8, 6, 5).astype(np.float32) * 0.1)
    params = AttentionParams(attention="avg", similarity="prior",
                             softmax_scale=1 / np.sqrt(8))
    ref = _oracle_batch(f1, o1, o2, locs, params, prior)
    got = epipolar_attention_pallas_batch(f1, o1, o2, locs, params, prior)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_all_out_of_range(rng):
    """Lines missing the rectangle: sim == 0 sentinel -> masked softmax ->
    exact-zero output (reference zero-padding semantics, epipolar.py:298)."""
    f1, o1, o2, _ = _batch_case(rng)
    locs = jnp.full((2, 8, 6, 5, 2), -9.0)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    out, _, _ = epipolar_attention_pallas_batch(f1, o1, o2, locs, params)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_pallas_real_geometry_locs(rng, camera_ring):
    """Parity on sample locations produced by the actual epipolar geometry
    (two synthetic cameras), including partially-clipped lines."""
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
    o1 = jnp.asarray(rng.randn(1, H, W, 8).astype(np.float32))
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=0.25)
    ref = _oracle_batch(f1, o1, o1, locs, params)
    got = epipolar_attention_pallas_batch(f1, o1, o1, locs, params)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)
