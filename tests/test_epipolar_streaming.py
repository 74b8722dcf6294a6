"""Streaming (online-softmax) attention == two-pass reference implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.ops.epipolar_attention import (
    AttentionParams,
    epipolar_attention,
)
from epipolar_transformers_tpu.ops.epipolar_attention_streaming import (
    epipolar_attention_streaming,
    reconstruct_depth,
)


def _case(rng, K=8, H=6, W=5, C=4):
    feat1 = rng.randn(H, W, C).astype(np.float32)
    other1 = rng.randn(H, W, C).astype(np.float32)
    other2 = rng.randn(H, W, C).astype(np.float32)
    locs = (rng.rand(K, H, W, 2).astype(np.float32) * 2.6 - 1.3)
    return (jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
            jnp.asarray(locs))


CASES = [
    dict(attention="avg", similarity="dot"),
    dict(attention="avg", similarity="cos"),
    dict(attention="avg", similarity="dot", softmax_enabled=False),
    dict(attention="avg", similarity="dot", pooling=True),
    dict(attention="max"),
]


@pytest.mark.parametrize("kw", CASES)
def test_streaming_matches_reference(rng, kw):
    f1, o1, o2, locs = _case(rng)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8), **kw)
    ref_out, ref_corr, ref_depth = epipolar_attention(f1, o1, o2, locs, params)
    out, corr, stats = epipolar_attention_streaming(f1, o1, o2, locs, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(ref_corr),
                               rtol=1e-4, atol=1e-5)
    depth = reconstruct_depth(f1, o1, locs, params, stats)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               rtol=1e-4, atol=1e-5)


def test_streaming_shared_kv(rng):
    f1, o1, _, locs = _case(rng)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    ref_out, _, _ = epipolar_attention(f1, o1, o1, locs, params)
    out, _, _ = epipolar_attention_streaming(f1, o1, o1, locs, params,
                                             shared_kv=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)


def test_streaming_with_priors(rng):
    f1, o1, o2, locs = _case(rng)
    prior = jnp.asarray(rng.rand(8, 6, 5).astype(np.float32) * 0.1)
    for priormul in (False, True):
        params = AttentionParams(attention="avg", similarity="dot",
                                 softmax_scale=1 / np.sqrt(8), priormul=priormul)
        ref_out, ref_corr, ref_depth = epipolar_attention(f1, o1, o2, locs,
                                                          params, prior)
        out, corr, stats = epipolar_attention_streaming(f1, o1, o2, locs,
                                                        params, prior)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-4, atol=1e-5, err_msg=f"priormul={priormul}")
        depth = reconstruct_depth(f1, o1, locs, params, stats, prior)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                                   rtol=1e-4, atol=1e-5)


def test_streaming_all_out_of_range(rng):
    f1, o1, o2, _ = _case(rng)
    locs = jnp.full((8, 6, 5, 2), -9.0)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    out, _, _ = epipolar_attention_streaming(f1, o1, o2, locs, params)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_streaming_gradients_match(rng):
    f1, o1, o2, locs = _case(rng)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))

    def loss(fn, *args):
        out, _, _ = fn(*args, locs, params)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(lambda a, b, c: loss(epipolar_attention, a, b, c),
                     argnums=(0, 1, 2))(f1, o1, o2)
    g_str = jax.grad(lambda a, b, c: loss(epipolar_attention_streaming, a, b, c),
                     argnums=(0, 1, 2))(f1, o1, o2)
    for a, b in zip(g_ref, g_str):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-4)
