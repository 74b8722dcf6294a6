"""Gram-matrix fast attention path == reference scan implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.ops.epipolar_attention import (
    AttentionParams,
    epipolar_attention,
)
from epipolar_transformers_tpu.ops.epipolar_attention_fast import (
    epipolar_attention_fast,
)


def _case(rng, K=8, H=6, W=5, C=4):
    feat1 = rng.randn(H, W, C).astype(np.float32)
    other1 = rng.randn(H, W, C).astype(np.float32)
    other2 = rng.randn(H, W, C).astype(np.float32)
    locs = (rng.rand(K, H, W, 2).astype(np.float32) * 2.6 - 1.3)
    return feat1, other1, other2, locs


def test_fast_matches_reference(rng):
    feat1, other1, other2, locs = _case(rng)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    ref = epipolar_attention(jnp.asarray(feat1), jnp.asarray(other1),
                             jnp.asarray(other2), jnp.asarray(locs), params)
    fast = epipolar_attention_fast(jnp.asarray(feat1), jnp.asarray(other1),
                                   jnp.asarray(other2), jnp.asarray(locs), params)
    for a, b, name in zip(ref, fast, ("out", "corr_pos", "depth")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=name)


def test_fast_with_prior(rng):
    feat1, other1, other2, locs = _case(rng)
    prior = rng.rand(8, 6, 5).astype(np.float32) * 0.1
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    ref = epipolar_attention(jnp.asarray(feat1), jnp.asarray(other1),
                             jnp.asarray(other2), jnp.asarray(locs), params,
                             jnp.asarray(prior))
    fast = epipolar_attention_fast(jnp.asarray(feat1), jnp.asarray(other1),
                                   jnp.asarray(other2), jnp.asarray(locs),
                                   params, jnp.asarray(prior))
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(fast[0]),
                               rtol=2e-4, atol=2e-5)


def test_fast_all_out_of_range(rng):
    feat1, other1, other2, _ = _case(rng)
    locs = np.full((8, 6, 5, 2), -9.0, dtype=np.float32)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    out, _, _ = epipolar_attention_fast(
        jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
        jnp.asarray(locs), params)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_fast_gradients(rng):
    feat1, other1, other2, locs = _case(rng)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))

    def loss_fast(f1, o1, o2):
        out, _, _ = epipolar_attention_fast(f1, o1, o2, jnp.asarray(locs), params)
        return jnp.sum(out ** 2)

    def loss_ref(f1, o1, o2):
        out, _, _ = epipolar_attention(f1, o1, o2, jnp.asarray(locs), params)
        return jnp.sum(out ** 2)

    args = (jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2))
    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
