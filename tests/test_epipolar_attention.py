"""Epipolar attention core vs an independent dense torch oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from epipolar_transformers_tpu.ops.epipolar_attention import (
    AttentionParams,
    epipolar_attention,
)


def _dense_oracle(feat1, other1, other2, locs, attention, similarity,
                  softmax_enabled=True, pooling=False):
    """Dense torch implementation: materialize all K sampled maps, then
    similarity -> mask -> softmax(1/sqrt K) -> weighted sum.  Mirrors the
    reference math but written independently against torch primitives."""
    K, H, W, _ = locs.shape
    C = feat1.shape[-1]
    t = lambda x: torch.from_numpy(np.ascontiguousarray(x))
    with torch.no_grad():
        o1 = t(other1.transpose(2, 0, 1))[None].expand(K, -1, -1, -1)  # K,C,H,W
        o2 = t(other2.transpose(2, 0, 1))[None].expand(K, -1, -1, -1)
        g = t(locs)
        s1 = torch.nn.functional.grid_sample(o1, g, mode="bilinear",
                                             padding_mode="zeros", align_corners=True)
        s2 = torch.nn.functional.grid_sample(o2, g, mode="bilinear",
                                             padding_mode="zeros", align_corners=True)
        if pooling:
            Kp = K // 2
            s1 = s1.view(2, Kp, C, H, W).max(0)[0]
            s2 = s2.view(2, Kp, C, H, W).max(0)[0]
        f1 = t(feat1.transpose(2, 0, 1))[None]
        if attention == "max" or similarity == "cos":
            sim = torch.nn.functional.cosine_similarity(f1.expand_as(s1), s1, 1)
        else:
            sim = (s1 * f1).sum(1)
        if attention == "max":
            idx = sim.argmax(0)
            out = torch.gather(s2, 0, idx.view(1, 1, H, W).expand(1, C, -1, -1))[0]
            return out.numpy().transpose(1, 2, 0), sim.numpy()
        sim = sim.clone()
        sim[sim == 0] = -1e10
        if softmax_enabled:
            # reference scales by 1/sqrt(SAMPLESIZE) — the *configured* K,
            # not the pooled one (core/config.py:86, epipolar.py:306)
            w = torch.softmax(sim / K ** 0.5, 0)
        else:
            # ... but the non-softmax path divides by the pooled count
            # (epipolar.py:311: sampled_feat2.shape[0])
            w = sim / sim.shape[0]
        out = (s2 * w[:, None]).sum(0)
        return out.numpy().transpose(1, 2, 0), w.numpy()


def _random_case(rng, K=8, H=6, W=5, C=4):
    feat1 = rng.randn(H, W, C).astype(np.float32)
    other1 = rng.randn(H, W, C).astype(np.float32)
    other2 = rng.randn(H, W, C).astype(np.float32)
    # mix of valid and out-of-range sample lines
    locs = (rng.rand(K, H, W, 2).astype(np.float32) * 2.6 - 1.3)
    return feat1, other1, other2, locs


@pytest.mark.parametrize("similarity", ["dot", "cos"])
def test_avg_attention_matches_oracle(rng, similarity):
    feat1, other1, other2, locs = _random_case(rng)
    params = AttentionParams(attention="avg", similarity=similarity,
                             softmax_scale=1 / np.sqrt(locs.shape[0]))
    out, corr, depth = epipolar_attention(
        jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
        jnp.asarray(locs), params)
    ref_out, ref_w = _dense_oracle(feat1, other1, other2, locs, "avg", similarity)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), ref_w, rtol=1e-4, atol=1e-5)


def test_max_attention_matches_oracle(rng):
    feat1, other1, other2, locs = _random_case(rng)
    params = AttentionParams(attention="max")
    out, corr, depth = epipolar_attention(
        jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
        jnp.asarray(locs), params)
    ref_out, ref_sim = _dense_oracle(feat1, other1, other2, locs, "max", "cos")
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), ref_sim, rtol=1e-4, atol=1e-5)


def test_pooling_matches_oracle(rng):
    feat1, other1, other2, locs = _random_case(rng, K=8)
    params = AttentionParams(attention="avg", similarity="dot", pooling=True,
                             softmax_scale=1 / np.sqrt(8))
    out, _, depth = epipolar_attention(
        jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
        jnp.asarray(locs), params)
    ref_out, ref_w = _dense_oracle(feat1, other1, other2, locs, "avg", "dot",
                                   pooling=True)
    assert depth.shape[0] == 4
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-5)


def test_all_out_of_range_gives_zero_output(rng):
    feat1, other1, other2, _ = _random_case(rng)
    locs = np.full((8, 6, 5, 2), -7.0, dtype=np.float32)  # everything invalid
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    out, _, depth = epipolar_attention(
        jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
        jnp.asarray(locs), params)
    # all sims masked equal -> uniform weights -> weighted sum of zero samples
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_no_softmax_divides_by_K(rng):
    feat1, other1, other2, locs = _random_case(rng)
    params = AttentionParams(attention="avg", similarity="dot", softmax_enabled=False)
    out, _, depth = epipolar_attention(
        jnp.asarray(feat1), jnp.asarray(other1), jnp.asarray(other2),
        jnp.asarray(locs), params)
    ref_out, ref_w = _dense_oracle(feat1, other1, other2, locs, "avg", "dot",
                                   softmax_enabled=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-2)


def test_gradients_flow_to_features(rng):
    feat1, other1, other2, locs = _random_case(rng)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))

    def loss(f1, o2):
        out, _, _ = epipolar_attention(f1, jnp.asarray(other1), o2,
                                       jnp.asarray(locs), params)
        return jnp.sum(out ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feat1), jnp.asarray(other2))
    assert np.abs(np.asarray(g1)).sum() > 0
    assert np.abs(np.asarray(g2)).sum() > 0
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()
