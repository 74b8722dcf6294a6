"""Gather-free matmul attention == two-pass oracle implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.ops.epipolar_attention import (
    AttentionParams,
    epipolar_attention,
)
from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
    epipolar_attention_matmul,
    supports_matmul_attention,
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
    dict(attention="avg", similarity="dot", softmax_enabled=False),
    dict(attention="avg", similarity="cos"),
    dict(attention="max", similarity="dot"),  # max always uses cosine
    dict(attention="max", similarity="cos"),
]


@pytest.mark.parametrize("kw", CASES)
@pytest.mark.parametrize("q_chunk", [512, 7])
def test_matmul_matches_oracle(rng, kw, q_chunk):
    f1, o1, o2, locs = _case(rng)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8), **kw)
    assert supports_matmul_attention(params)
    ref_out, ref_corr, ref_depth = epipolar_attention(f1, o1, o2, locs, params)
    out, corr, depth = epipolar_attention_matmul(f1, o1, o2, locs, params,
                                                 q_chunk=q_chunk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(ref_corr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               rtol=1e-4, atol=1e-5)


def test_matmul_with_priors(rng):
    f1, o1, o2, locs = _case(rng)
    prior = jnp.asarray(rng.rand(8, 6, 5).astype(np.float32) * 0.1)
    for priormul in (False, True):
        params = AttentionParams(attention="avg", similarity="dot",
                                 softmax_scale=1 / np.sqrt(8), priormul=priormul)
        ref = epipolar_attention(f1, o1, o2, locs, params, prior)
        got = epipolar_attention_matmul(f1, o1, o2, locs, params, prior)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"priormul={priormul}")


def test_matmul_prior_similarity(rng):
    """similarity='prior': weights are the prior itself (epipolar.py:288-293)."""
    f1, o1, o2, locs = _case(rng)
    prior = jnp.asarray(rng.rand(8, 6, 5).astype(np.float32) * 0.1)
    params = AttentionParams(attention="avg", similarity="prior",
                             softmax_scale=1 / np.sqrt(8))
    ref = epipolar_attention(f1, o1, o2, locs, params, prior)
    got = epipolar_attention_matmul(f1, o1, o2, locs, params, prior)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_matmul_degenerate_row_with_prior(rng):
    """A query whose samples are ALL out of range, with a prior present.

    K=8 pads to 64 internally; on the degenerate row the real slots carry
    NEG_INF + p_k while padded slots carry the prior pad — with a zero pad
    the max-subtraction would cancel NEG_INF and give padded slots
    exp(-scale * p_max) weight, corrupting the returned depth.  The NEG_INF
    prior pad (additive path) / zero pad + uniform rescale (priormul) must
    reproduce the unpadded oracle exactly on every row.

    The prior magnitude must exceed f32 resolution at |NEG_INF| (~1e3 at
    1e10) or NEG_INF + p_k rounds back to NEG_INF and the hazard is
    invisible; learned additive logits are unbounded, so use a large one."""
    f1, o1, o2, locs = _case(rng)
    locs = locs.at[:, 0, 0, :].set(-2.0)  # query (0,0): all 8 samples out
    locs = locs.at[:, 3, 2, :].set(2.0)   # and another, on the + side
    prior = jnp.asarray(rng.rand(8, 6, 5).astype(np.float32) * 65536.0)
    for priormul in (False, True):
        params = AttentionParams(attention="avg", similarity="dot",
                                 softmax_scale=1 / np.sqrt(8),
                                 priormul=priormul)
        ref = epipolar_attention(f1, o1, o2, locs, params, prior)
        got = epipolar_attention_matmul(f1, o1, o2, locs, params, prior)
        for name, r, g in zip(("out", "corr", "depth"), ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"priormul={priormul} {name}")


def test_matmul_all_out_of_range(rng):
    """Lines missing the rectangle: sim == 0 sentinel -> masked softmax ->
    uniform weights over zero values -> exact-zero output (reference
    zero-padding semantics, epipolar.py:298)."""
    f1, o1, o2, _ = _case(rng)
    locs = jnp.full((8, 6, 5, 2), -9.0)
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1 / np.sqrt(8))
    out, _, _ = epipolar_attention_matmul(f1, o1, o2, locs, params)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_matmul_real_geometry_locs(rng, camera_ring):
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
    locs = epipolar_sample_locs(P1, P2, geom).astype(jnp.float32)
    f1 = jnp.asarray(rng.randn(H, W, 8).astype(np.float32))
    o1 = jnp.asarray(rng.randn(H, W, 8).astype(np.float32))
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=0.25)
    ref = epipolar_attention(f1, o1, o1, locs, params)
    got = epipolar_attention_matmul(f1, o1, o1, locs, params)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("attention", ["avg", "max"])
def test_matmul_real_geometry_cos(rng, camera_ring, attention):
    """Cosine/max parity on real epipolar-geometry sample locations — the
    gather-free norm (_interp_norm2) vs the oracle's per-sample norms,
    including partially-clipped corners."""
    from epipolar_transformers_tpu.ops.epipolar_sampling import (
        EpipolarGeometry, epipolar_sample_locs,
    )

    H = W = 16
    P1 = jnp.asarray(camera_ring["KRT"][0])
    P2 = jnp.asarray(camera_ring["KRT"][1])
    geom = EpipolarGeometry(feat_h=H, feat_w=W, sample_size=16, downsample=4,
                            resize=1.0, correct_normalize=True)
    locs = epipolar_sample_locs(P1, P2, geom).astype(jnp.float32)
    f1 = jnp.asarray(rng.randn(H, W, 8).astype(np.float32))
    o1 = jnp.asarray(rng.randn(H, W, 8).astype(np.float32))
    params = AttentionParams(attention=attention, similarity="cos",
                             softmax_scale=0.25)
    ref = epipolar_attention(f1, o1, o1, locs, params)
    got = epipolar_attention_matmul(f1, o1, o1, locs, params)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kw", [
    dict(attention="avg", similarity="dot"),
    dict(attention="avg", similarity="cos"),
    dict(attention="max", similarity="dot"),
])
def test_matmul_gradients_match(rng, kw):
    f1, o1, o2, locs = _case(rng)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8), **kw)

    def loss(fn, *args):
        out, _, _ = fn(*args, locs, params)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(lambda a, b, c: loss(epipolar_attention, a, b, c),
                     argnums=(0, 1, 2))(f1, o1, o2)
    g_mat = jax.grad(lambda a, b, c: loss(epipolar_attention_matmul, a, b, c),
                     argnums=(0, 1, 2))(f1, o1, o2)
    for a, b in zip(g_ref, g_mat):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-4)


def test_dots_bf16_remat(rng):
    """ATTENTION_REMAT='dots_bf16' saves the big einsum residuals bf16.

    With bf16 inputs (the recipe compute mode) the forward is BIT-IDENTICAL
    to 'dots': downstream consumers already cast G/T to bf16, so the
    checkpoint_name casts are no-ops on the primal.  With f32 inputs the
    forward is perturbed only by bf16 rounding of the residuals.  Gradients
    stay close to the unrounded path in both modes."""
    f1, o1, o2, locs = _case(rng)
    params = AttentionParams(softmax_scale=1 / np.sqrt(8), attention="avg",
                             similarity="dot")

    def loss(remat, a, b, c):
        out, _, _ = epipolar_attention_matmul(a, b, c, locs, params,
                                              remat=remat)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # bf16 compute mode: primal exactly equal to 'dots'
    fb = tuple(x.astype(jnp.bfloat16) for x in (f1, o1, o2))
    v_dots = jax.jit(lambda *a: loss("dots", *a))(*fb)
    v_bf16 = jax.jit(lambda *a: loss("dots_bf16", *a))(*fb)
    assert np.asarray(v_dots) == np.asarray(v_bf16)
    g_dots = jax.jit(jax.grad(lambda *a: loss("dots", *a),
                              argnums=(0, 1, 2)))(*fb)
    g_bf16 = jax.jit(jax.grad(lambda *a: loss("dots_bf16", *a),
                              argnums=(0, 1, 2)))(*fb)
    for a, b in zip(g_dots, g_bf16):
        np.testing.assert_allclose(np.asarray(b).astype(np.float32),
                                   np.asarray(a).astype(np.float32),
                                   rtol=2e-2, atol=1e-3)

    # f32 inputs: rounding of the saved residuals perturbs, but only at
    # bf16 precision
    v32_dots = jax.jit(lambda *a: loss("dots", *a))(f1, o1, o2)
    v32_bf16 = jax.jit(lambda *a: loss("dots_bf16", *a))(f1, o1, o2)
    np.testing.assert_allclose(np.asarray(v32_bf16), np.asarray(v32_dots),
                               rtol=2e-2)
    g32_dots = jax.jit(jax.grad(lambda *a: loss("dots", *a),
                                argnums=(0, 1, 2)))(f1, o1, o2)
    g32_bf16 = jax.jit(jax.grad(lambda *a: loss("dots_bf16", *a),
                                argnums=(0, 1, 2)))(f1, o1, o2)
    for a, b in zip(g32_dots, g32_bf16):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-2,
                                   atol=2e-3)
