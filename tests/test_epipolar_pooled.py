"""Materialized pooled attention == oracle on POOLING configs.

POOLING semantics under test: pairs (k, k + K/2) of sampled features are
elementwise max-reduced before the similarity (reference epipolar.py:200-213,
the keypoint_h36m_param.yaml config)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.ops.epipolar_attention import (
    AttentionParams,
    epipolar_attention,
)
from epipolar_transformers_tpu.ops.epipolar_attention_pooled import (
    epipolar_attention_pooled,
    supports_pooled_attention,
)


def _case(rng, K=8, H=6, W=5, C=4):
    feat1 = rng.randn(H, W, C).astype(np.float32)
    other1 = rng.randn(H, W, C).astype(np.float32)
    other2 = rng.randn(H, W, C).astype(np.float32)
    locs = (rng.rand(K, H, W, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOR
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
def test_pooled_matches_oracle(rng, kw):
    f1, o1, o2, locs = _case(rng)
    params = AttentionParams(pooling=True, softmax_scale=1 / np.sqrt(4), **kw)
    assert supports_pooled_attention(params)
    ref_out, ref_corr, ref_depth = epipolar_attention(f1, o1, o2, locs, params)
    out, corr, depth = epipolar_attention_pooled(f1, o1, o2, locs, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(ref_corr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               rtol=1e-4, atol=1e-5)


def test_pooled_with_priors(rng):
    f1, o1, o2, locs = _case(rng)
    prior = jnp.asarray(rng.rand(4, 6, 5).astype(np.float32) * 0.1)
    for priormul in (False, True):
        params = AttentionParams(attention="avg", similarity="dot",
                                 pooling=True,
                                 softmax_scale=1 / np.sqrt(4),
                                 priormul=priormul)
        ref = epipolar_attention(f1, o1, o2, locs, params, prior)
        got = epipolar_attention_pooled(f1, o1, o2, locs, params, prior)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"priormul={priormul}")


def test_pooled_shared_kv(rng):
    """shared_kv=True must equal passing the same array twice."""
    f1, o1, _, locs = _case(rng)
    params = AttentionParams(attention="avg", similarity="dot", pooling=True,
                             softmax_scale=1 / np.sqrt(4))
    ref = epipolar_attention_pooled(f1, o1, o1, locs, params)
    got = epipolar_attention_pooled(f1, o1, o1, locs, params, shared_kv=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0, atol=0)


def test_pooled_gradients_match_oracle(rng):
    """VJP parity: training a POOLING config rides this path's gradients."""
    f1, o1, o2, locs = _case(rng)
    params = AttentionParams(attention="avg", similarity="dot", pooling=True,
                             softmax_scale=1 / np.sqrt(4))
    w = jnp.asarray(rng.randn(6, 5, 4).astype(np.float32))

    def loss(fn, a, b, c):
        out, _, _ = fn(a, b, c, locs, params)
        return jnp.sum(out * w)

    g_ref = jax.grad(lambda *a: loss(epipolar_attention, *a),
                     argnums=(0, 1, 2))(f1, o1, o2)
    g_new = jax.grad(lambda *a: loss(epipolar_attention_pooled, *a),
                     argnums=(0, 1, 2))(f1, o1, o2)
    for r, g in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_pooled_all_out_of_range(rng):
    """A pixel whose every sample is out of range: zero-sim sentinel masking
    must reproduce the oracle (zero output under softmax of all -1e10)."""
    f1, o1, o2, _ = _case(rng)
    locs = jnp.full((8, 6, 5, 2), 2.0, jnp.float32)  # everything OOR
    params = AttentionParams(attention="avg", similarity="dot", pooling=True,
                             softmax_scale=1 / np.sqrt(4))
    ref = epipolar_attention(f1, o1, o2, locs, params)
    got = epipolar_attention_pooled(f1, o1, o2, locs, params)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_param_config_trains_through_builder():
    """The keypoint_h36m_param semantics (PARAMETERIZED z/theta/phi/g +
    POOLING + BOTTLENECK 2, reference configs/epipolar/
    keypoint_h36m_param.yaml:29-31) build, forward, and take one finite
    train step through ModelBuilder — and dispatch to the pooled path
    (pooling excludes matmul; pooled support asserted)."""
    import numpy as np
    from epipolar_transformers_tpu.config import Config, update_from_dict
    from epipolar_transformers_tpu.data.pipeline import make_data_loader
    from epipolar_transformers_tpu.engine import (
        create_train_state,
        make_train_step,
    )
    from epipolar_transformers_tpu.engine.trainer import select_model_inputs
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        supports_matmul_attention,
    )

    d = {
        "DATASETS": {
            "TRAIN": ("synthetic_multiview_train",),
            "TEST": ("synthetic_multiview_val",),
            "TASK": "multiview_keypoint",
            "IMAGE_SIZE": (64, 64),
            "IMAGE_RESIZE": 1.0,
            "PREDICT_RESIZE": 1.0,
        },
        "BACKBONE": {"ENABLED": True, "BODY": "epipolarposeR-18",
                     "PRETRAINED": False, "DOWNSAMPLE": 4},
        "KEYPOINT": {"ENABLED": True, "NUM_PTS": 5, "HEATMAP_SIZE": (16, 16),
                     "SIGMA": 2.0, "NFEATS": 256, "LOSS": "joint",
                     "LOSS_PER_JOINT": False},
        "EPIPOLAR": {
            "SAMPLESIZE": 8, "MERGE": "late", "ATTENTION": "avg",
            "SIMILARITY": "dot", "POOLING": True, "BOTTLENECK": 2,
            "PARAMETERIZED": ("z", "theta", "phi", "g"), "ZRESIDUAL": False,
            "SHARE_WEIGHTS": True, "USE_CORRECT_NORMALIZE": True,
            "PRETRAINED": False,
        },
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": 4,
                   "MAX_EPOCHS": 1},
        "TEST": {"IMS_PER_BATCH": 1},
        "OUTPUT_DIR": "",
    }
    cfg = update_from_dict(Config(), d)
    params = AttentionParams(pooling=True, attention="avg", similarity="dot")
    assert supports_pooled_attention(params)
    assert not supports_matmul_attention(params)

    loader = make_data_loader(cfg, is_train=True)
    inputs = select_model_inputs(cfg, next(iter(loader)))
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    step = make_train_step(cfg)
    losses = []
    for i in range(3):
        state, metrics = step(state, inputs, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses)), losses
