"""Flax Epipolar module: init, shapes, zero-init-BN identity, config switches."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.models.epipolar import Epipolar


def _cfg(**epipolar_overrides):
    base = {
        "KEYPOINT": {"NFEATS": 8, "HEATMAP_SIZE": (16, 16), "NUM_PTS": 17},
        "BACKBONE": {"DOWNSAMPLE": 4},
        "DATASETS": {"IMAGE_RESIZE": 1.0, "PREDICT_RESIZE": 1.0},
        "EPIPOLAR": {
            "SAMPLESIZE": 8,
            "ATTENTION": "avg",
            "SIMILARITY": "dot",
            "MERGE": "late",
            "PARAMETERIZED": ("z",),
            "ZRESIDUAL": True,
            "USE_CORRECT_NORMALIZE": True,
            **epipolar_overrides,
        },
    }
    return update_from_dict(Config(), base)


def _inputs(camera_ring, N=2, C=8, H=16, W=16, seed=0):
    rng = np.random.RandomState(seed)
    feat1 = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    feat2 = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    P1 = jnp.asarray(np.stack([camera_ring["KRT"][0]] * N).astype(np.float32))
    P2 = jnp.asarray(np.stack([camera_ring["KRT"][1]] * N).astype(np.float32))
    return feat1, feat2, P1, P2


def test_zresidual_init_returns_attention_output(camera_ring):
    """At init, z-conv + zero-init BN output 0, so finalout == raw attention
    output under ZRESIDUAL (and exactly 0 without it)."""
    # SAVE_PRED makes eval materialize the full depth stack (the module
    # otherwise returns a placeholder — see Epipolar need_depth gate)
    cfg = update_from_dict(_cfg(), {"VIS": {"SAVE_PRED": True}})
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    variables = model.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=False)
    out, corr, depth, locs = model.apply(variables, feat1, feat2, P1, P2, train=False)
    assert out.shape == feat1.shape
    assert corr.shape == (2, 16, 16, 2)
    assert depth.shape == (2, 8, 16, 16)

    cfg2 = _cfg(ZRESIDUAL=False)
    model2 = Epipolar(cfg2)
    v2 = model2.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=False)
    out2, _, _, _ = model2.apply(v2, feat1, feat2, P1, P2, train=False)
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)
    # zresidual output = raw attention fusion = out - 0
    diff = np.asarray(out) - np.asarray(out2)
    assert np.abs(diff).max() > 0  # attention itself is nonzero


def test_batchnorm_updates_in_train_mode(camera_ring):
    cfg = _cfg()
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    variables = model.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=True)
    assert "batch_stats" in variables
    (out, *_), mutated = model.apply(
        variables, feat1, feat2, P1, P2, train=True, mutable=["batch_stats"]
    )
    new_mean = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.isfinite(np.asarray(new_mean)).all()


def test_parameterized_theta_phi_g(camera_ring):
    cfg = _cfg(PARAMETERIZED=("z", "theta", "phi", "g"), ZRESIDUAL=False)
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    variables = model.init(jax.random.PRNGKey(1), feat1, feat2, P1, P2, train=False)
    pnames = set(variables["params"].keys())
    assert {"z", "theta", "phi", "g"} <= pnames
    out, *_ = model.apply(variables, feat1, feat2, P1, P2, train=False)
    assert out.shape == feat1.shape


def test_prior_attention(camera_ring):
    cfg = _cfg(PRIOR=True, SIMILARITY="prior", PARAMETERIZED=())
    cfg = update_from_dict(cfg, {"DATASETS": {"CAMERAS": (0, 1, 2, 3)}})
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    cam = jnp.asarray([0, 1])
    other = jnp.asarray([1, 2])
    variables = model.init(
        jax.random.PRNGKey(2), feat1, feat2, P1, P2, camera=cam, other_camera=other, train=False
    )
    # one slot per ordered non-self pair (reference epipolar.py:74-80):
    # 4 cameras -> 12 pairs, not a dense 4x4 table
    assert variables["params"]["prior"].shape == (12, 8, 16, 16)
    out, *_ = model.apply(
        variables, feat1, feat2, P1, P2, camera=cam, other_camera=other, train=False
    )
    assert out.shape == feat1.shape


def test_prior_table_pair_sparse_and_distinct(camera_ring):
    """10-camera rig: 90 pair slots (n*(n-1)), matching the reference's
    parameter count; distinct (cam, other) pairs read distinct slots and
    swapped pairs differ (the prior is direction-sensitive)."""
    cfg = _cfg(PRIOR=True, SIMILARITY="prior", PARAMETERIZED=())
    cfg = update_from_dict(cfg, {"DATASETS": {"CAMERAS": tuple(range(10))}})
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    cam = jnp.asarray([3, 7])
    other = jnp.asarray([7, 3])
    variables = model.init(
        jax.random.PRNGKey(3), feat1, feat2, P1, P2,
        camera=cam, other_camera=other, train=False,
    )
    assert variables["params"]["prior"].shape == (90, 8, 16, 16)
    # the (3,7) and (7,3) slots are independent parameters
    table = np.asarray(variables["params"]["prior"])
    pairs = [(i, j) for i in range(10) for j in range(10) if i != j]
    s37, s73 = pairs.index((3, 7)), pairs.index((7, 3))
    assert s37 != s73
    assert not np.allclose(table[s37], table[s73])


def test_prior_self_pair_reads_neutral_zero(camera_ring):
    """camera == other_camera has no prior parameters (the reference's dict
    would KeyError); under jit the traced index can't raise, so the slot
    must read a NEUTRAL ZERO — with SIMILARITY='prior' (weights ARE the
    prior) the fused output is then exactly zero, never another pair's
    learned parameters."""
    cfg = _cfg(PRIOR=True, SIMILARITY="prior", PARAMETERIZED=())
    cfg = update_from_dict(cfg, {"DATASETS": {"CAMERAS": (0, 1, 2, 3)}})
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    cam = jnp.asarray([2, 0])
    variables = model.init(
        jax.random.PRNGKey(4), feat1, feat2, P1, P2,
        camera=cam, other_camera=jnp.asarray([1, 3]), train=False,
    )
    out_self, *_ = model.apply(
        variables, feat1, feat2, P1, P2,
        camera=cam, other_camera=cam, train=False,  # self-pairs
    )
    np.testing.assert_allclose(np.asarray(out_self), 0.0, atol=1e-7)
    out_valid, *_ = model.apply(
        variables, feat1, feat2, P1, P2,
        camera=cam, other_camera=jnp.asarray([1, 3]), train=False,
    )
    assert np.abs(np.asarray(out_valid)).max() > 0


def test_prior_out_of_range_id_reads_neutral_zero(camera_ring):
    """A camera id greater than max(DATASETS.CAMERAS) clamps into the lookup
    (JAX out-of-bounds gather semantics); the (max+2)-sized guard row/column
    makes it land on a -1 slot -> neutral zero, never a VALID slot of a
    different pair."""
    cfg = _cfg(PRIOR=True, SIMILARITY="prior", PARAMETERIZED=())
    cfg = update_from_dict(cfg, {"DATASETS": {"CAMERAS": (0, 1, 2, 3)}})
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    cam = jnp.asarray([0, 1])
    variables = model.init(
        jax.random.PRNGKey(5), feat1, feat2, P1, P2,
        camera=cam, other_camera=jnp.asarray([1, 2]), train=False,
    )
    for bad_other in (jnp.asarray([4, 9]), jnp.asarray([100, 5])):
        out_bad, *_ = model.apply(
            variables, feat1, feat2, P1, P2,
            camera=cam, other_camera=bad_other, train=False,
        )
        np.testing.assert_allclose(np.asarray(out_bad), 0.0, atol=1e-7)
    # and a too-large reference id likewise
    out_bad, *_ = model.apply(
        variables, feat1, feat2, P1, P2,
        camera=jnp.asarray([4, 4]), other_camera=jnp.asarray([0, 1]), train=False,
    )
    np.testing.assert_allclose(np.asarray(out_bad), 0.0, atol=1e-7)


def test_prior_requires_cameras(camera_ring):
    cfg = _cfg(PRIOR=True, SIMILARITY="prior", PARAMETERIZED=())
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    with pytest.raises(ValueError, match="DATASETS.CAMERAS"):
        model.init(
            jax.random.PRNGKey(0), feat1, feat2, P1, P2,
            camera=jnp.asarray([0, 1]), other_camera=jnp.asarray([1, 0]),
            train=False,
        )


def test_stop_gradient_on_other_view(camera_ring):
    """OTHER_GRAD=() must block gradients into feat2."""
    # PARAMETERIZED=() so the zero-init BN (whose zero gamma blocks all grads
    # at init by construction) is out of the path
    cfg = _cfg(OTHER_GRAD=(), ZRESIDUAL=False, PARAMETERIZED=())
    model = Epipolar(cfg)
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    variables = model.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=False)

    def loss(f2):
        out, *_ = model.apply(variables, feat1, f2, P1, P2, train=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(feat2)
    np.testing.assert_allclose(np.asarray(g), 0.0)

    cfg2 = _cfg(ZRESIDUAL=False, PARAMETERIZED=())  # default OTHER_GRAD on
    model2 = Epipolar(cfg2)
    v2 = model2.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=False)

    def loss2(f2):
        out, *_ = model2.apply(v2, feat1, f2, P1, P2, train=False)
        return jnp.sum(out ** 2)

    g2 = jax.grad(loss2)(feat2)
    assert np.abs(np.asarray(g2)).sum() > 0


def test_attention_impl_config_knob(camera_ring):
    """EPIPOLAR.ATTENTION_IMPL forces a dispatch path from config (CLI-
    reachable) and agrees with 'auto'; unknown values fail loudly."""
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    outs = {}
    for impl in ("auto", "pallas", "matmul", "streaming", "reference"):
        cfg = _cfg(ATTENTION_IMPL=impl)
        model = Epipolar(cfg)
        variables = model.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2,
                               train=False)
        out, _, _, _ = model.apply(variables, feat1, feat2, P1, P2,
                                   train=False)
        outs[impl] = np.asarray(out)
    for impl in ("pallas", "matmul", "streaming", "reference"):
        np.testing.assert_allclose(outs[impl], outs["auto"], rtol=1e-4,
                                   atol=1e-5)
    # an explicit field still overrides the config
    model = Epipolar(_cfg(ATTENTION_IMPL="streaming"),
                     attention_impl="matmul")
    assert model.impl == "matmul"
    with pytest.raises(ValueError, match="ATTENTION_IMPL"):
        Epipolar(_cfg(ATTENTION_IMPL="bogus")).impl


def test_attention_impl_forced_unsupported_raises(camera_ring):
    """A forced impl that can't express the config fails loudly instead of
    silently falling through to the oracle (e.g. matmul on POOLING)."""
    feat1, feat2, P1, P2 = _inputs(camera_ring)
    cfg = _cfg(ATTENTION_IMPL="matmul", POOLING=True)
    model = Epipolar(cfg)
    with pytest.raises(ValueError, match="does not support"):
        model.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=False)
    # pallas covers avg+dot/prior only; cos must fail loudly when forced
    cfg = _cfg(ATTENTION_IMPL="pallas", SIMILARITY="cos")
    model = Epipolar(cfg)
    with pytest.raises(ValueError, match="does not support"):
        model.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=False)
    # ... and the Mosaic kernel is forward-only: train=True must raise the
    # loud error, not an obscure autodiff failure mid-grad
    cfg = _cfg(ATTENTION_IMPL="pallas")
    model = Epipolar(cfg)
    with pytest.raises(ValueError, match="forward-only"):
        model.init(jax.random.PRNGKey(0), feat1, feat2, P1, P2, train=True)
