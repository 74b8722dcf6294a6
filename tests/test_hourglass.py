"""Hourglass backbone family + Meta layer + align_corners resize."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.models.hourglass import HourglassNet
from epipolar_transformers_tpu.models.meta import Meta
from epipolar_transformers_tpu.ops.resize import resize_bilinear_align_corners


def _cfg(body="HG11", **epi):
    d = {
        "BACKBONE": {"BODY": body, "DOWNSAMPLE": 4, "ENABLED": True},
        "KEYPOINT": {"NUM_PTS": 5, "HEATMAP_SIZE": (16, 16), "SIGMA": 2.0,
                     "NFEATS": 64},
        "DATASETS": {"IMAGE_SIZE": (64, 64), "IMAGE_RESIZE": 1.0,
                     "PREDICT_RESIZE": 1.0},
        "EPIPOLAR": {"SAMPLESIZE": 4, "MERGE": "late", "ATTENTION": "avg",
                     "SIMILARITY": "dot", "PARAMETERIZED": (),
                     "USE_CORRECT_NORMALIZE": True, **epi},
    }
    return update_from_dict(Config(), d)


def test_resize_matches_torch_interpolate(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    out = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (10, 14)))
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
            mode="bilinear", align_corners=True,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_hourglass_single_view_shapes():
    cfg = _cfg("HG11")
    model = HourglassNet(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.heatmaps[-1].shape == (2, 16, 16, 5)
    assert out.locs.shape == (2, 5, 2)


def test_hourglass_stacked_intermediate_supervision():
    cfg = _cfg("HG")  # 3 stacks
    model = HourglassNet(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert len(out.heatmaps) == 3
    for hm in out.heatmaps:
        assert hm.shape == (1, 16, 16, 5)


def test_epipolar_hourglass_fusion(camera_ring):
    cfg = _cfg("epipolarHG11")
    model = HourglassNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    other = [jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))]
    KRT = jnp.asarray(np.stack([camera_ring["KRT"][0]] * 2).astype(np.float32))
    oKRT = jnp.asarray(np.stack([camera_ring["KRT"][1]] * 2).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, other_features=other,
                           KRT=KRT, other_KRT=oKRT, train=False)
    out = model.apply(variables, x, other_features=other, KRT=KRT,
                      other_KRT=oKRT, train=False)
    assert out.corr_pos.shape == (2, 16, 16, 2)
    # placeholder depth at eval without SAVE_PRED (Epipolar need_depth gate)
    assert out.depth.shape[0] == 2 and out.depth.shape[-2:] == (16, 16)


def test_meta_layer(camera_ring):
    model = Meta(in_channels=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 8).astype(np.float32))
    KRT = jnp.asarray(np.stack([camera_ring["KRT"][0]] * 2))
    oKRT = jnp.asarray(np.stack([camera_ring["KRT"][1]] * 2))
    variables = model.init(jax.random.PRNGKey(0), KRT, oKRT, x)
    out = model.apply(variables, KRT, oKRT, x)
    assert out.shape == x.shape
    # hypernetwork actually conditions on geometry: different F -> different out
    oKRT2 = jnp.asarray(np.stack([camera_ring["KRT"][2]] * 2))
    out2 = model.apply(variables, KRT, oKRT2, x)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


@pytest.mark.slow  # ~60s over 3 params (r5 suite re-budget)
@pytest.mark.parametrize("merge", ["late", "early", "both"])
def test_finetune_stops_gradient_at_fusion(camera_ring, merge):
    """SOLVER.FINETUNE detaches the fused feature per merge mode (reference
    ProHG.py:246,255,268): with it on, the trunk below the detach point gets
    exactly zero gradient while the post-fusion heads still train."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    n_other = 2 if merge == "both" else 1
    other = [jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
             for _ in range(n_other)]
    KRT = jnp.asarray(camera_ring["KRT"][0][None].astype(np.float32))
    oKRT = jnp.asarray(camera_ring["KRT"][1][None].astype(np.float32))

    def grads_for(finetune):
        cfg = _cfg("epipolarHG11", MERGE=merge)
        cfg = update_from_dict(cfg, {"SOLVER": {"FINETUNE": finetune}})
        model = HourglassNet(cfg)
        variables = model.init(jax.random.PRNGKey(0), x, other_features=other,
                               KRT=KRT, other_KRT=oKRT, train=False)

        def loss(params):
            out = model.apply({**variables, "params": params}, x,
                              other_features=other, KRT=KRT, other_KRT=oKRT,
                              train=False)
            return jnp.sum(out.heatmaps[-1] ** 2)

        return jax.grad(loss)(variables["params"])

    g_ft = grads_for(True)
    g_no = grads_for(False)

    def total_norm(tree, pick):
        leaves = [
            v for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
            if pick("/".join(str(p) for p in path))
        ]
        return float(sum(jnp.sum(jnp.abs(l)) for l in leaves)) if leaves else 0.0

    # what sits below the detach point depends on the merge mode
    # (reference ProHG.py:246,255,268):
    #   late:  tower output detached -> stem AND tower frozen
    #   early/both: fused stack INPUT detached -> stem frozen, tower trains
    #   (in 'both' the tower also feeds the 2nd fusion, keeping its grads)
    stem = lambda n: "stem_conv0" in n
    tower = lambda n: "hg0" in n
    head = lambda n: "tmpOut0" in n
    frozen = tower if merge == "late" else stem
    assert total_norm(g_no, frozen) > 0, "sanity: trains without FINETUNE"
    assert total_norm(g_ft, frozen) == 0.0, "FINETUNE must freeze below the detach"
    assert total_norm(g_ft, head) > 0, "heads must still train under FINETUNE"
    if merge == "late":
        assert total_norm(g_ft, stem) == 0.0
    else:
        assert total_norm(g_ft, tower) > 0, "tower is above the detach point"
