"""Profiling (FLOPs/params), external TF weight import, iteration sampler."""

import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.data.samplers import IterationBasedBatchSampler
from epipolar_transformers_tpu.utils.ext_model_loading import load_lifting_weights
from epipolar_transformers_tpu.utils.profiling import cost_analysis, count_params


def test_count_params():
    tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}
    assert count_params(tree) == 11


def test_cost_analysis_matmul():
    a = jnp.zeros((64, 64))
    ca = cost_analysis(lambda x: x @ x, a)
    # 64^3 * 2 flops expected
    assert ca.get("flops", 0) >= 2 * 64 ** 3 * 0.5


def test_tf_pickle_lifting_import(tmp_path, rng):
    """Synthetic hand3d-style TF pickle maps onto LiftingNet param paths."""
    tf_weights = {}
    chans = [(21, 32), (32, 32), (32, 64), (64, 64), (64, 128), (128, 128)]
    for s in range(3):
        for i in (1, 2):
            cin, cout = chans[2 * s + i - 1]
            tf_weights[f"PosePrior/conv_pose_{s}_{i}/weights"] = rng.randn(3, 3, cin, cout)
            tf_weights[f"PosePrior/conv_pose_{s}_{i}/biases"] = rng.randn(cout)
    tf_weights["PosePrior/fc_rel0/weights"] = rng.randn(2050, 512)
    tf_weights["PosePrior/fc_rel0/biases"] = rng.randn(512)
    tf_weights["PosePrior/fc_rel1/weights"] = rng.randn(512, 512)
    tf_weights["PosePrior/fc_rel1/biases"] = rng.randn(512)
    tf_weights["PosePrior/fc_xyz/weights"] = rng.randn(512, 63)
    tf_weights["PosePrior/fc_xyz/biases"] = rng.randn(63)
    for a in "xyz":
        tf_weights[f"ViewpointNet/fc_vp_u{a}/weights"] = rng.randn(128, 1)
        tf_weights[f"ViewpointNet/fc_vp_u{a}/biases"] = rng.randn(1)
    p = tmp_path / "lifting.pickle"
    with open(p, "wb") as f:
        pickle.dump(tf_weights, f)

    out = load_lifting_weights(str(p))
    assert out["conv1_conv0/kernel"].shape == (3, 3, 21, 32)
    assert out["poseprior/fc0/kernel"].shape == (2050, 512)
    assert out["poseprior/out/kernel"].shape == (512, 63)
    assert out["viewpoint/out/kernel"].shape == (128, 3)
    assert out["viewpoint/out/bias"].shape == (3,)


def test_iteration_sampler():
    s = IterationBasedBatchSampler(dataset_size=10, batch_size=3,
                                   num_iterations=7, seed=1)
    batches = list(s)
    assert len(batches) == 7
    assert all(len(b) == 3 for b in batches)
    # epoch-free: runs past one epoch (10//3 = 3 batches/epoch)
    flat_epoch1 = set(sum(batches[:3], []))
    assert len(flat_epoch1) == 9  # distinct indices within an epoch
