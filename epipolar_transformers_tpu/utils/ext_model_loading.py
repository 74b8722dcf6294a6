"""External (TensorFlow-pickle) weight import for the lifting networks.

Equivalent of reference utils/ext_model_loading.py:12-104: the hand3d
project publishes its PosePrior/ViewpointNet weights as a TF pickle
({'PosePrior/conv_pose_0_1/weights': HWCN array, ...}); the reference
converts them to torch NCHW.  Flax convs are HWIO natively, so the TF
kernels import with only an axis swap C<->N -> HWIO; dense kernels keep the
TF (in, out) layout directly.

Maps into our LiftingNet module names (models/lifting.py):
  PosePrior/conv_pose_{s}_{i}  -> conv1_conv{2s+i-1}
  ViewpointNet/conv_vp_{s}_{i} -> conv2_conv{2s+i-1}
  PosePrior/fc_rel{i}          -> poseprior/fc{i}
  PosePrior/fc_xyz             -> poseprior/out
  ViewpointNet/fc_vp{i}        -> viewpoint/fc{i}
  ViewpointNet/fc_vp_{ux,uy,uz}-> viewpoint/out (concatenated, 3-wide)
"""

from __future__ import annotations

import pickle
import re
from typing import Dict

import numpy as np

from .registry import Registry

EXTERNAL_LOADER = Registry()


def _load_tf_pickle(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        return pickle.load(f)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """TF conv kernel HWCN -> flax HWIO (swap the trailing pair)."""
    assert w.ndim == 4
    return np.ascontiguousarray(np.transpose(w, (0, 1, 2, 3)))  # HWCN == HWIO


def _map_name(key: str):
    """TF variable name -> (flax path tuple, leaf) or None to defer."""
    m = re.fullmatch(r"PosePrior/conv_pose_(\d)_(\d)/(weights|biases)", key)
    if m:
        s, i, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        return ("conv1_conv%d" % (2 * s + i - 1),), leaf
    m = re.fullmatch(r"ViewpointNet/conv_vp_(\d)_(\d)/(weights|biases)", key)
    if m:
        s, i, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        return ("conv2_conv%d" % (2 * s + i - 1),), leaf
    m = re.fullmatch(r"PosePrior/fc_rel(\d)/(weights|biases)", key)
    if m:
        return ("poseprior", f"fc{m.group(1)}"), m.group(2)
    m = re.fullmatch(r"PosePrior/fc_xyz/(weights|biases)", key)
    if m:
        return ("poseprior", "out"), m.group(1)
    m = re.fullmatch(r"ViewpointNet/fc_vp(\d)/(weights|biases)", key)
    if m:
        return ("viewpoint", f"fc{m.group(1)}"), m.group(2)
    return None


@EXTERNAL_LOADER.register("lifting_rot")
@EXTERNAL_LOADER.register("lifting")
def load_lifting_weights(path: str) -> Dict[str, np.ndarray]:
    """TF pickle -> {'/'-joined flax path: array} for LiftingNet."""
    weights = _load_tf_pickle(path)
    out: Dict[str, np.ndarray] = {}
    vp_axes = {}
    for key, w in weights.items():
        w = np.asarray(w)
        m = re.fullmatch(r"ViewpointNet/fc_vp_u([xyz])/(weights|biases)", key)
        if m:
            vp_axes[(m.group(1), m.group(2))] = w
            continue
        mapped = _map_name(key)
        if mapped is None:
            continue
        path_t, leaf = mapped
        if leaf == "weights":
            arr = _conv_kernel(w) if w.ndim == 4 else np.asarray(w)  # fc: (in, out)
            name = "kernel"
        else:
            arr = w.reshape(-1)
            name = "bias"
        out["/".join(path_t + (name,))] = arr
    # the three per-axis viewpoint heads concatenate into the 3-wide output
    # (reference ext_model_loading.py:78-91)
    if vp_axes:
        k = np.concatenate([vp_axes[(a, "weights")].reshape(-1, 1) for a in "xyz"], axis=1)
        b = np.concatenate([vp_axes[(a, "biases")].reshape(-1) for a in "xyz"])
        out["viewpoint/out/kernel"] = k
        out["viewpoint/out/bias"] = b
    return out


def load_external_weights(task: str, path: str):
    return EXTERNAL_LOADER[task](path)
