"""Torch `.pth` checkpoint import into Flax parameter trees.

Needed to initialize from the reference's published weights (ImageNet
ResNets, single-view pose nets, full epipolar models — reference
utils/checkpoint.py + utils/model_serialization.py).  Handles:
  * layout conversion: Conv OIHW -> HWIO, ConvTranspose IOHW -> HWIO
    (flax ConvTranspose with transpose_kernel=False — verified numerically
    in tests/test_torch_import.py), Linear (O, I) -> (I, O);
  * BatchNorm weight/bias -> scale/bias and running stats -> batch_stats;
  * the reference's prefix strip/replace (WEIGHTS_PREFIX*, e.g. 'module.' or
    'backbone.module.') and suffix-matching alignment
    (model_serialization.py:9-76);
  * torch name -> flax path rules for the PoseResNet family
    (layerX.N -> layerX/blockN, downsample.{0,1}, deconv_layers.{3i}, ...).
"""

from __future__ import annotations

import logging
import re
from typing import Dict, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into {key: numpy array} (handles the
    reference's {'model': state_dict} wrapping, checkpoint.py:28-46)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        payload = payload["model"]
    if hasattr(payload, "state_dict"):
        payload = payload.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in payload.items()
            if hasattr(v, "detach")}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str = "",
                 prefix_replace: str = "", allow_diff_prefix: bool = False
                 ) -> Dict[str, np.ndarray]:
    """reference model_serialization.py:59-76.

    When not every key carries `prefix`: with `allow_diff_prefix`
    (WEIGHTS_ALLOW_DIFF_PREFIX) the non-matching keys are DROPPED and the
    matching ones stripped; without it the dict is returned untouched
    (reference model_serialization.py:62-66)."""
    if not prefix:
        # reference model_serialization.py:72-73: empty prefix with a
        # non-empty replacement PREPENDS the replacement to every key
        if prefix_replace:
            return {prefix_replace + k: v for k, v in sd.items()}
        return dict(sd)
    if not all(k.startswith(prefix) for k in sd):
        import warnings

        warnings.warn(f"Not all keys contain the prefix {prefix!r}")
        if not allow_diff_prefix:
            return dict(sd)
        return {prefix_replace + k[len(prefix):]: v
                for k, v in sd.items() if k.startswith(prefix)}
    return {prefix_replace + k[len(prefix):]: v for k, v in sd.items()}


# ---------------------------------------------------------------- name rules
def torch_key_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str, str]:
    """Map a torch parameter key to (flax path tuple, leaf name, kind).

    kind in {'conv', 'deconv', 'linear', 'bn_param', 'bn_stat', 'other'}.
    """
    parts = key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]

    out = []
    kind = "other"
    i = 0
    while i < len(mods):
        m = mods[i]
        if re.fullmatch(r"layer\d", m) and i + 1 < len(mods) and mods[i + 1].isdigit():
            out.append(m)
            out.append(f"block{mods[i + 1]}")
            i += 2
            continue
        if m == "downsample" and i + 1 < len(mods) and mods[i + 1] in ("0", "1"):
            out.append("downsample_conv" if mods[i + 1] == "0" else "downsample_bn")
            i += 2
            continue
        if m == "deconv_layers" and i + 1 < len(mods) and mods[i + 1].isdigit():
            n = int(mods[i + 1])
            if n % 3 == 0:
                out.append("deconv_layers")
                out.append(f"deconv{n // 3}")
            elif n % 3 == 1:
                out.append("deconv_layers")
                out.append(f"bn{n // 3}")
            i += 2
            continue
        out.append(m)
        i += 1

    if leaf in ("running_mean", "running_var"):
        kind = "bn_stat"
    elif leaf == "num_batches_tracked":
        kind = "skip"
    elif leaf in ("weight", "bias"):
        last = out[-1] if out else ""
        if "bn" in last or last.endswith("_bn") or last == "bn1":
            kind = "bn_param"
        else:
            kind = "layer_param"
    return tuple(out), leaf, kind


def _convert_leaf(value: np.ndarray, leaf: str, is_deconv: bool) -> Tuple[str, np.ndarray]:
    """Convert one torch tensor to the flax leaf (name, array)."""
    if leaf == "weight":
        if value.ndim == 4:
            if is_deconv:
                # torch ConvTranspose2d (I, O, kh, kw) -> flax (kh, kw, I, O)
                # with a spatial flip (flax ConvTranspose w/ transpose_kernel
                # =False is a fractionally-strided CONVOLUTION; torch's op is
                # the conv gradient — verified in tests/test_torch_import.py)
                return "kernel", np.ascontiguousarray(
                    np.transpose(value, (2, 3, 0, 1))[::-1, ::-1]
                )
            # torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O)
            return "kernel", np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:  # Linear (O, I) -> (I, O)
            return "kernel", value.T
        return "scale", value  # BN weight
    if leaf == "bias":
        return "bias", value
    if leaf == "running_mean":
        return "mean", value
    if leaf == "running_var":
        return "var", value
    return leaf, value


def convert_state_dict(
    torch_sd: Dict[str, np.ndarray],
    prefix: str = "",
    prefix_replace: str = "",
    allow_diff_prefix: bool = False,
):
    """Torch state dict -> ({params path: array}, {batch_stats path: array}).

    Paths are '/'-joined flax module paths.
    """
    sd = strip_prefix(torch_sd, prefix, prefix_replace, allow_diff_prefix)
    params, stats = {}, {}
    for key, value in sd.items():
        path, leaf, kind = torch_key_to_flax_path(key)
        if kind == "skip":
            continue
        is_deconv = any(p.startswith("deconv") and "layers" not in p for p in path)
        name, arr = _convert_leaf(np.asarray(value), leaf, is_deconv)
        full = "/".join(path + (name,))
        if kind == "bn_param":
            # BN params go under the module name directly (flax BatchNorm leaf)
            params[full] = arr
        elif kind == "bn_stat":
            stats[full] = arr
        else:
            params[full] = arr
    return params, stats


# ---------------------------------------------------------------- tree align
def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def align_by_suffix(
    flax_flat: Dict[tuple, np.ndarray],
    source: Dict[str, np.ndarray],
    strict_shapes: bool = True,
):
    """Suffix-matching alignment (reference model_serialization.py:9-57):
    for every flax leaf, pick the source key with the longest matching
    '/'-suffix and a compatible shape."""
    matched = {}
    report_missing = []
    for path, current in flax_flat.items():
        best_key, best_n = None, 0
        for skey, arr in source.items():
            segs = tuple(skey.split("/"))
            n = 0
            while n < min(len(segs), len(path)) and segs[-1 - n] == path[-1 - n]:
                n += 1
            # one key must be a full suffix of the other (reference
            # model_serialization matches on common suffixes)
            if n < min(len(segs), len(path)):
                continue
            if tuple(arr.shape) != tuple(np.shape(current)):
                continue
            if n > best_n:
                best_key, best_n = skey, n
        if best_key is not None:
            matched[path] = np.asarray(source[best_key], dtype=np.asarray(current).dtype)
        else:
            matched[path] = current
            report_missing.append("/".join(path))
    if report_missing:
        logger.info("torch import: %d leaves kept their init (e.g. %s)",
                    len(report_missing), report_missing[:5])
    return matched, report_missing


def load_into_variables(
    variables,
    torch_sd: Dict[str, np.ndarray],
    prefix: str = "",
    prefix_replace: str = "",
    submodule: str = "",
    allow_diff_prefix: bool = False,
):
    """Return a copy of flax `variables` with weights imported from torch.

    Args:
        variables: {'params': ..., 'batch_stats': ...} flax collections.
        submodule: optional flax path prefix (e.g. 'reference') the torch
            keys should land under.
    """
    params_src, stats_src = convert_state_dict(
        torch_sd, prefix, prefix_replace, allow_diff_prefix)
    if submodule:
        params_src = {f"{submodule}/{k}": v for k, v in params_src.items()}
        stats_src = {f"{submodule}/{k}": v for k, v in stats_src.items()}

    out = dict(variables)
    flat_p = _flatten(variables["params"])
    new_p, missing_p = align_by_suffix(flat_p, params_src)
    out["params"] = _unflatten(new_p)
    if "batch_stats" in variables and variables["batch_stats"]:
        flat_s = _flatten(variables["batch_stats"])
        new_s, _ = align_by_suffix(flat_s, stats_src)
        out["batch_stats"] = _unflatten(new_s)
    return out, missing_p
