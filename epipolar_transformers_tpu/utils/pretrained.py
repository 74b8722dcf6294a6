"""Pretrained-weight initialization into freshly-created train states.

Mirrors the reference's construction-time weight loading:
  * the multiview model pulls a pretrained *single-view* backbone checkpoint
    from BackboneCatalog into `reference` (EPIPOLAR.PRETRAINED) and, when
    weights are not shared, the frozen sibling `backbone`
    (reference modeling/model.py:37-54);
  * `cfg.WEIGHTS` ending in `.pth` imports a torch checkpoint with the
    WEIGHTS_PREFIX strip/replace semantics
    (reference utils/checkpoint.py:49-70, utils/model_serialization.py);
  * `cfg.WEIGHTS` ending in `.pickle` imports external TF weights for the
    lifting tasks (reference utils/checkpoint.py:49-52 -> ext_model_loading).

Native `.ckpt` resume stays with utils/checkpoint.py (Checkpointer), which
takes precedence over all of this via the `last_checkpoint` tag — same
resolution order as the reference (checkpoint.py:54-57).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

from flax import serialization

from ..config.catalog import BackboneCatalog
from .ext_model_loading import load_external_weights
from .torch_import import (
    _flatten,
    _unflatten,
    align_by_suffix,
    convert_state_dict,
    load_into_variables,
    load_torch_state_dict,
)

logger = logging.getLogger(__name__)


def resolve_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Find the checkpoint file in a single-view output dir: the
    `last_checkpoint` tag wins (reference checkpoint.py:54-57,77-96), then
    conventional names."""
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    tag = os.path.join(ckpt_dir, "last_checkpoint")
    if os.path.exists(tag):
        with open(tag) as f:
            name = f.read().strip()
        # the reference stores absolute paths in the tag; tolerate both
        path = name if os.path.isabs(name) else os.path.join(ckpt_dir, name)
        if os.path.exists(path):
            return path
    for name in ("model_final.ckpt", "model.pth", "model_final.pth"):
        path = os.path.join(ckpt_dir, name)
        if os.path.exists(path):
            return path
    return None


def _native_checkpoint_params(path: str) -> Tuple[Dict, Dict]:
    """Load a framework-native msgpack `.ckpt` -> (params, batch_stats)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload.get("state", payload)
    return state.get("params", {}), state.get("batch_stats") or {}


def _graft_subtree(variables, src_params, src_stats, src_root: str, dst_root: str):
    """Graft a source submodule tree (e.g. the single-view 'backbone') onto a
    destination submodule (e.g. the multiview 'reference') by suffix-aligned
    leaves — the flax analog of the reference's
    `load(prefix='backbone.module.')` (modeling/model.py:41-54)."""
    out = dict(variables)
    for coll, src in (("params", src_params), ("batch_stats", src_stats)):
        if coll not in variables or not variables[coll] or not src:
            continue
        sub = src.get(src_root, src) if isinstance(src, dict) else src
        flat_src = {f"{dst_root}/" + "/".join(p): v
                    for p, v in _flatten(sub).items()}
        flat_dst = _flatten(variables[coll])
        new, missing = align_by_suffix(flat_dst, flat_src)
        out[coll] = _unflatten(new)
        n_loaded = len(flat_dst) - len(missing)
        logger.info("pretrained: grafted %d/%d %s leaves %s -> %s",
                    n_loaded, len(flat_dst), coll, src_root, dst_root)
    return out


def load_single_view_pretrained(cfg, variables):
    """EPIPOLAR.PRETRAINED / not SHARE_WEIGHTS: initialize the multiview
    model's backbones from the BackboneCatalog single-view checkpoint
    (reference modeling/model.py:35-54)."""
    if cfg.DATASETS.TASK != "multiview_keypoint":
        return variables
    if not (cfg.EPIPOLAR.PRETRAINED or not cfg.EPIPOLAR.SHARE_WEIGHTS):
        return variables
    _, ckpt_dir = BackboneCatalog.get(cfg.BACKBONE.BODY)
    path = resolve_checkpoint(ckpt_dir)
    if path is None:
        logger.info("pretrained: no single-view checkpoint under %s", ckpt_dir)
        return variables

    targets = []
    if cfg.EPIPOLAR.PRETRAINED:
        targets.append("reference")
    if not cfg.EPIPOLAR.SHARE_WEIGHTS:
        targets.append("backbone")

    if path.endswith(".ckpt"):
        params, stats = _native_checkpoint_params(path)
        for sub in targets:
            variables = _graft_subtree(variables, params, stats, "backbone", sub)
        return variables
    # torch single-view checkpoint: keys carry the DataParallel wrapper
    # prefix 'backbone.module.' (reference model.py:42,53)
    sd = load_torch_state_dict(path)
    for sub in targets:
        variables, missing = load_into_variables(
            variables, sd, prefix="backbone.module.", submodule=sub)
        logger.info("pretrained: torch import into %s (%d leaves kept init)",
                    sub, len(missing))
    return variables


def load_backbone_pretrained(cfg, variables):
    """BACKBONE.PRETRAINED + BACKBONE.PRETRAINED_WEIGHTS: initialize every
    PoseResNet trunk from an explicit torch checkpoint at construction
    (reference resnet.py:511-517 -> init_weights:439-471).  final_layer is
    excluded (reference passes ignored_layers=['final_layer.*']); the
    model-zoo ImageNet fallback for an empty path needs network access and
    is covered by the BackboneCatalog path instead."""
    if not (cfg.BACKBONE.PRETRAINED and cfg.BACKBONE.PRETRAINED_WEIGHTS):
        return variables
    path = cfg.BACKBONE.PRETRAINED_WEIGHTS
    if not os.path.exists(path):
        logger.warning(
            "BACKBONE.PRETRAINED_WEIGHTS=%r does not exist — backbone keeps "
            "random init", path)
        return variables
    sd = load_torch_state_dict(path)
    sd = {k: v for k, v in sd.items()
          if not k.split("module.")[-1].startswith("final_layer.")}
    # every trunk the builder constructed gets the weights, mirroring the
    # per-instance init_weights call in the reference registry factory
    for sub in ("backbone", "reference"):
        if sub in variables.get("params", {}):
            variables, missing = load_into_variables(
                variables, sd,
                prefix=cfg.WEIGHTS_PREFIX,
                prefix_replace=cfg.WEIGHTS_PREFIX_REPLACE,
                submodule=sub,
                allow_diff_prefix=cfg.WEIGHTS_ALLOW_DIFF_PREFIX,
            )
            logger.info("BACKBONE.PRETRAINED_WEIGHTS: imported into %s "
                        "(%d leaves kept init)", sub, len(missing))
    return variables


def load_cfg_weights(cfg, variables):
    """Import `cfg.WEIGHTS` when it is a foreign format (.pth torch, .pickle
    TF). Native .ckpt resume is the Checkpointer's job."""
    path = cfg.WEIGHTS
    if not path:
        return variables, False
    if not os.path.exists(path):
        if not path.endswith(".ckpt"):
            # a native .ckpt goes through the Checkpointer later; anything
            # else missing here means nothing will ever load it
            logger.warning(
                "cfg.WEIGHTS=%r does not exist — proceeding from random init",
                path,
            )
        return variables, False
    ext = os.path.splitext(path)[1]
    if ext == ".pth":
        sd = load_torch_state_dict(path)
        variables, missing = load_into_variables(
            variables, sd,
            prefix=cfg.WEIGHTS_PREFIX,
            prefix_replace=cfg.WEIGHTS_PREFIX_REPLACE,
            allow_diff_prefix=cfg.WEIGHTS_ALLOW_DIFF_PREFIX,
        )
        logger.info("Imported torch weights from %s (%d leaves kept init)",
                    path, len(missing))
        return variables, True
    if ext in (".pickle", ".pkl"):
        src = {k: np.asarray(v)
               for k, v in load_external_weights(cfg.DATASETS.TASK, path).items()}
        # external lifting weights land under the 'liftingnet' submodule
        sub = "liftingnet" if "lifting" in cfg.DATASETS.TASK else ""
        if sub:
            src = {f"{sub}/{k}": v for k, v in src.items()}
        flat = _flatten(variables["params"])
        new, missing = align_by_suffix(flat, src)
        variables = dict(variables)
        variables["params"] = _unflatten(new)
        logger.info("Imported external weights from %s (%d leaves kept init)",
                    path, len(missing))
        return variables, True
    if ext != ".ckpt":
        logger.warning(
            "cfg.WEIGHTS=%r has unrecognized extension %r (expect .pth / "
            ".pickle / native .ckpt) — nothing loaded", path, ext,
        )
    return variables, False


def apply_pretrained(cfg, variables):
    """Full construction-time initialization chain. Returns new variables."""
    variables = load_backbone_pretrained(cfg, variables)
    variables = load_single_view_pretrained(cfg, variables)
    variables, _ = load_cfg_weights(cfg, variables)
    return variables
