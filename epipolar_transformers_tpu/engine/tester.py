"""Evaluation engine: jit forward + host-side triangulation and metrics.

Equivalent of reference engine/tester.py:21-227 + the eval branches of
Modelbuilder.forward (modeling/model.py:275-400): per multiview group, run
the (epipolar) backbone on every view with its nearest neighbor view, decode
soft-argmax keypoints, triangulate to 3D on the host in float64, and
accumulate MPJPE (global + per action), JDR, and PCK.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data.pipeline import make_data_loader
from ..geometry.host import triangulate_pymvg_np
from ..metrics.metrics2d import calc_pck, jdr
from ..utils.metric_logger import MetricLogger

logger = logging.getLogger(__name__)

H36M_ACTIONS = (
    "Directions", "Discussion", "Eating", "Greeting", "Phoning", "Photo",
    "Posing", "Purchases", "Sitting", "SittingDown", "Smoking", "Waiting",
    "WalkDog", "Walking", "WalkTogether",
)


def action_name(idx: int, cfg: Config) -> str:
    if cfg.is_h36m and 0 <= idx - 2 < len(H36M_ACTIONS):
        # reference maps action ids 2..16 (multiview_h36m.py:25-89)
        return H36M_ACTIONS[idx - 2]
    return f"action{idx}"


def make_eval_step(cfg: Config, state):
    """Jitted multiview forward over one view-group (V views as the batch)."""

    def eval_step(params, batch_stats, inputs):
        variables = {"params": params, "batch_stats": batch_stats}
        _, _, out = state.apply_fn(variables, inputs, is_train=False)
        return out

    return jax.jit(eval_step)


def test(cfg: Config, state, max_batches: Optional[int] = None) -> Dict[str, float]:
    """Run evaluation; returns averaged metrics (reference tester.py:216-227)."""
    loaders = make_data_loader(cfg, is_train=False)
    eval_step = make_eval_step(cfg, state)
    meters = MetricLogger()
    resize = cfg.DATASETS.IMAGE_RESIZE * cfg.DATASETS.PREDICT_RESIZE

    for loader in loaders:
        for ib, batch in enumerate(loader):
            if max_batches is not None and ib >= max_batches:
                break
            # test batches are (B=1, V, ...) view groups; squeeze the batch
            # dim so views become the device batch (reference model.py:161-165)
            group = {k: v[0] for k, v in batch.items()}
            inputs = {
                "img": group["img"],
                "KRT": group["KRT"],
                "other_img": group["other_img"],
                "other_KRT": group["other_KRT"],
                "camera": group.get("camera"),
                "other_camera": group.get("other_camera"),
                "heatmap": group.get("heatmap"),
                "visibility": group.get("visibility"),
            }
            inputs = {k: v for k, v in inputs.items() if v is not None}
            out = eval_step(state.params, state.batch_stats, inputs)
            locs = np.asarray(out["batch_locs"], dtype=np.float64)  # (V, J, 2)
            scores = np.asarray(out["score_pred"], dtype=np.float64)  # (V, J)

            metric_dict: Dict[str, float] = {}
            if cfg.KEYPOINT.TRIANGULATION in ("pymvg", "naive", "refine"):
                pred3d = triangulate_pymvg_np(
                    locs * resize, group["K"], group["RT"], scores,
                    conf_thres=cfg.KEYPOINT.CONF_THRES,
                )
                target3d = np.asarray(group["points-3d"], dtype=np.float64)
                err = np.linalg.norm(pred3d - target3d, axis=-1)
                err = np.minimum(err, cfg.TEST.EPEMEAN_MAX_DIST)
                mpjpe = float(err.mean())
                metric_dict["EPEmean_global"] = mpjpe
                act = int(np.asarray(group["action"]).reshape(-1)[0])
                metric_dict[f"MPJPE@{action_name(act, cfg)}"] = mpjpe

            if cfg.TEST.PCK and "heatmap" in group:
                hm_pred = np.asarray(out["heatmap_pred"]).transpose(0, 3, 1, 2)
                hm_gt = np.asarray(group["heatmap"]).transpose(0, 3, 1, 2)
                _, avg_jdr, _, _ = jdr(hm_pred, hm_gt)
                metric_dict["JDR"] = float(avg_jdr)
                pcks = calc_pck(
                    locs.transpose(0, 2, 1),
                    np.asarray(group["points-2d"]).transpose(0, 2, 1),
                    np.asarray(group["visibility"]),
                    cfg.TEST.THRESHOLDS,
                )
                metric_dict.update(pcks)

            meters.update(**metric_dict)

    results = meters.get_all_avg()
    logger.info("eval: %s", results)
    return results
