"""Evaluation engine: jit forward + host-side triangulation and metrics.

Equivalent of reference engine/tester.py:21-227 + the eval branches of
Modelbuilder.forward (modeling/model.py:275-400): per multiview group, run
the (epipolar) backbone on every view with its nearest neighbor view, decode
soft-argmax keypoints, triangulate to 3D on the host in float64
(naive/pymvg/refine/epipolar/epipolar_dlt/rpsm modes), and accumulate MPJPE
(global + per action), JDR, and PCK.  Also:
  * VIS.SAVE_PRED prediction pickles every SAVE_PRED_FREQ (tester.py:178-186);
  * TEST.TRAIN_BN evaluates with batch statistics (tester.py BN modes);
  * TEST.RECOMPUTE_BN re-estimates running stats over the eval set with
    frozen params before testing (tester.py:45-76).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data.pipeline import make_data_loader
from ..geometry.host import (
    triangulate_epipolar_np,
    triangulate_pymvg_np,
    triangulate_ransac_np,
)
from ..metrics.metrics2d import calc_pck, calculate_err, jdr
from ..utils.file_utils import pred_pickle_path
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


def make_eval_step(cfg: Config, state, train_bn: bool = False):
    """Jitted multiview forward over one view-group (V views as the batch)."""

    def eval_step(params, batch_stats, inputs):
        variables = {"params": params, "batch_stats": batch_stats}
        if train_bn:
            # TEST.TRAIN_BN: batch statistics at eval (mutated stats dropped);
            # outputs stay in eval mode (ModelBuilder bn_train flag)
            (_, _, out), _ = state.apply_fn(
                variables, inputs, is_train=False, bn_train=True,
                mutable=["batch_stats"],
            )
            return out
        _, _, out = state.apply_fn(variables, inputs, is_train=False)
        return out

    return jax.jit(eval_step)


def recompute_bn(cfg: Config, state, max_batches: Optional[int] = None):
    """TEST.RECOMPUTE_BN: refresh running statistics with frozen params by
    streaming the eval set in train mode (reference tester.py BN-recompute)."""
    from .trainer import select_model_inputs

    loaders = make_data_loader(cfg, is_train=False)

    @jax.jit
    def bn_step(params, batch_stats, inputs):
        (_, _, _), mutated = state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            inputs, is_train=True, mutable=["batch_stats"],
        )
        return mutated["batch_stats"]

    stats = state.batch_stats
    for loader in loaders:
        for ib, batch in enumerate(loader):
            if max_batches is not None and ib >= max_batches:
                break
            group = {k: v[0] for k, v in batch.items()}
            inputs = select_model_inputs(cfg, group)
            stats = bn_step(state.params, stats, inputs)
    return state.replace(batch_stats=stats)


def _triangulate(cfg: Config, group, locs, scores, out) -> np.ndarray:
    resize = cfg.DATASETS.IMAGE_RESIZE * cfg.DATASETS.PREDICT_RESIZE
    mode = cfg.KEYPOINT.TRIANGULATION
    pts = locs * resize
    if mode == "pymvg":
        return triangulate_pymvg_np(pts, group["K"], group["RT"], scores,
                                    conf_thres=cfg.KEYPOINT.CONF_THRES)
    if mode == "naive":
        return triangulate_ransac_np(pts, group["KRT"], scores,
                                     cfg.KEYPOINT.CONF_THRES, cfg.KEYPOINT.RANSAC_THRES)
    if mode == "refine":
        return triangulate_ransac_np(pts, group["KRT"], scores,
                                     cfg.KEYPOINT.CONF_THRES, cfg.KEYPOINT.RANSAC_THRES,
                                     refine=True)
    if mode in ("epipolar", "epipolar_dlt"):
        return triangulate_epipolar_np(
            pts, group["KRT"], group["K"], group["RT"], scores,
            np.asarray(out["corr_pos"], dtype=np.float64),
            group["other_KRT"],
            cfg.KEYPOINT.CONF_THRES, cfg.KEYPOINT.RANSAC_THRES,
            resize=resize, downsample=cfg.BACKBONE.DOWNSAMPLE,
            dlt=(mode == "epipolar_dlt"),
        )
    if mode == "rpsm":
        from ..geometry.body import HumanBody, compute_limb_length
        from ..geometry.pictorial import rpsm

        body = HumanBody()
        target = np.asarray(group["points-3d"], dtype=np.float64)
        gt0 = target[0] if target.ndim == 3 else target
        hm = np.asarray(out["heatmap_pred"]).transpose(0, 3, 1, 2)
        cams = np.asarray(group["origK"], dtype=np.float64) @ np.asarray(
            group["RT"], dtype=np.float64
        )
        boxes = [
            {"center": c, "scale": s}
            for c, s in zip(group["crop_center"], group["crop_scale"])
        ]
        p = cfg.PICT_STRUCT
        return rpsm(
            cams, hm, center=gt0[cfg.KEYPOINT.ROOTIDX], boxes=boxes, body=body,
            limb_length=compute_limb_length(body, gt0),
            img_size=tuple(cfg.DATASETS.IMAGE_SIZE),
            grid_size=p.GRID_SIZE, first_nbins=p.FIRST_NBINS,
            recur_nbins=p.RECUR_NBINS, recur_depth=p.RECUR_DEPTH,
            tolerance=p.LIMB_LENGTH_TOLERANCE, root_idx=cfg.KEYPOINT.ROOTIDX,
        )
    raise NotImplementedError(mode)


def _test_lifting(cfg: Config, state, max_batches: Optional[int] = None) -> Dict[str, float]:
    """Lifting-task evaluation: the model computes its own metric dict
    (EPEmean_can / EPEmean / EPEmean_global) which is aggregated as-is,
    mirroring the reference tester loop (tester.py:131-137) where
    `loss_dict, metric_dict, _ = model(batch, is_train=False)` feeds the
    MetricLogger directly.  Under VIS.MULTIVIEW, (1, V, ...) view-group
    batches are squeezed so views form the device batch
    (reference model.py:161-165)."""
    from .trainer import select_model_inputs

    loaders = make_data_loader(cfg, is_train=False)
    meters = MetricLogger()
    predictions = []

    def eval_step(params, batch_stats, inputs):
        variables = {"params": params, "batch_stats": batch_stats}
        loss_dict, metric_dict, out = state.apply_fn(variables, inputs, is_train=False)
        return loss_dict, metric_dict, out

    eval_step = jax.jit(eval_step)
    for loader in loaders:
        for ib, batch in enumerate(loader):
            if max_batches is not None and ib >= max_batches:
                break
            if cfg.VIS.MULTIVIEW:
                batch = {
                    k: (v[0] if hasattr(v, "shape") and v.ndim > 0 and v.shape[0] == 1 else v)
                    for k, v in batch.items()
                }
            inputs = select_model_inputs(cfg, batch)
            if cfg.VIS.MULTIVIEW and "points-3d" in batch:
                inputs["points-3d"] = batch["points-3d"]
            loss_dict, metric_dict, out = eval_step(state.params, state.batch_stats, inputs)
            meters.update(**{k: float(v) for k, v in {**loss_dict, **metric_dict}.items()})

            # VIS.SAVE_PRED for lifting tasks: per-sample (inputs, outputs)
            # pairs, the reference format (tester.py:178-186) that the hand
            # comparison panels consume (visualization.py:545-643).
            if cfg.VIS.SAVE_PRED and ib % cfg.VIS.SAVE_PRED_FREQ == 0:
                # one device->host fetch per KEY (not per key x sample — a
                # per-sample np.asarray(v[i]) would cost a multi-ms tunnel
                # round trip for every slice), then slice on host
                host_batch = {k: np.asarray(v) for k, v in batch.items()
                              if hasattr(v, "shape") and np.ndim(v) > 0}
                host_out = {k: np.asarray(v) for k, v in out.items()}
                bsz = host_batch["visibility"].shape[0]
                for i in range(bsz):
                    if (cfg.VIS.SAVE_PRED_LIMIT >= 0
                            and len(predictions) >= cfg.VIS.SAVE_PRED_LIMIT):
                        break
                    predictions.append((
                        {k: v[i] for k, v in host_batch.items()},
                        {k: v[i] for k, v in host_out.items()},
                    ))

    if cfg.VIS.SAVE_PRED and predictions and cfg.OUTPUT_DIR:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        path = pred_pickle_path(cfg, cfg.OUTPUT_DIR)
        with open(path, "wb") as f:
            pickle.dump(predictions, f)
        logger.info("saved %d lifting predictions to %s", len(predictions), path)

    results = meters.get_all_avg()
    logger.info("eval: %s", results)
    return results


def _dump_gt_frames(cfg: Config, group, tag: str, idx: int) -> None:
    """VIS.VIDEO_GT: ground-truth skeleton overlay frames, no model run
    (reference tester.py:100-128 draws batchdata['points-2d'] over the raw
    image and skips inference for the batch)."""
    from ..vis.visualization import dump_eval_frames

    gt2d = np.asarray(group["points-2d"], dtype=np.float64)
    out_cfg = cfg.replace(OUTPUT_DIR=os.path.join(cfg.OUTPUT_DIR, "video_gt"))
    dump_eval_frames(out_cfg, group, gt2d, tag, idx)


def test(cfg: Config, state, max_batches: Optional[int] = None) -> Dict[str, float]:
    """Run evaluation; returns averaged metrics (reference tester.py:216-227)."""
    if cfg.LIFTING.ENABLED:
        return _test_lifting(cfg, state, max_batches)
    if cfg.TEST.RECOMPUTE_BN:
        state = recompute_bn(cfg, state, max_batches)
    loaders = make_data_loader(cfg, is_train=False)
    eval_step = make_eval_step(cfg, state, train_bn=cfg.TEST.TRAIN_BN)
    meters = MetricLogger()
    predictions = []
    err_joints_acc, total_joints_acc = [], []

    for ids, loader in enumerate(loaders):
        ds_tag = f"ds{ids}"

        def process(ib, group, out):
            locs = np.asarray(out["batch_locs"], dtype=np.float64)  # (V, J, 2)
            scores = np.asarray(out["score_pred"], dtype=np.float64)  # (V, J)

            if cfg.VIS.VIDEO:
                # per-view skeleton-overlay frame dump; assemble_video
                # stitches them afterwards (reference tester.py:138-166)
                from ..vis.visualization import dump_eval_frames

                dump_eval_frames(cfg, group, locs, ds_tag, ib)

            metric_dict: Dict[str, float] = {}
            pred3d = None
            if cfg.KEYPOINT.TRIANGULATION and "points-3d" in group:
                pred3d = _triangulate(cfg, group, locs, scores, out)
                target3d = np.asarray(group["points-3d"], dtype=np.float64)
                if target3d.ndim == 3:
                    target3d = target3d[0]
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
                pcks, err_joints, total_joints = calculate_err(
                    locs.transpose(0, 2, 1),
                    np.asarray(group["points-2d"]).transpose(0, 2, 1),
                    np.asarray(group["visibility"]),
                    cfg.TEST.THRESHOLDS,
                    cfg.TEST.MAX_TH,
                )
                metric_dict.update(pcks)
                err_joints_acc.append(err_joints)
                total_joints_acc.append(total_joints)

            meters.update(**metric_dict)

            if cfg.VIS.SAVE_PRED and ib % cfg.VIS.SAVE_PRED_FREQ == 0:
                if cfg.VIS.SAVE_PRED_LIMIT < 0 or len(predictions) < cfg.VIS.SAVE_PRED_LIMIT:
                    predictions.append({
                        "batch_locs": locs, "score_pred": scores,
                        "pred3d": pred3d,
                        "gt3d": np.asarray(group.get("points-3d")),
                        "corr_pos": np.asarray(out["corr_pos"]) if "corr_pos" in out else None,
                    })

        # Double-buffered drive: dispatch the (async) eval_step for batch
        # n+1 BEFORE fetching/post-processing batch n, so the device
        # computes and streams results while the host runs f64
        # triangulation + PCK.  Holding one un-fetched output tree is safe:
        # eval loaders allocate fresh batch buffers (reuse_buffers is
        # train-only, data/pipeline.py).
        pending = None
        for ib, batch in enumerate(loader):
            if max_batches is not None and ib >= max_batches:
                break
            # test batches are (B=1, V, ...) view groups; squeeze the batch
            # dim so views become the device batch (reference model.py:161-165)
            group = {k: v[0] for k, v in batch.items()}
            if cfg.VIS.VIDEO_GT:
                # GT-overlay debug mode: dump frames, skip inference
                # (reference tester.py:100-128)
                _dump_gt_frames(cfg, group, ds_tag, ib)
                continue
            inputs = {
                k: group[k]
                for k in ("img", "KRT", "other_img", "other_KRT", "camera",
                          "other_camera", "heatmap", "visibility")
                if k in group
            }
            out = eval_step(state.params, state.batch_stats, inputs)
            if pending is not None:
                process(*pending)
            pending = (ib, group, out)
        if pending is not None:
            process(*pending)

    if cfg.VIS.SAVE_PRED and predictions and cfg.OUTPUT_DIR:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        path = pred_pickle_path(cfg, cfg.OUTPUT_DIR)
        with open(path, "wb") as f:
            pickle.dump(predictions, f)
        if err_joints_acc:
            with open(os.path.join(cfg.OUTPUT_DIR, "pck.pkl"), "wb") as f:
                pickle.dump({"err_joints": np.concatenate(err_joints_acc),
                             "total_joints": np.concatenate(total_joints_acc)}, f)
        logger.info("saved %d predictions to %s", len(predictions), path)

    results = meters.get_all_avg()
    logger.info("eval: %s", results)
    return results
