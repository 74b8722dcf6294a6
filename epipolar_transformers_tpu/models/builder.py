"""Task-level model builder (Flax).

Equivalent of the reference `Modelbuilder` (modeling/model.py:25-493), minus
the host-side eval bookkeeping (triangulation + PCK/JDR live in
engine/tester.py — they are not part of the differentiable graph).

The jit boundary: `__call__` computes the forward pass and the loss dict for
a batch; everything it returns is a jnp array.  Reference behavior mirrored:
  * multiview_keypoint: sibling backbone on the other view (shared weights
    when EPIPOLAR.SHARE_WEIGHTS, model.py:44-46), epipolar reference model on
    the target view, heatmap loss keyed by KEYPOINT.LOSS;
  * keypoint: single-view PoseResNet + heatmap loss;
  * lifting family: LiftingNet on GT heatmaps or backbone features, masked
    MSE on visible joints (+ rotation MSE for *_rot).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..losses.heatmap_loss import (
    compute_stage_loss,
    joints_mse_loss,
    keypoints_mse_smooth_loss,
)
from ..metrics.metrics3d import epe_mean, epe_mean_multiview_gt
from .lifting import LiftingNet
from .registry import BACKBONES


class ModelBuilder(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        task = c.DATASETS.TASK
        if task in ("multiview_keypoint", "multiview_img_lifting_rot"):
            self.reference = BACKBONES[c.BACKBONE.BODY](c, name="reference")
            if c.EPIPOLAR.SHARE_WEIGHTS:
                self.backbone = self.reference
            else:
                single_body = c.BACKBONE.BODY.replace("epipolarpose", "pose")
                self.backbone = BACKBONES[single_body](
                    c.replace(BACKBONE=c.BACKBONE.replace(BODY=single_body)),
                    name="backbone",
                )
            if task == "multiview_img_lifting_rot":
                self.liftingnet = LiftingNet(c, name="liftingnet")
        elif task in ("keypoint", "keypoint_lifting_rot", "keypoint_lifting_direct"):
            self.backbone = BACKBONES[c.BACKBONE.BODY](c, name="backbone")
            if task != "keypoint":
                self.liftingnet = LiftingNet(c, name="liftingnet")
        elif task == "img_lifting_rot":
            self.backbone = BACKBONES[c.BACKBONE.BODY](c, name="backbone")
            self.liftingnet = LiftingNet(
                c, in_channels=self.backbone.out_channels, name="liftingnet"
            )
        elif c.LIFTING.ENABLED:
            self.liftingnet = LiftingNet(c, name="liftingnet")
        else:
            raise NotImplementedError(task)

    # ------------------------------------------------------------------ #

    def _heatmap_loss(self, pred_stages, scoremap, vis):
        c = self.cfg
        loss_dict = {}
        if c.KEYPOINT.LOSS == "joint":
            loss_dict["stage_loss0"] = joints_mse_loss(
                pred_stages[0], scoremap, vis, per_joint_sum=c.KEYPOINT.LOSS_PER_JOINT
            )
        elif c.KEYPOINT.LOSS == "smoothmse":
            loss_dict["stage_loss0"] = keypoints_mse_smooth_loss(pred_stages[0], scoremap, vis)
        else:  # 'mse'
            _, stage_losses = compute_stage_loss(pred_stages, scoremap)
            for i, l in enumerate(stage_losses):
                loss_dict[f"stage_loss{i}"] = l
        return loss_dict

    def __call__(
        self,
        inputs: Dict[str, Any],
        is_train: bool = True,
        bn_train: bool = False,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """
        Args (inputs dict, all NHWC):
            img: (N, H, W, 3); other_img: (N, H, W, 3) or (O, N, H, W, 3);
            heatmap: GT scoremaps (N, h, w, J); visibility: (N, J[, ...]);
            KRT/other_KRT: (N, 3, 4); camera/other_camera: (N,); plus the
            lifting-task keys (can-points-3d, normed-points-3d, rotation,
            hand-side, scale, unit).
        Returns:
            (loss_dict, metric_dict, out) — `loss_dict['loss']` is the total.
        """
        c = self.cfg
        task = c.DATASETS.TASK
        # TEST.TRAIN_BN: batch statistics at eval without enabling train outputs
        net_train = is_train or bn_train
        loss_dict: Dict[str, jnp.ndarray] = {}
        metric_dict: Dict[str, jnp.ndarray] = {}
        out: Dict[str, jnp.ndarray] = {}

        if task in ("keypoint", "multiview_keypoint"):
            if task == "multiview_keypoint" and c.EPIPOLAR.MULTITEST and not is_train:
                return self._multitest_forward(inputs)
            if task == "multiview_keypoint" and self._can_fuse_trunks(net_train):
                # eval fast path: the reference/other passes share the whole
                # trunk+deconv prefix under MERGE='late' + SHARE_WEIGHTS, and
                # eval BN uses running stats — so ONE 2N-batch trunk call is
                # numerically identical to two N-batch passes and twice as
                # MXU-efficient (the reference always runs two, model.py:241-247)
                both = jnp.concatenate([inputs["img"], inputs["other_img"]], axis=0)
                feats = self.reference.trunk_features(both, train=net_train)
                feat_ref, other_features = jnp.split(feats, 2, axis=0)
                bb = self.reference.head_from_features(
                    feat_ref,
                    other_features=other_features,
                    other_KRT=inputs["other_KRT"],
                    KRT=inputs["KRT"],
                    camera=inputs.get("camera"),
                    other_camera=inputs.get("other_camera"),
                    train=net_train,
                    decode_peaks=not is_train,
                )
            elif task == "multiview_keypoint":
                other_img = inputs["other_img"]
                # reference keeps the sibling backbone in train mode but wraps
                # it in no_grad unless OTHER_GRAD (model.py:241-244)
                other_out = self.backbone(other_img, train=net_train, decode_peaks=False)
                # PoseResNet: single deconv map; Hourglass: tuple of
                # per-merge-point maps (reference model.py:244 passes the
                # backbone's `features` return straight through)
                other_features = other_out.features
                if not c.EPIPOLAR.OTHER_GRAD:
                    other_features = jax.tree_util.tree_map(
                        jax.lax.stop_gradient, other_features
                    )
                bb = self.reference(
                    inputs["img"],
                    other_features=other_features,
                    other_KRT=inputs["other_KRT"],
                    KRT=inputs["KRT"],
                    camera=inputs.get("camera"),
                    other_camera=inputs.get("other_camera"),
                    train=net_train,
                    decode_peaks=not is_train,
                )
            else:
                bb = self.backbone(inputs["img"], train=net_train, decode_peaks=not is_train)

            scoremap = inputs.get("heatmap")
            vis = inputs.get("visibility")
            if scoremap is not None and is_train:
                loss_dict.update(self._heatmap_loss(bb.heatmaps, scoremap, vis))

            if (
                task == "multiview_keypoint"
                and is_train
                and c.EPIPOLAR.REPROJECT_LOSS_WEIGHT != 0
                and bb.depth is not None
                and bb.sample_locs is not None
            ):
                from ..ops.epipolar_reproject import (
                    gt_grid,
                    reproject_consistency,
                    reprojection_loss,
                )

                sampler = self.reference.epipolar_sampler
                geom = sampler.geometry
                params = sampler.attention_params
                reproj, mask = jax.vmap(
                    lambda f1, f2, sl, d, P1, P2: reproject_consistency(
                        f1, f2, sl, d, P1, P2, geom, params
                    )
                )(
                    bb.features, other_features, bb.sample_locs, bb.depth,
                    inputs["KRT"].astype(jnp.float32),
                    inputs["other_KRT"].astype(jnp.float32),
                )
                grid = jnp.asarray(gt_grid(geom))
                loss_dict["reproject_loss"] = (
                    c.EPIPOLAR.REPROJECT_LOSS_WEIGHT
                    * reprojection_loss(reproj, grid[None], mask)
                )

            out["heatmap_pred"] = bb.heatmaps[-1]
            if bb.locs is not None:
                out["batch_locs"] = bb.locs
                out["score_pred"] = bb.scores
            if bb.corr_pos is not None:
                out["corr_pos"] = bb.corr_pos
                out["depth"] = bb.depth
            if bb.sample_locs is not None and c.VIS.EPIPOLAR_LINE:
                out["sample_locs"] = bb.sample_locs

        elif c.LIFTING.ENABLED:
            scoremap = inputs.get("heatmap")
            hand_side = inputs.get("hand-side")
            vis = inputs["visibility"]
            target = inputs.get("can-points-3d")
            normed_target = inputs.get("normed-points-3d")
            rot_target = inputs.get("rotation")
            if task in ("lifting_direct", "keypoint_lifting_direct"):
                target = normed_target

            fused_bb = None
            if task == "keypoint_lifting_direct":
                bb = self.backbone(inputs["img"], train=False, decode_peaks=False)
                feat = bb.heatmaps[-1]
            elif task == "multiview_img_lifting_rot":
                # Reference model.py:416-419: sibling backbone runs the other
                # view under no_grad (unconditionally — no OTHER_GRAD check
                # for this task), then the epipolar reference model fuses the
                # views; the lifting consumes the fused prediction.  The
                # reference's own branch is bit-rotted (it 4-unpacks the
                # backbone's 8-tuple, and see LiftingNet._use_image_features
                # for the forward/__init__ contradiction), so this implements
                # the documented intent: fused heatmaps -> pool=2 lifting.
                other_out = self.backbone(
                    inputs["other_img"], train=net_train, decode_peaks=False
                )
                other_features = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, other_out.features
                )
                fused_bb = self.reference(
                    inputs["img"],
                    other_features=other_features,
                    other_KRT=inputs["other_KRT"],
                    KRT=inputs["KRT"],
                    camera=inputs.get("camera"),
                    other_camera=inputs.get("other_camera"),
                    train=net_train,
                    decode_peaks=not is_train,
                )
                feat = fused_bb.heatmaps[-1]
            elif self._uses_backbone_features(task):
                feat = self.backbone(inputs["img"], train=is_train)
            else:
                feat = scoremap

            coords, R, normed, global_pred = self.liftingnet(
                feat, hand_side, inputs.get("R"), train=is_train,
                multiview=(not is_train) and c.VIS.MULTIVIEW,
            )
            out = {"can_pred": coords}
            if fused_bb is not None:
                out["heatmap_pred"] = fused_bb.heatmaps[-1]
                if fused_bb.locs is not None:
                    out["batch_locs"] = fused_bb.locs
                    out["score_pred"] = fused_bb.scores
            if R is not None:
                out["R_pred"] = R
                out["normed_pred"] = normed

            vis2 = vis
            while vis2.ndim > 2:
                vis2 = vis2[..., 0]
            vis_mask = vis2.astype(jnp.float32)[..., None]
            vis_can = coords * vis_mask
            vis_tar = target * vis_mask
            N = coords.shape[0]
            if c.LIFTING.AVELOSS_KP:
                loss = jnp.mean((vis_can - vis_tar) ** 2)
            else:
                loss = jnp.sum((vis_can - vis_tar) ** 2) / N
            loss_dict["xyz_loss"] = loss
            metric_dict["EPEmean_can"], _ = epe_mean(
                coords, target, vis2, inputs.get("scale"), inputs.get("unit"),
                max_dist=c.TEST.EPEMEAN_MAX_DIST,
            )
            if "lifting_rot" in task:
                loss_dict["rot_loss"] = jnp.mean((R - rot_target) ** 2)
                metric_dict["EPEmean"], _ = epe_mean(
                    normed, normed_target, vis2, inputs.get("scale"), inputs.get("unit"),
                    max_dist=c.TEST.EPEMEAN_MAX_DIST,
                )
                if (
                    (not is_train) and c.VIS.MULTIVIEW
                    and global_pred is not None and "points-3d" in inputs
                ):
                    # multiview global-frame fusion (reference model.py:461-476):
                    # under the VIS.MULTIVIEW squeeze the batch axis is the
                    # view axis of ONE sample; global targets/predictions are
                    # made relative to view 0's prediction / the root joint,
                    # then fused by mean (or lower-median) over views, or
                    # bounded by the nearest-to-GT oracle.
                    unit = inputs.get("unit")
                    unit0 = unit[0] if unit is not None and jnp.ndim(unit) >= 1 else unit
                    scale = inputs.get("scale")
                    # (V,) -> (V, 1, 1) so it broadcasts over (V, J, 3);
                    # datasets without 'scale' fuse unscaled
                    kp_scale = (
                        scale[:, None, None] if scale is not None else 1.0
                    )
                    target_global = inputs["points-3d"]
                    tg = target_global[0]
                    tg = tg - tg[0]
                    gp = (global_pred - global_pred[0]) * kp_scale
                    if c.LIFTING.MULTIVIEW_UPPERBOUND:
                        if target.shape[1] < 100:
                            metric_dict["EPEmean_global"] = epe_mean_multiview_gt(
                                gp, tg, vis2, unit=unit0 if unit0 is not None else 1.0,
                            )
                    else:
                        if c.LIFTING.MULTIVIEW_MEDIUM:
                            # torch .median(0) = LOWER median (no averaging
                            # of the two middle views), reference lifting
                            # fusion at model.py:472-473
                            V = gp.shape[0]
                            fused = jnp.sort(gp, axis=0)[(V - 1) // 2]
                        else:
                            fused = jnp.mean(gp, axis=0)
                        if target.shape[1] < 100:
                            metric_dict["EPEmean_global"], _ = epe_mean(
                                fused, tg, vis2[0], unit=unit0,
                                max_dist=c.TEST.EPEMEAN_MAX_DIST,
                            )
        else:
            raise NotImplementedError(task)

        # total loss (reference model.py:478-484)
        if len(loss_dict) > 1:
            loss_dict["loss"] = sum(loss_dict.values())
        elif len(loss_dict) == 1:
            (_, only), = loss_dict.items()
            loss_dict = {"loss": only}
        return loss_dict, metric_dict, out

    def _multitest_forward(self, inputs):
        """MULTITEST eval: run the epipolar model against EVERY candidate
        other view and keep, per joint, the locs with the max confidence
        (reference model.py:213-239).

        `other_img`/`other_KRT` carry a leading candidate axis (O, N, ...).
        """
        c = self.cfg
        other_imgs = inputs["other_img"]  # (O, N, H, W, 3)
        other_KRTs = inputs["other_KRT"]  # (O, N, 3, 4)

        all_locs, all_scos = [], []
        for other_img_i, other_KRT_i in zip(other_imgs, other_KRTs):
            other_out = self.backbone(other_img_i, train=False, decode_peaks=False)
            bb = self.reference(
                inputs["img"],
                other_features=other_out.features,
                other_KRT=other_KRT_i,
                KRT=inputs["KRT"],
                train=False,
            )
            all_locs.append(bb.locs)
            all_scos.append(bb.scores)
        all_locs = jnp.stack(all_locs)  # (O, N, J, 2)
        all_scos = jnp.stack(all_scos)  # (O, N, J)
        best = jnp.argmax(all_scos, axis=0)  # (N, J)
        batch_scos = jnp.max(all_scos, axis=0)
        batch_locs = jnp.take_along_axis(
            all_locs, best[None, ..., None], axis=0
        )[0]
        out = {
            "heatmap_pred": bb.heatmaps[-1],
            "batch_locs": batch_locs,
            "score_pred": batch_scos,
        }
        return {}, {}, out

    def _can_fuse_trunks(self, net_train: bool) -> bool:
        """Eval-only 2N-batch trunk fusion is valid when the two passes are
        the same function: shared weights, late merge (no fusion inside the
        trunk), and BN on running statistics (not net_train — covers both
        training and TEST.TRAIN_BN)."""
        c = self.cfg
        return (
            not net_train
            and c.EPIPOLAR.SHARE_WEIGHTS
            and c.EPIPOLAR.MERGE == "late"
            and not c.EPIPOLAR.WARPEDHEATMAP
            and hasattr(self.reference, "trunk_features")
        )

    @staticmethod
    def _uses_backbone_features(task: str) -> bool:
        # multiview_img_lifting_rot takes the dedicated fused-heatmap branch
        return task == "img_lifting_rot"
