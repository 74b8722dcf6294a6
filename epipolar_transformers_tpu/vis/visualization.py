"""Offline visualization / introspection tools.

Equivalents of reference vision/visualization.py:319-643 + scripts/video.py:
  * pointcloud export: saved eval predictions -> per-sample pickle dumps for
    notebook viewers (visualization.py:320-466);
  * epipolar-line introspection: run a live Epipolar module on a batch and
    dump sample locations / attention weights / correspondence maps
    (the data side of the interactive Cursor tooling, :472-537);
  * AUC curves from accumulated PCK counts (:178-190);
  * video assembly: frame dumps -> side-by-side mp4 grid (scripts/video.py).

All functions are headless: they write files rather than opening windows
(interactive matplotlib cursors have no place on a TPU pod).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from ..utils.file_utils import pred_pickle_path


def export_pointclouds(predictions_path: str, out_dir: str, limit: int = -1):
    """Eval prediction dumps -> per-sample pkl point clouds
    (reference visualization.py:320-466 stores {pred3d, gt3d, locs, scos})."""
    with open(predictions_path, "rb") as f:
        preds = pickle.load(f)
    os.makedirs(out_dir, exist_ok=True)
    n = len(preds) if limit < 0 else min(limit, len(preds))
    for i in range(n):
        with open(os.path.join(out_dir, f"pointcloud_{i:05d}.pkl"), "wb") as f:
            pickle.dump(preds[i], f)
    return n


def epipolar_introspection(cfg, variables, batch: Dict[str, np.ndarray],
                           out_path: Optional[str] = None):
    """Run the Epipolar layer in debug mode on real features and dump every
    geometric intermediate (reference Epipolar(debug=True) returns
    sample_locs/intersections/etc., epipolar.py:264-265 + visualization.py:
    472-537).  Returns the dict (and writes it when out_path given)."""
    import jax
    import jax.numpy as jnp

    from ..models.epipolar import Epipolar
    from ..ops.epipolar_sampling import epipolar_sample_locs

    model = Epipolar(cfg)
    geom = model.geometry

    P1 = jnp.asarray(batch["KRT"], dtype=jnp.float32)
    P2 = jnp.asarray(batch["other_KRT"], dtype=jnp.float32)
    sample_locs = jax.vmap(lambda a, b: epipolar_sample_locs(a, b, geom))(P1, P2)

    feat1 = jnp.asarray(batch["feat"])
    feat2 = jnp.asarray(batch["other_feat"])
    out, corr_pos, depth, _ = model.apply(
        variables, feat1, feat2, P1, P2, train=False
    )
    dump = {
        "sample_locs": np.asarray(sample_locs),
        "corr_pos": np.asarray(corr_pos),
        "attention": np.asarray(depth),
        "fused": np.asarray(out),
    }
    if out_path:
        with open(out_path, "wb") as f:
            pickle.dump(dump, f)
    return dump


def auc_curve(err_joints: np.ndarray, total_joints: np.ndarray,
              max_threshold: float):
    """Accumulated per-image error counts -> (thresholds, accuracy, AUC)
    (reference visualization.py:178-190 + metrics2d.py:111-116)."""
    thresholds = np.linspace(0, max_threshold, num=int(max_threshold))
    acc = err_joints.sum(axis=0) / max(total_joints.sum(), 1)
    # trapezoidal AUC normalized by the threshold range
    trapezoid = getattr(np, "trapezoid", np.trapz)
    auc = trapezoid(acc, thresholds) / max_threshold
    return thresholds, acc, float(auc)


def render_pose_frame(img_norm: np.ndarray, joints: np.ndarray,
                      kind: str = "human36m",
                      visibility: Optional[np.ndarray] = None) -> np.ndarray:
    """Headless skeleton-overlay frame (uint8 BGR) for the eval video dump
    (reference tester.py:138-166 draws with matplotlib; cv2 here).

    Args:
        img_norm: (H, W, 3) ImageNet-normalized float image (dataset 'img').
        joints: (J, 2) predicted image-coord keypoints.
        kind: CONNECTIVITY_DICT key, or 'hand' for the 21-joint bones.
    """
    import cv2

    from ..data.transforms.affine import de_normalize_image
    from .skeletons import CONNECTIVITY_DICT, HAND_BONES

    img = np.clip(de_normalize_image(np.asarray(img_norm)) * 255, 0, 255)
    frame = np.ascontiguousarray(img.astype(np.uint8)[..., ::-1])  # RGB->BGR
    if kind == "hand":
        bones = [b for finger in HAND_BONES for b in finger]
    else:
        bones = CONNECTIVITY_DICT[kind]
    joints = np.asarray(joints)
    vis = (np.asarray(visibility).reshape(-1) > 0 if visibility is not None
           else np.ones(len(joints), bool))
    for a, b in bones:
        if a < len(joints) and b < len(joints) and vis[a] and vis[b]:
            cv2.line(frame, tuple(np.int32(joints[a])), tuple(np.int32(joints[b])),
                     (0, 255, 0), 1, cv2.LINE_AA)
    for j, (x, y) in enumerate(joints):
        if vis[j]:
            cv2.circle(frame, (int(x), int(y)), 2, (0, 0, 255), -1, cv2.LINE_AA)
    return frame


def dump_eval_frames(cfg, group: Dict[str, np.ndarray], locs: np.ndarray,
                     dataset_tag: str, idx: int) -> int:
    """Per-view frame dump during eval (reference tester.py:138-166): writes
    OUTPUT_DIR/video/<dataset>/view<k>/%08d.png; assemble_video stitches the
    per-view dirs into the mp4 grid afterwards.  Returns #frames written."""
    import cv2

    if not cfg.OUTPUT_DIR:
        return 0
    imgs = np.asarray(group["img"])
    if imgs.ndim == 3:
        imgs = imgs[None]
    locs = np.asarray(locs)
    if locs.ndim == 2:
        locs = locs[None]
    kind = "hand" if cfg.LIFTING.ENABLED else (
        "human36m" if cfg.KEYPOINT.NUM_PTS in (17, 20) else "mpii")
    vis = group.get("visibility")
    n = 0
    for v in range(imgs.shape[0]):
        vvis = None if vis is None else np.asarray(vis)[v] if np.asarray(vis).ndim > 1 else vis
        frame = render_pose_frame(imgs[v], locs[v], kind=kind, visibility=vvis)
        out_dir = os.path.join(cfg.OUTPUT_DIR, "video", dataset_tag, f"view{v}")
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(out_dir, f"{idx:08d}.png"), frame)
        n += 1
    return n


def dump_epipolar_debug_pair(cfg, ret: Dict[str, np.ndarray], idx: int) -> Optional[str]:
    """VIS.MULTIVIEWH36M: headless analog of the reference's in-dataset
    matplotlib debug view (multiview_h36m.py:159-243) — side-by-side
    ref/other frames with GT 2D keypoints (red), the GT 3D reprojection
    into the other view (red on green), and the epipolar lines of a probe
    column transferred through the fundamental matrix.  Written to
    OUTPUT_DIR/debug_multiview/%08d.png."""
    import cv2

    if not cfg.OUTPUT_DIR:
        return None
    from ..data.transforms.affine import de_normalize_image
    from ..geometry.camera import fundamental_matrix

    img1 = np.clip(de_normalize_image(np.asarray(ret["img"])) * 255,
                   0, 255).astype(np.uint8)[..., ::-1]
    img2 = np.clip(de_normalize_image(np.asarray(ret["other_img"])) * 255,
                   0, 255).astype(np.uint8)[..., ::-1]
    f1, f2 = np.ascontiguousarray(img1), np.ascontiguousarray(img2)
    H, W = f1.shape[:2]
    P1 = np.asarray(ret["KRT"], np.float64)
    P2 = np.asarray(ret["other_KRT"], np.float64)
    F = np.asarray(fundamental_matrix(P1, P2))

    for x, y in np.asarray(ret["points-2d"]).reshape(-1, 2):
        cv2.circle(f1, (int(x), int(y)), 3, (0, 0, 255), -1)
    if "points-3d" in ret:
        X = np.asarray(ret["points-3d"], np.float64).reshape(-1, 3)
        proj = (P2 @ np.concatenate([X, np.ones((len(X), 1))], 1).T)
        proj = (proj[:2] / proj[2]).T
        for x, y in proj:
            if np.isfinite([x, y]).all():
                cv2.circle(f2, (int(x), int(y)), 3, (0, 0, 255), -1)

    # probe column in view 1 -> epipolar lines in view 2 (reference's
    # test_points at x=128, y in linspace)
    n = 8
    probes = np.stack([np.full(n, W // 2), np.linspace(10, H - 10, n),
                       np.ones(n)], axis=1)
    lines = (F @ probes.T).T
    for i, l in enumerate(lines):
        if abs(l[1]) < 1e-12:
            continue
        x0, x1 = 0, W - 1
        # F's scale is arbitrary: a near-vertical line makes y0/y1 overflow
        # cv2's C-int coordinates (raising inside the producer thread under
        # VIS.MULTIVIEWH36M) — clamp to a generous band around the image
        lim = 32 * max(H, W)
        y0 = int(np.clip((-l[2] - l[0] * x0) / l[1], -lim, lim))
        y1 = int(np.clip((-l[2] - l[0] * x1) / l[1], -lim, lim))
        color = tuple(int(c) for c in np.array([60 + 24 * i, 255 - 24 * i, 80]))
        cv2.line(f2, (x0, y0), (x1, y1), color, 1, cv2.LINE_AA)
        cv2.circle(f1, (int(probes[i, 0]), int(probes[i, 1])), 3, color, -1)

    out_dir = os.path.join(cfg.OUTPUT_DIR, "debug_multiview")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{idx:08d}.png")
    cv2.imwrite(path, np.concatenate([f1, f2], axis=1))
    return path


def hand_comparison_panels(predictions_path: str, out_dir: str,
                           limit: int = -1) -> int:
    """Per-sample 3D hand pred-vs-GT comparison panels — the reference's
    DEFAULT visualization mode (visualization.py:545-643): from saved
    lifting predictions [(inputs, outputs), ...], render a 2x3 grid of 3D
    panels per sample — canonical GT / canonical pred / overlay on the top
    row, view-normed GT / pred / overlay on the bottom — each at the
    reference's camera-aligned view (azim=-90, elev=-90).  Headless: writes
    PNGs instead of plt.show().  Returns #panels written.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .skeletons import plot_hand_3d

    with open(predictions_path, "rb") as f:
        preds = pickle.load(f)
    os.makedirs(out_dir, exist_ok=True)
    n = len(preds) if limit < 0 else min(limit, len(preds))
    written = 0
    for i in range(n):
        inputs, pred = preds[i]
        vis = np.asarray(inputs["visibility"]).reshape(-1)[:, None]
        can_gt = np.asarray(inputs["can-points-3d"]) * vis
        can_pred = np.asarray(pred["can_pred"]) * vis
        panels = [("canonical GT", [can_gt]), ("canonical pred", [can_pred]),
                  ("canonical overlay", [can_gt, can_pred])]
        if "normed_pred" in pred and "normed-points-3d" in inputs:
            normed_gt = np.asarray(inputs["normed-points-3d"]) * vis
            normed_pred = np.asarray(pred["normed_pred"]) * vis
            panels += [("normed GT", [normed_gt]), ("normed pred", [normed_pred]),
                       ("normed overlay", [normed_gt, normed_pred])]
        rows = -(-len(panels) // 3)
        fig = plt.figure(figsize=(9, 3 * rows))
        occ = vis[:, 0] > 0
        for p, (title, hands) in enumerate(panels):
            ax = fig.add_subplot(rows, 3, p + 1, projection="3d")
            for h, coords in enumerate(hands):
                # overlay: GT in fixed gray, prediction in per-finger colors
                plot_hand_3d(coords, ax, occlusion=occ,
                             color_fixed="0.6" if (len(hands) > 1 and h == 0) else None)
            ax.view_init(azim=-90.0, elev=-90.0)  # camera-aligned, reference :617
            ax.set_title(title, fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"hand_panel_{i:05d}.png"), dpi=80)
        plt.close(fig)
        written += 1
    return written


def visualization(cfg):
    """CLI visualization dispatch (reference main.py:65-72 ->
    vision/visualization.py:319-643), keyed by the VIS.* flags:

      POINTCLOUD  — saved eval predictions -> per-sample pkl point clouds
      EPIPOLAR_LINE / CURSOR — live epipolar introspection dump on a batch
      AUC         — accumulated PCK counts -> AUC curve file
      VIDEO       — stitch the tester's frame dumps into an mp4 grid
      (default, lifting tasks) — 3D hand pred-vs-GT comparison panels from
      the saved predictions, the reference's flagless default mode
      (visualization.py:545-643)

    Returns a dict describing what was produced (empty if no flag set).
    """
    produced = {}
    out_dir = cfg.OUTPUT_DIR or "."

    if cfg.LIFTING.ENABLED:
        pred_path = pred_pickle_path(cfg, out_dir)
        if os.path.isfile(pred_path):
            produced["hand_panels"] = hand_comparison_panels(
                pred_path, os.path.join(out_dir, "hand_panels"),
                cfg.VIS.SAVE_PRED_LIMIT)

    if cfg.VIS.POINTCLOUD:
        pred_path = pred_pickle_path(cfg, out_dir)
        pc_dir = os.path.join(out_dir, "pointclouds")
        produced["pointclouds"] = export_pointclouds(pred_path, pc_dir,
                                                     cfg.VIS.SAVE_PRED_LIMIT)

    if cfg.VIS.EPIPOLAR_LINE or cfg.VIS.CURSOR:
        produced["epipolar_introspection"] = _run_epipolar_introspection(cfg)

    if cfg.VIS.AUC:
        pck_path = os.path.join(out_dir, "pck.pkl")
        with open(pck_path, "rb") as f:
            pck = pickle.load(f)
        thresholds, acc, auc = auc_curve(
            pck["err_joints"], pck["total_joints"], cfg.TEST.MAX_TH)
        auc_path = os.path.join(out_dir, "auc.pkl")
        with open(auc_path, "wb") as f:
            pickle.dump({"thresholds": thresholds, "acc": acc, "auc": auc}, f)
        produced["auc"] = auc

    if cfg.VIS.VIDEO:
        video_root = os.path.join(out_dir, "video")
        tags = (
            [t for t in sorted(os.listdir(video_root))
             if os.path.isdir(os.path.join(video_root, t))]
            if os.path.isdir(video_root) else []
        )  # a prior run's <tag>.mp4 files live alongside the tag dirs
        for tag in tags:
            view_dirs = sorted(
                os.path.join(video_root, tag, d)
                for d in os.listdir(os.path.join(video_root, tag))
                if d.startswith("view"))
            if view_dirs:
                mp4 = os.path.join(video_root, f"{tag}.mp4")
                produced[f"video/{tag}"] = assemble_video(view_dirs, mp4)
    return produced


def _run_epipolar_introspection(cfg):
    """Build a live Epipolar module on one eval batch and dump every
    geometric intermediate (reference visualization.py:472-537)."""
    import jax

    from ..data.pipeline import make_data_loader

    loader = make_data_loader(cfg, is_train=False)[0]
    batch = next(iter(loader))
    group = {k: np.asarray(v)[0] for k, v in batch.items()}

    from ..models.epipolar import Epipolar

    model = Epipolar(cfg)
    nfeats = cfg.KEYPOINT.NUM_PTS
    h, w = cfg.KEYPOINT.HEATMAP_SIZE
    feat1 = np.asarray(group["heatmap"], np.float32)
    feat2 = np.asarray(group.get("other_heatmap", group["heatmap"]), np.float32)
    if feat1.ndim == 3:
        feat1, feat2 = feat1[None], feat2[None]
    P1 = np.asarray(group["KRT"], np.float32).reshape(-1, 3, 4)[:1]
    P2 = np.asarray(group["other_KRT"], np.float32).reshape(-1, 3, 4)[:1]
    variables = model.init(jax.random.PRNGKey(0), feat1[:1], feat2[:1], P1, P2,
                           train=False)
    out_path = os.path.join(cfg.OUTPUT_DIR or ".", "epipolar_introspection.pkl")
    os.makedirs(cfg.OUTPUT_DIR or ".", exist_ok=True)
    dump = epipolar_introspection(
        cfg, variables,
        {"feat": feat1[:1], "other_feat": feat2[:1], "KRT": P1, "other_KRT": P2},
        out_path=out_path,
    )
    return {k: np.asarray(v).shape for k, v in dump.items()}


def assemble_video(frame_dirs, out_path: str, fps: int = 10, grid_cols: int = 2):
    """Side-by-side mp4 from per-view frame directories
    (reference scripts/video.py:44-125)."""
    import cv2

    frame_lists = [sorted(os.listdir(d)) for d in frame_dirs]
    n_frames = min(len(fl) for fl in frame_lists)
    assert n_frames > 0, "no frames found"
    first = cv2.imread(os.path.join(frame_dirs[0], frame_lists[0][0]))
    h, w = first.shape[:2]
    rows = -(-len(frame_dirs) // grid_cols)
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w * grid_cols, h * rows)
    )
    for i in range(n_frames):
        canvas = np.zeros((h * rows, w * grid_cols, 3), np.uint8)
        for v, (d, fl) in enumerate(zip(frame_dirs, frame_lists)):
            img = cv2.imread(os.path.join(d, fl[i]))
            r, c = divmod(v, grid_cols)
            canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
        writer.write(canvas)
    writer.release()
    return n_frames
