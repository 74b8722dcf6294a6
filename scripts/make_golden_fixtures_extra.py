"""Second golden-fixture generator: transforms, lifting, meta, oracle,
losses/metrics, fundamental matrices, heatmap rendering.

Same provenance rules as scripts/make_golden_fixtures.py (which this reuses
for the yacs/torchvision shims and deterministic weights): the ACTUAL
reference code at /root/reference runs on fixed inputs, outputs land in
tests/fixtures/, nothing is copied into this repo.

Skipped by design: triangulate_pymvg (the reference path imports the real
pymvg package, which is not installed; the algorithm — Hartley-Zisserman
DLT — is already pinned analytically in tests/test_triangulate.py).

Usage:  python scripts/make_golden_fixtures_extra.py [out_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    HERE, "..", "tests", "fixtures")

_spec = importlib.util.spec_from_file_location(
    "make_golden_fixtures", os.path.join(HERE, "make_golden_fixtures.py"))
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)


def gen_affine(rng):
    """get_affine_transform / affine_transform / transform_preds
    (reference data/transforms/image.py:218-278)."""
    from data.transforms.image import (
        affine_transform,
        get_affine_transform,
        transform_preds,
    )

    cases = []
    fixtures = {}
    for i, (center, scale, rot, out_size) in enumerate([
        ((500.0, 480.0), 5.0, 0.0, (256, 256)),
        ((480.0, 500.0), np.array([4.0, 5.0]), 30.0, (256, 256)),
        ((100.0, 900.0), 2.5, -45.0, (192, 256)),
        ((500.0, 500.0), 5.0, 0.0, (64, 64)),
    ]):
        trans = get_affine_transform(np.array(center), scale, rot,
                                     np.array(out_size))
        inv = get_affine_transform(np.array(center), scale, rot,
                                   np.array(out_size), inv=1)
        pts = rng.rand(7, 2) * 1000
        warped = np.stack([affine_transform(p, trans) for p in pts])
        restored = transform_preds(warped.copy(), np.array(center),
                                   np.array(scale if np.ndim(scale) else [scale, scale]),
                                   np.array(out_size))
        fixtures[f"case{i}__trans"] = trans.astype(np.float64)
        fixtures[f"case{i}__inv"] = inv.astype(np.float64)
        fixtures[f"case{i}__pts"] = pts
        fixtures[f"case{i}__warped"] = warped
        fixtures[f"case{i}__restored"] = restored
        cases.append([center[0], center[1],
                      scale if np.ndim(scale) == 0 else -1.0, rot,
                      out_size[0], out_size[1]])
        if np.ndim(scale):
            fixtures[f"case{i}__scale"] = np.asarray(scale, np.float64)
    fixtures["cases"] = np.asarray(cases, np.float64)
    return fixtures


def gen_keypoints3d(rng):
    """canonical_trafo / palm_coord / flip_hand
    (reference data/transforms/keypoints3d.py)."""
    from data.transforms.keypoints3d import (
        canonical_trafo,
        flip_hand,
        palm_coord,
    )

    pts42 = rng.randn(42, 3)
    palm = palm_coord(pts42)
    coords = rng.randn(21, 3)
    coords -= coords[0]
    canonical, rot = canonical_trafo(coords.copy())
    flipped = flip_hand(coords.copy())
    return {"pts42": pts42, "palm": np.asarray(palm),
            "coords": coords, "canonical": np.asarray(canonical).reshape(21, 3),
            "rot": np.asarray(rot).reshape(3, 3),
            "flipped": np.asarray(flipped).reshape(21, 3)}


def gen_heatmap(cfg, rng):
    """Gaussian scoremap rendering (reference data/transforms/keypoints2d.py
    Heatmapcreator + create_multiple_gaussian_map)."""
    from data.transforms.keypoints2d import (
        Heatmapcreator,
        create_multiple_gaussian_map,
    )

    joints = rng.rand(5, 2) * 60
    vis = np.ones(5); vis[3] = 0
    hc = Heatmapcreator((16, 16), sigma=2.0, downsample=4)
    hm = hc.get(joints.copy())
    uv = rng.rand(21, 2) * 30
    gauss = create_multiple_gaussian_map(uv.copy(), (32, 32), 4.0,
                                         valid_vec=np.ones(21))
    return {"joints": joints, "heatmap": np.asarray(hm),
            "uv": uv, "gaussmap": np.asarray(gauss)}


def gen_fundamental(rng):
    """findFundamentalMat (reference vision/multiview.py:85-147)."""
    from vision.multiview import findFundamentalMat
    import torch

    Ps = _base.camera_pair(image_size=256)
    P1 = np.broadcast_to(Ps[0], (2, 3, 4)).astype(np.float64).copy()
    P2 = np.broadcast_to(Ps[1], (2, 3, 4)).astype(np.float64).copy()
    F = findFundamentalMat(torch.from_numpy(P1), torch.from_numpy(P2),
                           engine='torch')
    return {"P1": P1, "P2": P2, "F": np.asarray(F)}


def gen_lifting(cfg, torch, rng):
    """LiftingNet forward for lifting_direct and lifting_rot under
    deterministic weights (reference modeling/lifting.py:91-199)."""
    from modeling.lifting import build_liftingnet

    fixtures = {}
    from data.transforms.keypoints2d import create_multiple_gaussian_map

    cfg.LIFTING.ENABLED = True
    cfg.LIFTING.FLIP_ON = True
    cfg.VIS.MULTIVIEW = False
    cfg.KEYPOINT.NUM_PTS = 21
    cfg.KEYPOINT.HEATMAP_SIZE = (256, 256)  # RHD crop-size scoremaps
    # realistic Gaussian scoremaps (sparse -> small npz), one set per sample
    heat = np.stack([
        create_multiple_gaussian_map(rng.rand(21, 2) * 250, (256, 256), 6.0,
                                     valid_vec=np.ones(21))  # (J, H, W)
        for _ in range(2)
    ]).astype(np.float32)
    hand_side = np.array([0.0, 1.0], np.float32)
    fixtures["heat"] = heat
    fixtures["hand_side"] = hand_side
    for task in ("lifting_direct", "lifting_rot"):
        cfg.DATASETS.TASK = task
        torch.manual_seed(3)
        net = build_liftingnet()
        net.eval()
        with torch.no_grad():
            sd = {k: torch.from_numpy(_base.det_tensor("lift::" + k, v.shape))
                  for k, v in net.state_dict().items()}
            net.load_state_dict(sd)
            can, rot, normed, _ = net(torch.from_numpy(heat),
                                      torch.from_numpy(hand_side), None)
        fixtures[f"{task}__canonical"] = can.numpy()
        if rot is not None:
            fixtures[f"{task}__rot"] = rot.numpy()
            fixtures[f"{task}__normed"] = normed.numpy()
        keys = sorted(net.state_dict().keys())
        fixtures[f"{task}__sd_keys"] = np.array(keys)
        fixtures[f"{task}__sd_shapes"] = np.array(
            ["x".join(str(int(d)) for d in net.state_dict()[k].shape)
             for k in keys])
    return fixtures


def gen_metrics(cfg, torch, rng):
    """JointsMSELoss + JDR (reference modeling/metrics/metrics2d.py)."""
    from modeling.metrics.metrics2d import JDR, JointsMSELoss

    pred = rng.rand(2, 5, 16, 16).astype(np.float32)
    gt = rng.rand(2, 5, 16, 16).astype(np.float32)
    vis = np.ones((2, 5, 1), np.float32); vis[0, 2] = 0
    crit = JointsMSELoss()
    with torch.no_grad():
        loss = crit(torch.from_numpy(pred), torch.from_numpy(gt),
                    torch.from_numpy(vis))
        # JDR consumes numpy (reference metrics2d.py:294-324)
        detected, avg_acc, cnt, final_pred = JDR(pred, gt)
    return {"pred": pred, "gt": gt, "vis": vis,
            "mse_loss": np.float64(loss.item()),
            "jdr_detected": np.asarray(detected, np.float64),
            "jdr_avg": np.float64(avg_acc)}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    cfg = _base.install_reference()
    import torch

    rng = np.random.RandomState(123)
    np.savez_compressed(os.path.join(OUT_DIR, "affine_golden.npz"),
                        **gen_affine(rng))
    print("affine_golden.npz written")
    np.savez_compressed(os.path.join(OUT_DIR, "keypoints3d_golden.npz"),
                        **gen_keypoints3d(rng))
    print("keypoints3d_golden.npz written")
    np.savez_compressed(os.path.join(OUT_DIR, "heatmap_golden.npz"),
                        **gen_heatmap(cfg, rng))
    print("heatmap_golden.npz written")
    np.savez_compressed(os.path.join(OUT_DIR, "fundamental_golden.npz"),
                        **gen_fundamental(rng))
    print("fundamental_golden.npz written")
    np.savez_compressed(os.path.join(OUT_DIR, "lifting_golden.npz"),
                        **gen_lifting(cfg, torch, rng))
    print("lifting_golden.npz written")
    np.savez_compressed(os.path.join(OUT_DIR, "metrics2d_golden.npz"),
                        **gen_metrics(cfg, torch, rng))
    print("metrics2d_golden.npz written")


if __name__ == "__main__":
    main()
