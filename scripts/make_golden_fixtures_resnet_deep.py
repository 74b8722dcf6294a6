"""Golden fixtures for PoseResNet-50 and PoseResNet-152 torch-weight import.

The graded recipes run R-50 (33.1mm) and pose-pretrained R-152 (19mm), whose
importer path (reference modeling/backbones/resnet.py:439-487 +
utils/model_serialization.py:9-108) differs from the R-18 golden in exactly
the parts that matter: Bottleneck blocks (3 convs + downsample per block)
and much deeper BN chains.  Same recipe as the committed R-18 golden
(scripts/make_golden_fixtures.py gen_poseresnet18): the reference model gets
deterministic-by-key weights (det_tensor), so only the state-dict key/shape
MANIFEST plus the outputs are stored — never the 60M-param weights.

Self-seeded (own RandomState per generator), so this script can regenerate
standalone without desynchronizing the committed sequential-stream fixtures.

Usage:  python scripts/make_golden_fixtures_resnet_deep.py [out_dir]
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


def gen_poseresnet_deep(cfg, torch, depth: int, seed: int):
    import tempfile

    cfg.FOLDER_NAME = tempfile.mkdtemp()
    from modeling.backbones.resnet import get_pose_net

    cfg.BACKBONE.BODY = f"poseR-{depth}"
    cfg.BACKBONE.PRETRAINED = False
    cfg.BACKBONE.DOWNSAMPLE = 4
    cfg.KEYPOINT.NUM_PTS = 5
    cfg.KEYPOINT.SIGMA = 2.0
    cfg.DATASETS.IMAGE_SIZE = (64, 64)
    cfg.KEYPOINT.HEATMAP_SIZE = (16, 16)
    cfg.EPIPOLAR.MERGE = "late"  # degrades to plain single-view forward

    torch.manual_seed(seed)
    model = get_pose_net(cfg)
    model.eval()
    with torch.no_grad():
        new_sd = {k: torch.from_numpy(_base.det_tensor(k, v.shape))
                  for k, v in model.state_dict().items()}
        model.load_state_dict(new_sd)

    rng = np.random.RandomState(seed)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad(), _base._force_align_corners_true(torch):
        _, heatmaps, batch_locs, batch_scos, *_ = model(torch.from_numpy(x))
    keys = sorted(model.state_dict().keys())
    shapes = ["x".join(str(int(d)) for d in model.state_dict()[k].shape)
              for k in keys]
    return {
        "x": x,
        "heatmap": heatmaps[-1].numpy(),
        "batch_locs": batch_locs.numpy(),
        "batch_scos": batch_scos.numpy(),
        "sd_keys": np.array(keys),
        "sd_shapes": np.array(shapes),
    }


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    cfg = _base.install_reference()
    import torch

    for depth, seed in ((50, 50), (152, 152)):
        out = gen_poseresnet_deep(cfg, torch, depth, seed)
        path = os.path.join(OUT_DIR, f"poseresnet{depth}_golden.npz")
        np.savez_compressed(path, **out)
        print(f"poseresnet{depth}_golden.npz written "
              f"({len(out['sd_keys'])} sd keys)")


if __name__ == "__main__":
    main()
