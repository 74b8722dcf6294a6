"""GT-decode bound of the flagship synthetic rig (VALIDATION.md context).

The best MPJPE any heatmap model can reach on the rig is set by the decode
chain itself: render the GROUND-TRUTH heatmaps at the flagship shape
(64x64 @ stride 4, sigma 8), soft-argmax-decode every view
(ops/soft_argmax.py, golden-exact vs the reference find_tensor_peak_batch),
triangulate with the same f64 pymvg-mode DLT the tester uses, and compare
to the true 3D joints.  A trained model's eval MPJPE is meaningfully "near
the bound" only relative to this number.

Runs on CPU:  python scripts/flagship_bound.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from epipolar_transformers_tpu.config import load_config
from epipolar_transformers_tpu.data.datasets.synthetic import SyntheticMultiview
from epipolar_transformers_tpu.geometry.host import triangulate_pymvg_np
from epipolar_transformers_tpu.ops.soft_argmax import find_tensor_peak_batch


def main() -> None:
    cfg = load_config("configs/epipolar/synthetic_zresidual_flagship.yaml")
    ds = SyntheticMultiview(cfg, is_train=False, n_samples=64)

    decode = jax.jit(
        lambda hm: find_tensor_peak_batch(
            hm, cfg.KEYPOINT.SIGMA, cfg.BACKBONE.DOWNSAMPLE
        )
    )

    errs = []
    for i in range(len(ds)):
        item = ds[i]
        V = item["img"].shape[0]
        locs, scores = [], []
        for v in range(V):
            l, s = decode(jnp.asarray(item["heatmap"][v].transpose(2, 0, 1)))
            locs.append(np.asarray(l))
            scores.append(np.asarray(s))
        pred3d = triangulate_pymvg_np(
            np.stack(locs), item["K"], item["RT"], np.stack(scores)
        )
        errs.append(np.linalg.norm(pred3d - item["points-3d"], axis=-1))
    errs = np.concatenate(errs)
    print(
        f"GT-decode bound over {len(ds)} eval skeletons: "
        f"MPJPE {errs.mean():.3f} mm (p50 {np.median(errs):.3f}, "
        f"p95 {np.percentile(errs, 95):.3f}, max {errs.max():.3f})"
    )


if __name__ == "__main__":
    main()
