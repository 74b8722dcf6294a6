"""Benchmark: multiview fused inference throughput on one TPU chip.

Measures the flagship configuration (zresidual epipolar PoseResNet-50,
256px images, 64x64 heatmaps, K=64 epipolar samples — the reference's
33.1mm config, configs/epipolar/keypoint_h36m_zresidual_fixed.yaml):
full fused multiview inference = other-view backbone + reference backbone
+ epipolar attention + heatmap head + soft-argmax decode, per frame.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": x}

vs_baseline is against 3x the estimated V100 throughput of the reference
implementation (the BASELINE.md target '>= 3x V100 frames/sec per chip').
V100_EST_FPS is a documented engineering estimate for the reference torch
pipeline (python-loop epipolar over the batch + two ResNet-50 passes at
256px on one V100, fp32): ~55 f/s.
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_EST_FPS = 55.0
TARGET_MULTIPLIER = 3.0


def main():
    import jax

    from __graft_entry__ import _example_batch, _flagship_cfg
    from epipolar_transformers_tpu.models import ModelBuilder

    batch = 8
    cfg = _flagship_cfg()
    inputs = _example_batch(cfg, batch=batch)

    model = ModelBuilder(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, is_train=False)

    @jax.jit
    def forward(img, other_img, KRT, other_KRT):
        feed = {
            "img": img, "other_img": other_img, "KRT": KRT,
            "other_KRT": other_KRT,
        }
        _, _, out = model.apply(variables, feed, is_train=False)
        return out["batch_locs"], out["score_pred"], out["heatmap_pred"]

    args = (inputs["img"], inputs["other_img"], inputs["KRT"], inputs["other_KRT"])
    args = jax.device_put(args)

    # warmup / compile
    for _ in range(3):
        res = forward(*args)
    jax.block_until_ready(res)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        res = forward(*args)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    result = {
        "metric": "multiview_fused_inference_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / (V100_EST_FPS * TARGET_MULTIPLIER), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
