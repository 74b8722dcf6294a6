"""Forward-pipeline stage breakdown at the flagship bench shape.

The official bench (~860 f/s, batch 8) implies ~9.3 ms/iter for the fused
multiview forward; the attention alone measures ~5.9 ms
(scripts/bench_attn_sweep.py).  This script times the backbone pieces
separately — R-50 trunk, trunk+deconv head — with the same chained
methodology, to locate the remaining ~3.4 ms and check the two-pass
arithmetic (2 x backbone + attention ~= full).

Run on the real TPU:  python scripts/bench_forward_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ITERS = 20


def chained(fn, x, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def step(carry, _):
        out = fn(carry)
        r = jnp.sum(out.astype(jnp.float32))
        return carry + (r * 1e-30).astype(carry.dtype), None

    ch = jax.jit(lambda f: jax.lax.scan(step, f, None, length=iters)[0])
    _ = np.asarray(jnp.sum(ch(x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jnp.sum(ch(x)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg  # same cfg as the bench
    from epipolar_transformers_tpu.models.resnet import PoseResNet

    cfg = _flagship_cfg()
    model = PoseResNet(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, 256, 256, 3).astype(np.float32))

    variables = jax.jit(
        lambda r: model.init(r, img, train=False)
    )(jax.random.PRNGKey(0))

    def trunk(x):
        # trunk_features = conv trunk + deconv (the shared two-pass prefix)
        return model.apply(variables, x, train=False,
                           method=PoseResNet.trunk_features)

    def full_backbone(x):
        # + final head conv + soft-argmax decode (single-view mode);
        # heatmaps is a tuple of stages — last stage is the output
        return model.apply(variables, x, train=False).heatmaps[-1]

    for label, fn in (("trunk+deconv", trunk),
                      ("single_view_full", full_backbone)):
        ms = chained(jax.jit(fn), img)
        print(json.dumps({"stage": label, "ms_per_iter": round(ms, 3),
                          "batch": BATCH}), flush=True)


if __name__ == "__main__":
    main()
