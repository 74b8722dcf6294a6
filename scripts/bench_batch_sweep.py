"""Probe: flagship fused-inference throughput vs batch size on the chip.

Same chained-dependency methodology as bench.py (no subtraction, one fetch
forces the whole chain); sweeps BATCH to find the throughput knee.  Used to
pick bench.py's BATCH (results in PERF.md).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_cfg
    from epipolar_transformers_tpu.models import ModelBuilder

    cfg = _flagship_cfg()
    model = ModelBuilder(cfg)

    for batch in (4, 8, 16, 32):
        inputs = _example_batch(cfg, batch=batch)
        variables = jax.jit(
            lambda rng: model.init(rng, inputs, is_train=False)
        )(jax.random.PRNGKey(0))

        @jax.jit
        def step(img, other_img, KRT, other_KRT):
            feed = {"img": img, "other_img": other_img,
                    "KRT": KRT, "other_KRT": other_KRT}
            _, _, out = model.apply(variables, feed, is_train=False)
            locs, scores = out["batch_locs"], out["score_pred"]
            feedback = (jnp.mean(scores) + jnp.mean(locs)) * jnp.asarray(
                1e-30, img.dtype)
            return img + feedback, jnp.sum(scores)

        args = jax.device_put(
            (inputs["img"], inputs["other_img"], inputs["KRT"], inputs["other_KRT"]))
        img, rest = args[0], args[1:]
        out = step(img, *rest)
        _ = float(np.asarray(out[1]))
        iters, best = 20, float("inf")
        for _ in range(3):
            x = img
            t0 = time.perf_counter()
            for _ in range(iters):
                x, checksum = step(x, *rest)
            _ = float(np.asarray(checksum))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"batch={batch:3d}  {best*1e3:8.2f} ms/iter  "
              f"{batch/best:8.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
