"""Probe: flagship fused-inference throughput vs batch size on the chip.

Reuses bench.py's chained-dependency machinery verbatim (make_chained_step
+ _chained_bench) — one definition of the methodology, so the sweep can
never silently diverge from what bench.py measures.  Results in PERF.md
("batch-size sweep").
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench import _chained_bench, make_chained_step  # noqa: E402


def main():
    import jax

    from __graft_entry__ import _example_batch, _flagship_cfg
    from epipolar_transformers_tpu.models import ModelBuilder

    cfg = _flagship_cfg()
    model = ModelBuilder(cfg)

    for batch in (4, 8, 16, 32):
        inputs = _example_batch(cfg, batch=batch)
        variables = jax.jit(
            lambda rng: model.init(rng, inputs, is_train=False)
        )(jax.random.PRNGKey(0))
        step = make_chained_step(model, variables)
        args = jax.device_put(
            (inputs["img"], inputs["other_img"], inputs["KRT"], inputs["other_KRT"]))
        best = _chained_bench(step, args, iters=20, blocks=3)
        print(f"batch={batch:3d}  {best*1e3:8.2f} ms/iter  "
              f"{batch/best:8.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
