"""FLOPs / parameter accounting (VIS.FLOPS mode).

Replaces the reference's thop profiling (engine/tester.py:36-43,
scripts/compute_complexiy.py) with XLA's own cost model:
`jit(fn).lower(...).compile().cost_analysis()` reports the compiled
program's flops — the number the hardware actually runs, post-fusion.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


class StageTimes:
    """Per-stage wall-time accumulator for the DATALOADER.BENCHMARK loader
    profiling mode (reference joints_dataset.py:187,280-281 prints per-stage
    timers; here they accumulate and report averages)."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def add(self, stage: str, seconds: float):
        self.times[stage] = self.times.get(stage, 0.0) + seconds
        self.counts[stage] = self.counts.get(stage, 0) + 1

    def averages(self) -> Dict[str, float]:
        return {k: self.times[k] / max(self.counts[k], 1) for k in self.times}

    def reset(self):
        self.times.clear()
        self.counts.clear()

    def report(self) -> str:
        return "  ".join(f"{k}={v * 1e3:.2f}ms" for k, v in
                         sorted(self.averages().items()))


# module-level sink the datasets write into under DATALOADER.BENCHMARK
DATALOADER_STAGES = StageTimes()


def cost_analysis(fn, *args) -> Dict[str, Any]:
    """Compile `fn` and return {'flops': ..., 'bytes accessed': ...}."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # some backends return one dict per computation
        ca = ca[0] if ca else {}
    return dict(ca or {})


def profile_model(cfg, batch_size: int = 1) -> Dict[str, float]:
    """Params + forward FLOPs of the configured model (reference
    tester.py:36-43 prints thop totals and exits)."""
    import jax.numpy as jnp

    from ..data.datasets.synthetic import SyntheticMultiview
    from ..data.pipeline import collate
    from ..engine.trainer import select_model_inputs
    from ..models import ModelBuilder

    ds = SyntheticMultiview(cfg, is_train=True, n_samples=batch_size)
    inputs = select_model_inputs(cfg, collate([ds[i] for i in range(batch_size)]))
    model = ModelBuilder(cfg)
    variables = jax.jit(
        lambda rng: model.init(rng, inputs, is_train=False)
    )(jax.random.PRNGKey(0))

    def fwd(feed):
        _, _, out = model.apply(variables, feed, is_train=False)
        return out["heatmap_pred"]

    ca = cost_analysis(fwd, inputs)
    return {
        "params": count_params(variables["params"]),
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }
