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
    variables = model.init(jax.random.PRNGKey(0), inputs, is_train=False)

    def fwd(feed):
        _, _, out = model.apply(variables, feed, is_train=False)
        return out["heatmap_pred"]

    ca = cost_analysis(fwd, inputs)
    return {
        "params": count_params(variables["params"]),
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }
