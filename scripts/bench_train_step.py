"""Training-step breakdown at the flagship recipe shape (VERDICT r2 #8).

Measures, on the real chip with a device-resident batch:
  * full train step (fwd + bwd + adam + BN update)
  * forward + loss only (jitted value)
  * forward + backward only (value_and_grad, no optimizer)
and derives the bwd and optimizer shares.  The whole bench runs with
EPIPOLAR.ATTENTION_IMPL pinned to 'matmul': a pinned-but-unsupported impl
raises at trace time (models/epipolar.py), so these numbers PROVE the
fwd+bwd rode the gather-free matmul path — a silent fallback is
impossible by construction.

Run on the real TPU:  python scripts/bench_train_step.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
ITERS = 8


def _bench(fn, sync, iters=ITERS, blocks=3):
    sync(fn())  # compile + sync
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        sync(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_cfg
    from epipolar_transformers_tpu.config import update_from_dict
    from epipolar_transformers_tpu.engine import create_train_state, make_train_step

    cfg = _flagship_cfg()
    # pin the attention path: unsupported pins RAISE, so the measurement
    # provably rides the matmul formulation (no silent fallback)
    cfg = update_from_dict(cfg, {"EPIPOLAR": {"ATTENTION_IMPL": "matmul"}})
    inputs = _example_batch(cfg, batch=BATCH)  # already select_model_inputs'd
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    inputs = jax.device_put(inputs)
    rng = jax.random.PRNGKey(1)

    step = make_train_step(cfg)

    # NOTE: each fn must depend on fresh state to defeat CSE, and sync must
    # force a real device->host fetch (block_until_ready is a no-op through
    # the axon tunnel — see bench.py)
    results = {}

    # the train step donates its input state; bench on a buffer COPY so the
    # pristine `state` stays alive for the fwd/bwd measurements below
    st = jax.tree_util.tree_map(jnp.array, state)
    def full_step():
        nonlocal st
        st, metrics = step(st, inputs, rng)
        return metrics["loss"]
    results["full_step_ms"] = _bench(
        full_step, lambda r: np.asarray(r)) * 1e3

    @jax.jit
    def fwd_loss(params, batch_stats):
        variables = {"params": params, "batch_stats": batch_stats}
        (loss_dict, _, _), _ = state.apply_fn(
            variables, inputs, is_train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        return loss_dict["loss"]

    results["fwd_ms"] = _bench(
        lambda: fwd_loss(state.params, state.batch_stats),
        lambda r: np.asarray(r)) * 1e3

    grad_fn = jax.jit(jax.grad(fwd_loss))
    results["fwd_bwd_ms"] = _bench(
        lambda: grad_fn(state.params, state.batch_stats),
        lambda r: np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]) * 1e3

    results["bwd_ms"] = round(results["fwd_bwd_ms"] - results["fwd_ms"], 2)
    results["opt_update_ms"] = round(
        results["full_step_ms"] - results["fwd_bwd_ms"], 2)
    results = {k: round(v, 2) for k, v in results.items()}
    results["batch"] = BATCH
    results["frames_per_s"] = round(BATCH / (results["full_step_ms"] / 1e3), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
