"""Training BACKWARD decomposition at the flagship shape (VERDICT r4 #3).

The round-4 capture put the train step at 78.8 ms = fwd 21.7 + bwd 54.6 +
adam 2.5 (scripts/bench_train_step.py); the forward got a full stage
deep-dive, the backward never did.  This script decomposes the 54.6 ms:

  1. whole-model fwd / fwd+bwd / full step (re-measure, same methodology);
  2. plain single-view poseR-50 (trunk + deconv + decode, NO epipolar)
     fwd vs fwd+bwd -> trunk backward share (2 backbone passes in the
     fused multiview forward);
  3. epipolar attention module alone at flagship feature shape
     (64x64xC=256, K=64, batch 16) fwd vs value_and_grad under each remat
     mode: 'full' (the training default), 'dots' (checkpoint
     dots_saveable: save einsum outputs, recompute elementwise only),
     False (save everything);
  4. the full train step under each remat mode -> is a policy switch a
     landable win?

Methodology matches scripts/bench_train_step.py: fresh-state dependence
defeats CSE; sync forces a device->host fetch (block_until_ready is a
no-op through the axon tunnel).

Run on the real TPU:  python scripts/bench_bwd_stages.py
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
    return best * 1e3


def _first_leaf(tree):
    return np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[0]


def main():
    global jax
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_cfg
    from epipolar_transformers_tpu.config import update_from_dict
    from epipolar_transformers_tpu.engine import create_train_state, make_train_step

    results = {}

    # ---------------------------------------------------- 1. whole model
    cfg = _flagship_cfg()
    cfg = update_from_dict(cfg, {"EPIPOLAR": {"ATTENTION_IMPL": "matmul"}})
    inputs = jax.device_put(_example_batch(cfg, batch=BATCH))
    state = create_train_state(cfg, jax.random.PRNGKey(0), inputs)
    rng = jax.random.PRNGKey(1)

    def step_suite(cfg, state, tag):
        step = make_train_step(cfg)
        st = jax.tree_util.tree_map(jnp.array, state)

        def full_step():
            nonlocal st
            st, metrics = step(st, inputs, rng)
            return metrics["loss"]

        results[f"{tag}_full_step_ms"] = _bench(full_step, np.asarray)

        @jax.jit
        def fwd_loss(params, batch_stats):
            variables = {"params": params, "batch_stats": batch_stats}
            (loss_dict, _, _), _ = state.apply_fn(
                variables, inputs, is_train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return loss_dict["loss"]

        results[f"{tag}_fwd_ms"] = _bench(
            lambda: fwd_loss(state.params, state.batch_stats), np.asarray)
        grad_fn = jax.jit(jax.grad(fwd_loss))
        results[f"{tag}_fwd_bwd_ms"] = _bench(
            lambda: grad_fn(state.params, state.batch_stats), _first_leaf)
        results[f"{tag}_bwd_ms"] = (
            results[f"{tag}_fwd_bwd_ms"] - results[f"{tag}_fwd_ms"])

    step_suite(cfg, state, "flagship_rematfull")

    # ------------------------------------- 2. plain single-view poseR-50
    scfg = _flagship_cfg()
    scfg = update_from_dict(scfg, {
        "DATASETS": {"TASK": "keypoint"},
        "BACKBONE": {"BODY": "poseR-50"},
    })
    sinputs = {k: v for k, v in inputs.items()
               if not k.startswith("other_") and k != "camera"}
    sstate = create_train_state(scfg, jax.random.PRNGKey(0), sinputs)

    @jax.jit
    def sv_loss(params, batch_stats):
        variables = {"params": params, "batch_stats": batch_stats}
        (loss_dict, _, _), _ = sstate.apply_fn(
            variables, sinputs, is_train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        return loss_dict["loss"]

    results["singleview_fwd_ms"] = _bench(
        lambda: sv_loss(sstate.params, sstate.batch_stats), np.asarray)
    sv_grad = jax.jit(jax.grad(sv_loss))
    results["singleview_fwd_bwd_ms"] = _bench(
        lambda: sv_grad(sstate.params, sstate.batch_stats), _first_leaf)
    results["singleview_bwd_ms"] = (
        results["singleview_fwd_bwd_ms"] - results["singleview_fwd_ms"])

    # -------------------------- 3. attention alone, per remat mode
    from epipolar_transformers_tpu.ops.epipolar_attention import AttentionParams
    from epipolar_transformers_tpu.ops.epipolar_attention_matmul import (
        epipolar_attention_matmul_batch,
    )

    H = W = 64
    C = 256
    K = 64
    rng_np = np.random.RandomState(0)
    f1 = jnp.asarray(rng_np.randn(BATCH, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jnp.asarray(rng_np.randn(BATCH, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    locs = jnp.asarray((rng_np.rand(BATCH, K, H, W, 2) * 1.8 - 0.9).astype(np.float32))
    params = AttentionParams(attention="avg", similarity="dot",
                             softmax_scale=1.0 / np.sqrt(K))

    for mode, tag in ((True, "full"), ("dots", "dots"),
                      ("dots_bf16", "dots_bf16"), (False, "none")):
        def attn(f1_, f2_):
            out, _, _ = epipolar_attention_matmul_batch(
                f1_, f2_, f2_, locs, params, remat=mode)
            return jnp.sum(out.astype(jnp.float32))

        fwd = jax.jit(attn)
        results[f"attn_{tag}_fwd_ms"] = _bench(
            lambda: fwd(f1, f2), np.asarray)
        g = jax.jit(jax.grad(attn, argnums=(0, 1)))
        try:
            results[f"attn_{tag}_vjp_ms"] = _bench(
                lambda: g(f1, f2), _first_leaf)
        except Exception as e:  # OOM on save-everything is a result too
            results[f"attn_{tag}_vjp_ms"] = f"error: {type(e).__name__}"

    # ------------------------------ 4. full step under each remat mode
    for mode in ("dots", "dots_bf16", "none"):
        mcfg = update_from_dict(cfg, {"EPIPOLAR": {"ATTENTION_REMAT": mode}})
        try:
            mstate = create_train_state(mcfg, jax.random.PRNGKey(0), inputs)
            step_suite(mcfg, mstate, f"flagship_remat{mode}")
        except Exception as e:
            results[f"flagship_remat{mode}_full_step_ms"] = (
                f"error: {type(e).__name__}")

    results = {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in results.items()}
    results["batch"] = BATCH
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
