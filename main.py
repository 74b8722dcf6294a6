"""CLI entry point.

Mirrors the reference UX (reference main.py:21-75):
    python main.py --cfg configs/foo.yaml [KEY VALUE ...]
Dispatches train / test / visualization from cfg.DOTRAIN / cfg.DOTEST /
VIS flags.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="epipolar-transformers (TPU-native)")
    parser.add_argument("--cfg", dest="cfg", default=None, help="config yaml")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="cap total train steps (smoke runs)")
    parser.add_argument("--max-eval-batches", type=int, default=None,
                        help="cap eval batches (smoke runs)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for multi-host pods")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="KEY VALUE config override pairs")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from epipolar_transformers_tpu.config import load_config

    cfg = load_config(args.cfg, args.opts)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        stream=sys.stdout,
    )
    logger = logging.getLogger("main")

    if cfg.OUTPUT_DIR:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    import numpy as np

    np.random.seed(cfg.SEED)

    import jax

    if args.multihost:
        # multi-host pods: coordinator/process info from the TPU environment
        # (GSPMD then spans all hosts' devices; ICI intra-slice, DCN inter)
        jax.distributed.initialize()

    if cfg.DEBUG_NANS:
        # numerical sanitizer (reference kept torch detect_anomaly commented)
        jax.config.update("jax_debug_nans", True)

    logger.info("devices: %s", jax.devices())
    logger.info("task=%s backbone=%s", cfg.DATASETS.TASK, cfg.BACKBONE.BODY)

    if cfg.VIS.FLOPS:
        # reference tester.py:36-43: print params/FLOPs and stop
        from epipolar_transformers_tpu.utils.profiling import profile_model

        prof = profile_model(cfg)
        print("PROFILE:", prof)
        return prof

    from epipolar_transformers_tpu.engine import test as run_test
    from epipolar_transformers_tpu.engine import train as run_train

    state = None
    if cfg.DOTRAIN:
        eval_fn = None
        if cfg.DOTEST:
            def eval_fn(c, s):  # noqa: E306
                return run_test(c, s, max_batches=args.max_eval_batches)
        state = run_train(cfg, max_steps=args.max_steps, eval_fn=eval_fn)
    if cfg.DOTEST:
        if state is None:
            # eval-only: build state and restore weights
            from epipolar_transformers_tpu.data.pipeline import make_data_loader
            from epipolar_transformers_tpu.engine.trainer import (
                create_train_state,
                select_model_inputs,
            )
            from epipolar_transformers_tpu.utils.checkpoint import Checkpointer

            loader = make_data_loader(cfg, is_train=True)
            sample = select_model_inputs(cfg, next(iter(loader)))
            state = create_train_state(cfg, jax.random.PRNGKey(cfg.SEED), sample)
            restored, _ = Checkpointer(cfg.OUTPUT_DIR).load(state, cfg.WEIGHTS or None)
            if restored is not None:
                state = restored
            else:
                logger.warning("no checkpoint found; evaluating fresh init")
        results = run_test(cfg, state, max_batches=args.max_eval_batches)
        print("RESULTS:", {k: round(v, 4) for k, v in sorted(results.items())})
        return results
    return None


if __name__ == "__main__":
    main()
