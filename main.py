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
    parser.add_argument("--trace", metavar="DIR", default=None,
                        help="capture a jax.profiler trace of the run into "
                             "DIR (open with Perfetto / TensorBoard)")
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

    import contextlib

    if args.trace:
        # device-level tracing (SURVEY §5: jax.profiler + Perfetto is the
        # TPU analog of the reference's wall-clock tic/toc timers); wraps
        # the whole train/eval dispatch below
        trace_cm = jax.profiler.trace(args.trace)
        logger.info("profiler trace -> %s", args.trace)
    else:
        trace_cm = contextlib.nullcontext()

    with trace_cm:
        return _dispatch(cfg, args, run_train, run_test, logger)


def _dispatch(cfg, args, run_train, run_test, logger):
    import jax

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
                materialize_model_inputs,
            )
            from epipolar_transformers_tpu.utils.checkpoint import Checkpointer

            loader = make_data_loader(cfg, is_train=True)
            sample = materialize_model_inputs(cfg, next(iter(loader)))
            # create_train_state already imports foreign-format WEIGHTS
            # (.pth/.pickle) and catalog pretrained backbones
            state = create_train_state(cfg, jax.random.PRNGKey(cfg.SEED), sample)
            native = cfg.WEIGHTS if cfg.WEIGHTS.endswith(".ckpt") else None
            restored, _ = Checkpointer(cfg.OUTPUT_DIR).load(
                state, native, load_opt=cfg.WEIGHTS_LOAD_OPT)
            if restored is not None:
                state = restored
            elif not cfg.WEIGHTS:
                logger.warning("no checkpoint found; evaluating fresh init")
            elif native:
                # a set-but-unloadable WEIGHTS means garbage metrics; say so
                # loudly (foreign .pth/.pickle warn inside load_cfg_weights)
                logger.warning(
                    "cfg.WEIGHTS=%r was not loaded (missing file and no "
                    "last_checkpoint) — evaluating fresh init", cfg.WEIGHTS)
        results = run_test(cfg, state, max_batches=args.max_eval_batches)
        print("RESULTS:", {k: round(v, 4) for k, v in sorted(results.items())})
        _maybe_visualize(cfg)
        return results
    _maybe_visualize(cfg)
    return None


def _maybe_visualize(cfg):
    """reference main.py:69-71: `if cfg.VIS.DOVIS: visualization(cfg)`.
    Only dispatches when a concrete VIS mode is requested (DOVIS defaults
    True, so an unconditional call would no-op every run)."""
    if cfg.VIS.DOVIS and (cfg.VIS.POINTCLOUD or cfg.VIS.AUC or cfg.VIS.VIDEO
                          or cfg.VIS.EPIPOLAR_LINE or cfg.VIS.CURSOR):
        from epipolar_transformers_tpu.vis.visualization import visualization

        produced = visualization(cfg)
        print("VIS:", produced)
        return produced
    return None


if __name__ == "__main__":
    main()
