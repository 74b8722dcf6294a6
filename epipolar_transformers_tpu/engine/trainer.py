"""Training engine: jit-compiled data-parallel train step + epoch loop.

Equivalent of reference engine/trainer.py:18-141, redesigned TPU-first:
  * one `jax.jit` train step (forward + backward + optimizer) — the
    reference's zero_grad/backward/step and DataParallel scatter/gather
    collapse into a single XLA program;
  * data parallelism via GSPMD: batches sharded on the mesh's `data` axis,
    params replicated; XLA inserts the gradient all-reduce over ICI;
  * BN stats are global-batch by construction (see parallel/mesh.py);
  * per-epoch MultiStepLR via the optax schedule (solver.py), periodic
    checkpointing with `last_checkpoint` resume, windowed meters.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..config import Config
from ..data.pipeline import make_data_loader
from ..models import ModelBuilder
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.checkpoint import Checkpointer
from ..utils.pretrained import apply_pretrained
from ..utils.metric_logger import MetricLogger, TensorboardWriter
from .solver import make_optimizer

logger = logging.getLogger(__name__)


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def select_model_inputs(cfg: Config, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Keep only the keys the model consumes (jit-static key set)."""
    keys = [
        "img", "heatmap", "visibility", "KRT", "other_img", "other_KRT",
        "camera", "other_camera", "hand-side", "can-points-3d",
        "normed-points-3d", "rotation", "scale", "unit", "R",
    ]
    return {k: batch[k] for k in keys if k in batch}


def select_render_inputs(cfg: Config, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Model inputs + the joint-coord keys a device-render batch carries
    instead of pixel data (DATALOADER.DEVICE_RENDER)."""
    from ..ops.synthetic_render import RENDER_PARAM_KEYS

    out = select_model_inputs(cfg, batch)
    out.update({k: batch[k] for k in RENDER_PARAM_KEYS if k in batch})
    return out


def materialize_model_inputs(cfg: Config, batch: Dict[str, np.ndarray]):
    """Return the model-input dict, splatting img/heatmap on-device first
    when `batch` is a device-render param batch (no pixel data)."""
    if "img" in batch:
        return select_model_inputs(cfg, batch)
    from ..ops.synthetic_render import make_batch_renderer

    return make_batch_renderer(cfg)(select_render_inputs(cfg, batch))


def create_train_state(cfg: Config, rng, sample_inputs: Dict, steps_per_epoch: int = 1) -> TrainState:
    model = ModelBuilder(cfg)
    # jit the init: one compiled program instead of per-op eager dispatch
    # (critical over a device tunnel, where each op is a host round-trip)
    variables = jax.jit(
        lambda r: model.init(r, sample_inputs, is_train=True)
    )(rng)
    # construction-time pretrained init: single-view backbone from the
    # BackboneCatalog + foreign-format cfg.WEIGHTS (reference
    # modeling/model.py:37-54, utils/checkpoint.py:49-57); native .ckpt
    # resume stays with the Checkpointer and takes precedence later.
    variables = apply_pretrained(cfg, variables)
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def make_train_step(cfg: Config):
    """Build the jitted train step: (state, inputs, rng) -> (state, metrics)."""

    def train_step(state: TrainState, inputs: Dict, dropout_rng):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (loss_dict, metric_dict, _), mutated = state.apply_fn(
                variables,
                inputs,
                is_train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            return loss_dict["loss"], (loss_dict, metric_dict, mutated)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (loss_dict, metric_dict, mutated)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=mutated.get("batch_stats", state.batch_stats))
        return state, {**loss_dict, **metric_dict}

    return jax.jit(train_step, donate_argnums=(0,))


def train(cfg: Config, max_steps: Optional[int] = None, mesh=None, eval_fn=None):
    """Full training loop. Returns the final TrainState.

    Args:
        max_steps: optional cap on total steps (tests / smoke runs).
        eval_fn: optional callable (cfg, state) -> dict, invoked every
            EVAL_FREQ epochs (reference trainer.py:139-141).
    """
    mesh = mesh or make_mesh()
    # multi-host: each process loads its shard of the data (SURVEY §2.7 —
    # per-host input sharding over DCN; single-process => identity)
    loader = make_data_loader(
        cfg, is_train=True,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )
    steps_per_epoch = max(len(loader), 1)

    if cfg.DATALOADER.BENCHMARK:
        # loader-only benchmark: skip the model entirely and report data
        # timing + per-stage __getitem__ breakdown (reference trainer.py:
        # 22,71,83-95 + joints_dataset.py:187,280-281)
        from ..utils.profiling import DATALOADER_STAGES

        DATALOADER_STAGES.reset()
        t0 = time.time()
        n = 0
        for batch in loader:
            n += 1
            if max_steps is not None and n >= max_steps:
                break
        total = time.time() - t0
        logger.info(
            "DATALOADER.BENCHMARK: %d batches in %.2fs (%.1f ms/batch)  stages: %s",
            n, total, total / max(n, 1) * 1e3, DATALOADER_STAGES.report(),
        )
        return None

    rng = jax.random.PRNGKey(cfg.SEED)
    init_rng, dropout_rng = jax.random.split(rng)

    first_batch = next(iter(loader))
    with mesh:
        sample_inputs = materialize_model_inputs(cfg, first_batch)
        state = create_train_state(cfg, init_rng, sample_inputs, steps_per_epoch)

    checkpointer = Checkpointer(cfg.OUTPUT_DIR)
    start_epoch = 0
    # foreign-format WEIGHTS (.pth/.pickle) were already imported by
    # apply_pretrained inside create_train_state; only a native .ckpt goes
    # through the Checkpointer (whose last_checkpoint resume still wins).
    # WEIGHTS_LOAD_OPT=False restores model weights only (reference
    # trainer.py:34, checkpoint.py:62-68).
    native_weights = cfg.WEIGHTS if cfg.WEIGHTS.endswith(".ckpt") else None
    restored, extra = checkpointer.load(
        state, native_weights, load_opt=cfg.WEIGHTS_LOAD_OPT
    )
    if restored is not None:
        state = restored
        start_epoch = int(extra.get("epoch", 0))
        logger.info("Resumed from epoch %d", start_epoch)
    elif native_weights:
        logger.warning(
            "cfg.WEIGHTS=%r was not loaded (missing file and no "
            "last_checkpoint) — training from scratch", cfg.WEIGHTS,
        )

    train_step = make_train_step(cfg)
    meters = MetricLogger()
    # TENSORBOARD.COMMENT names the event folder (reference main.py:41-44
    # FOLDER_NAME = OUTPUT_DIR/<comment>-<timestamp>)
    tb_dir = cfg.OUTPUT_DIR
    if cfg.TENSORBOARD.COMMENT and cfg.OUTPUT_DIR:
        tb_dir = os.path.join(
            cfg.OUTPUT_DIR,
            f"{cfg.TENSORBOARD.COMMENT}-{time.strftime('%Y-%m-%d-%H-%M')}",
        )
    tb = TensorboardWriter(tb_dir, enabled=cfg.TENSORBOARD.USE)
    step = 0
    t_data, t_step = 0.0, 0.0

    render_fn = None

    def to_device(batch):
        """Sharded device_put of the model inputs; device-render param
        batches (DATALOADER.DEVICE_RENDER) upload only joint coords +
        cameras and splat img/heatmap on-device — batch-parallel ops, so
        GSPMD keeps the rendered outputs sharded like their inputs."""
        nonlocal render_fn
        if "img" in batch:
            return shard_batch(select_model_inputs(cfg, batch), mesh, cfg.MESH_AXIS)
        if render_fn is None:
            from ..ops.synthetic_render import make_batch_renderer

            render_fn = make_batch_renderer(cfg)
        return render_fn(
            shard_batch(select_render_inputs(cfg, batch), mesh, cfg.MESH_AXIS))

    def device_batches(it, lookahead: int = 2):
        """Host->device prefetch: issue the (async) sharded device_put of
        the next batch while the current step computes, so the transfer
        overlaps compute instead of serializing in front of every step
        (jax.device_put returns immediately; the transfer completes in the
        background).  Classic flax prefetch_to_device pattern."""
        from collections import deque

        pending = deque()
        with mesh:
            for batch in it:
                pending.append(to_device(batch))
                if len(pending) >= lookahead:
                    yield pending.popleft()
            while pending:
                yield pending.popleft()

    for epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCHS):
        t0 = time.time()
        for inputs in device_batches(loader):
            t_data += time.time() - t0
            with mesh:
                dropout_rng, step_rng = jax.random.split(dropout_rng)
                state, metrics = train_step(state, inputs, step_rng)
            step += 1
            t_step += time.time() - t0
            if step % cfg.LOG_FREQ == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                meters.update(**metrics)
                tb.write(metrics, step, tag="train")
                logger.info(
                    "epoch %d step %d  %s  data_t %.3f step_t %.3f",
                    epoch, step, meters, t_data / step, t_step / step,
                )
            if max_steps is not None and step >= max_steps:
                return state
            t0 = time.time()
        if (epoch + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
            checkpointer.save(f"model_{epoch:03d}", state, epoch=epoch + 1)
        # EVAL_FREQ <= 0 disables periodic eval (the final test still runs
        # from main's DOTEST dispatch); the reference would crash on 0 too
        if (eval_fn is not None and cfg.EVAL_FREQ > 0
                and (epoch + 1) % cfg.EVAL_FREQ == 0):
            eval_fn(cfg, state)
    if cfg.SOLVER.MAX_EPOCHS > start_epoch:
        checkpointer.save("model_final", state, epoch=cfg.SOLVER.MAX_EPOCHS)
    return state
