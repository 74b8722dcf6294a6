"""Shared small layers (Flax).

ZeroInitBatchNorm == the reference's `zeroinitBN` (modeling/layers/BN.py:
12-101): BatchNorm whose affine scale AND bias initialize to zero, so the
epipolar fusion branch starts as an exact identity (the residual add then
passes the backbone features through unchanged at step 0 — load-bearing for
not regressing below the single-view init, SURVEY §7 hard parts).

Cross-replica statistics: where the reference vendors a ~780-LoC thread-based
SyncBN (modeling/sync_batchnorm/), here synchronized batch statistics are just
`axis_name=...` on flax BatchNorm — XLA psums the moments over the mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def _mapped_axis_names() -> tuple:
    """Named mapped axes (shard_map/pmap) bound at the current trace, if any.

    Best-effort: uses jax.core's axis-env introspection (private surface —
    degrade to 'no axes' if it moves) to let BN detect that it is being traced
    inside an explicitly mapped context where an unsynced batch reduction
    would be per-shard."""
    try:
        from jax import core

        if core.nonempty_axis_env_DO_NOT_USE():
            return tuple(core.unsafe_get_axis_names_DO_NOT_USE())
    except Exception:
        pass
    return ()


class GuardedBatchNorm(nn.BatchNorm):
    """`nn.BatchNorm` that refuses to compute UNSYNCED batch statistics under
    a named mapped axis.

    The framework's BN sync contract (tests/test_syncbn_equivalence.py) is
    GSPMD-implicit: under `jit` with the batch sharded over the mesh, moment
    reductions are global automatically and `axis_name=None` is correct.  But
    inside an explicit `shard_map`/`pmap` body each shard traces its OWN batch
    reduction — `axis_name=None` there silently reproduces the per-replica-BN
    bug the reference's vendored SyncBN exists to prevent (reference
    modeling/sync_batchnorm/batchnorm.py:53-148).  This subclass turns that
    silent wrong answer into a trace-time error; set
    `BACKBONE.BN_AXIS_NAME` to the mapped axis name to opt into explicit
    `lax.pmean` syncing instead.  Param/stat tree is identical to
    `nn.BatchNorm`."""

    def __call__(self, x, use_running_average: Optional[bool] = None, **kwargs):
        ura = (
            use_running_average
            if use_running_average is not None
            else self.use_running_average
        )
        if not ura and self.axis_name is None:
            axes = _mapped_axis_names()
            if axes:
                raise ValueError(
                    "BatchNorm is training (computing batch statistics) inside "
                    f"an explicitly mapped context (named axes {axes}) with "
                    "axis_name=None: each shard would normalize with per-shard "
                    "moments, silently diverging from the global-batch BN the "
                    "jit+GSPMD trainer provides. Set BACKBONE.BN_AXIS_NAME to "
                    "the mapped batch axis (e.g. 'data') to sync moments with "
                    "lax.pmean, or run the step under plain jit with a sharded "
                    "batch (engine/trainer.py)."
                )
        return super().__call__(x, use_running_average=use_running_average, **kwargs)


def compute_dtype(cfg):
    """Backbone compute dtype: bfloat16 rides the v5e MXU natively; params
    and BN statistics stay float32 (flax param_dtype default)."""
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.DTYPE == "bfloat16" else jnp.float32


class ZeroInitBatchNorm(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = False) -> jnp.ndarray:
        return GuardedBatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            scale_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            axis_name=self.axis_name,
            name="norm",
        )(x)


class BatchNorm(nn.Module):
    """Standard BN with torch-compatible defaults (momentum 0.1 torch == 0.9
    flax, eps 1e-5) and optional cross-replica sync via axis_name."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = False) -> jnp.ndarray:
        return GuardedBatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            name="norm",
        )(x)
