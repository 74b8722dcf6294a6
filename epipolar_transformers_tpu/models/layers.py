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
        return nn.BatchNorm(
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
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            name="norm",
        )(x)
