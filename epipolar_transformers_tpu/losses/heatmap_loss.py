"""2D heatmap losses (pure JAX).

Equivalents of reference modeling/metrics/metrics2d.py:18-90.  All take
heatmaps in (N, H, W, J) NHWC layout and visibility (N, J) (trailing
singleton dims are squeezed).
"""

from __future__ import annotations

import jax.numpy as jnp


def _vis2d(visibility: jnp.ndarray, n: int, j: int) -> jnp.ndarray:
    """Normalize visibility to (N, J) float."""
    v = jnp.asarray(visibility)
    if v.ndim == 3:
        # reference passes (N, J, 1) or (N, J, 3); any nonzero column marks visible
        v = v[..., 0]
    return v.reshape(n, j).astype(jnp.float32)


def joints_mse_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    visibility: jnp.ndarray,
    per_joint_sum: bool = True,
) -> jnp.ndarray:
    """JointsMSELoss (metrics2d.py:18-41): per-joint MSE of weight-multiplied
    heatmaps, summed (or averaged, LOSS_PER_JOINT=False) over joints.

    Note the reference multiplies BOTH maps by the weight before the MSE, so
    the weight enters squared — preserved here.
    """
    N, H, W, J = pred.shape
    v = _vis2d(visibility, N, J)  # (N, J)
    diff = (pred - target) * v[:, None, None, :]
    per_joint = jnp.mean(diff ** 2, axis=(0, 1, 2))  # (J,) mean over N*H*W
    loss = jnp.sum(per_joint)
    if not per_joint_sum:
        loss = loss / J
    return loss


def keypoints_mse_smooth_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    visibility: jnp.ndarray,
    threshold: float = 400.0,
) -> jnp.ndarray:
    """KeypointsMSESmoothLoss (metrics2d.py:43-58)."""
    N, H, W, J = pred.shape
    v = _vis2d(visibility, N, J)
    diff = (target - pred) ** 2 * v[:, None, None, :]
    diff = jnp.where(diff > threshold, diff ** 0.1 * threshold ** 0.9, diff)
    dimension = H * W
    return jnp.sum(diff) / (dimension * jnp.maximum(1.0, jnp.sum(v)))


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray, mask=None) -> jnp.ndarray:
    """MaskedMSELoss with 'mean' reduction (metrics2d.py:61-81)."""
    if mask is not None:
        m = jnp.asarray(mask).astype(bool)
        se = jnp.where(m, (pred - target) ** 2, 0.0)
        return jnp.sum(se) / jnp.maximum(jnp.sum(m), 1)
    return jnp.mean((pred - target) ** 2)


def compute_stage_loss(pred_stages, target, mask=None):
    """Per-hourglass-stage masked MSE (metrics2d.py:83-90)."""
    stage_losses = [masked_mse_loss(p, target, mask) for p in pred_stages]
    return sum(stage_losses), stage_losses
