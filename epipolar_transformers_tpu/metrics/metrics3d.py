"""3D end-point-error metrics (pure JAX).

Equivalents of reference modeling/metrics/metrics3d.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def epe_mean(
    out: jnp.ndarray,
    target: jnp.ndarray,
    keypoint_vis=None,
    keypoint_scale=1.0,
    unit=1.0,
    max_dist: float = 150.0,
):
    """Mean per-endpoint error in mm, clamped at `max_dist`.

    reference metrics3d.py:5-46.  Faithful quirk: the returned mean is over
    ALL joints (clamped), while visibility only zeroes the returned per-joint
    array — exactly what the reference computes.

    Args:
        out/target: (..., J, 3).
    Returns:
        (scalar mean, per-joint err of the first batch element with invisible
        joints zeroed)
    """
    if unit is None:
        unit = 1.0
    if keypoint_scale is None:
        keypoint_scale = 1.0
    err = jnp.sqrt(jnp.sum((out - target) ** 2, axis=-1))
    scale = jnp.asarray(keypoint_scale)
    if scale.ndim >= 1:
        scale = scale[..., None]  # broadcast per-sample scale over joints
    unit_arr = jnp.asarray(unit)
    if unit_arr.ndim >= 1:
        unit_arr = unit_arr[..., None]
    err = err * scale * unit_arr
    err = jnp.minimum(err, max_dist)
    perjoint = err
    if keypoint_vis is not None:
        vis = jnp.asarray(keypoint_vis)
        while vis.ndim > err.ndim:
            vis = vis[..., 0]
        perjoint = jnp.where(vis.astype(bool), err, 0.0)
    first = perjoint[0] if perjoint.ndim > 1 else perjoint
    return jnp.mean(err), first


def epe_mean_multiview_gt(out, target, keypoint_vis=None, keypoint_scale=1.0, unit=1.0):
    """Upper-bound metric: nearest view's 3D prediction to GT
    (reference metrics3d.py:63-70)."""
    err = jnp.min(jnp.sqrt(jnp.sum((out - target) ** 2, axis=-1)), axis=1)
    err = err * keypoint_scale * unit
    if keypoint_vis is not None:
        vis = jnp.asarray(keypoint_vis).astype(bool)
        while vis.ndim > err.ndim:
            vis = vis[..., 0]
        return jnp.sum(jnp.where(vis, err, 0.0)) / jnp.maximum(jnp.sum(vis), 1)
    return jnp.mean(err)
