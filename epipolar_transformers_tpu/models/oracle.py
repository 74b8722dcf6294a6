"""Depth oracle: GT-depth feature warping between views (sanity-check layer).

Equivalent of reference modeling/layers/oracle.py:6-121: unproject each
pixel with its ground-truth depth, transform to the other camera, project,
and bilinearly sample the other view's features — an upper bound for any
learned correspondence.  NHWC, fully vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_oracle_warp(feat, depth1, depth2, K1, R1, t1, K2, R2, t2, bbox1, bbox2,
                      full_w=667, full_h=1024):
    """
    Args (all batched, NHWC):
        feat: (N, 2, H, W, C) two-view features.
        depth1/depth2: (N, H, W) GT depths.
        K/R/t per view: (N, 3, 3)/(N, 3, 3)/(N, 3).
        bbox1/bbox2: (N, 4) crops in full-image coords.
    Returns:
        (N, 2, H, W, 2C): each view's features concatenated with the other
        view's features warped into it.
    """
    from ..ops.grid_sample import grid_sample_2d

    def warp(feat_other, depth, K1_, R1_, t1_, K2_, R2_, t2_, bbox):
        H, W = depth.shape
        sx = (bbox[2] - bbox[0]) / W * full_w
        sy = (bbox[3] - bbox[1]) / H * full_h
        xs, ys = jnp.meshgrid(jnp.arange(W, dtype=depth.dtype),
                              jnp.arange(H, dtype=depth.dtype), indexing="ij")
        x = xs * sx + bbox[0]
        y = ys * sy + bbox[1]
        homo = jnp.stack([x, y, jnp.ones_like(x)]).reshape(3, -1)
        local3d = homo * depth.reshape(1, -1)
        cal = jnp.linalg.inv(K1_) @ local3d - t1_.reshape(3, 1)
        world = jnp.linalg.inv(R1_) @ cal
        homo_world = jnp.concatenate([world, jnp.ones((1, world.shape[1]), world.dtype)])
        Rt2 = jnp.concatenate([R2_, t2_.reshape(3, 1)], axis=1)
        rel = K2_ @ (Rt2 @ homo_world)
        uv = (rel[:2] / rel[2:3]).T.reshape(W, H, 2)
        grid = uv / W * 2.0 - 1.0  # (reference normalizes by image width, :86-90)
        return grid_sample_2d(feat_other, grid)

    def per_item(f, d1, d2, K1_, R1_, t1_, K2_, R2_, t2_, b1, b2):
        w2_into_1 = warp(f[1], d1, K1_, R1_, t1_, K2_, R2_, t2_, b1)
        w1_into_2 = warp(f[0], d2, K2_, R2_, t2_, K1_, R1_, t1_, b2)
        v1 = jnp.concatenate([f[0], w2_into_1], axis=-1)
        v2 = jnp.concatenate([f[1], w1_into_2], axis=-1)
        return jnp.stack([v1, v2])

    return jax.vmap(per_item)(feat, depth1, depth2, K1, R1, t1, K2, R2, t2, bbox1, bbox2)
