"""2D->3D lifting networks (Flax).

Equivalent of reference modeling/lifting.py:8-205: heatmaps (or image
features) -> canonical 3D joints via the PosePrior conv+MLP stack, plus a
viewpoint head predicting an axis-angle rotation (Rodrigues) for the *_rot
tasks; optional handedness flip; multi-view fusion in the global frame.

NHWC layout: heatmap input is (N, H, W, J).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config

LRELU_SLOPE = 0.01  # torch nn.LeakyReLU default


def rodrigues(y: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3).

    reference lifting.py:154-177 (`_get_rot_mat`), including its 1e-8 norm
    regularizer.
    """
    theta = jnp.sqrt(jnp.sum(y ** 2, axis=1) + 1e-8)
    st = jnp.sin(theta)
    ct = jnp.cos(theta)
    one_ct = 1.0 - ct
    u = y / theta[:, None]
    ux, uy, uz = u[:, 0], u[:, 1], u[:, 2]
    rows = jnp.stack(
        [
            ct + ux * ux * one_ct, ux * uy * one_ct - uz * st, ux * uz * one_ct + uy * st,
            uy * ux * one_ct + uz * st, ct + uy * uy * one_ct, uy * uz * one_ct - ux * st,
            uz * ux * one_ct - uy * st, uz * uy * one_ct + ux * st, ct + uz * uz * one_ct,
        ],
        axis=1,
    )
    return rows.reshape(-1, 3, 3)


def flip_right_hand(coords: jnp.ndarray, side: jnp.ndarray) -> jnp.ndarray:
    """Mirror z for right hands (reference lifting.py:181-187)."""
    mirrored = coords * jnp.asarray([1.0, 1.0, -1.0])
    return jnp.where(side.reshape(-1, 1, 1).astype(bool), mirrored, coords)


def multiview_to_global(coords: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Rotate per-view normed predictions into the global frame:
    x @ (R^{-1})^T  (reference lifting.py:189-199)."""
    return coords @ jnp.transpose(jnp.linalg.inv(R), (0, 2, 1))


def _conv_stack(x: jnp.ndarray, widths, name_prefix: str, train: bool) -> jnp.ndarray:
    """(3x3 conv + LeakyReLU) x6 with stride-2 downsampling per pair
    (reference lifting.py:24-41)."""
    for i, w in enumerate(widths):
        x = nn.Conv(w, (3, 3), padding=1, name=f"{name_prefix}_conv{2*i}")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.Conv(w, (3, 3), padding=1, strides=2, name=f"{name_prefix}_conv{2*i+1}")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
    return x


class _MLPHead(nn.Module):
    widths: tuple
    out_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, name=f"fc{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, name="out")(x)


class LiftingNet(nn.Module):
    cfg: Config
    in_channels: int = 0

    def _use_image_features(self) -> bool:
        # img_lifting_rot ONLY.  The reference is self-contradictory for
        # multiview_img_lifting_rot: its __init__ builds the pool=2 heatmap
        # conv path for that task (lifting.py:20-21) while its forward()
        # skips the conv path (lifting.py:99) and then reads the undefined
        # `y` — bit-rot that crashes at runtime.  The __init__ reading is
        # the only self-consistent one, so here the multiview task lifts
        # the epipolar-FUSED heatmaps through the heatmap path (pool=2).
        return self.cfg.DATASETS.TASK == "img_lifting_rot"

    def _direct(self) -> bool:
        return self.cfg.DATASETS.TASK in ("lifting", "lifting_direct", "keypoint_lifting_direct")

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        hand_side: Optional[jnp.ndarray] = None,
        R_global: Optional[jnp.ndarray] = None,
        train: bool = True,
        multiview: bool = False,
    ):
        """
        Args:
            x: (N, H, W, J) heatmaps, or (N, C) image features for img_* tasks.
            hand_side: (N,) or (N, 2) handedness (RHD); None for h36m.
            R_global: (V, 3, 3) per-view global rotations (multiview eval).
        Returns:
            (coords_xyz_canonical, trafo_matrix, coord_xyz_rel_normed,
             coord_xyz_global) — trailing entries None per task, matching
            reference lifting.py:120-150.
        """
        c = self.cfg
        task = c.DATASETS.TASK
        num_pts = c.KEYPOINT.NUM_PTS
        N = x.shape[0]

        side_feat = None
        if hand_side is not None:
            side = hand_side.reshape(N, -1)[:, :1].astype(x.dtype)
            side_feat = jnp.concatenate([1.0 - side, side], axis=1)

        if not self._use_image_features():
            # torch AvgPool2d(k, stride=k, ceil_mode=True) on (N, H, W, J)
            pool = 2 if task in ("keypoint_lifting_rot", "multiview_img_lifting_rot") else 8
            x = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
            feat = _conv_stack(x, (32, 64, 128), "conv1", train)
            flat = feat.reshape(N, -1)
            if not self._direct():
                feat2 = _conv_stack(x, (64, 128, 256), "conv2", train)
                flat2 = feat2.reshape(N, -1)
        else:
            flat = x

        if side_feat is not None:
            flat = jnp.concatenate([flat, side_feat], axis=1)

        if self._use_image_features():
            coords = nn.Dense(num_pts * 3, name="poseprior")(flat).reshape(N, -1, 3)
        else:
            coords = _MLPHead((512, 512), num_pts * 3, 0.2, name="poseprior")(
                flat, train
            ).reshape(N, -1, 3)

        if self._direct():
            return coords, None, None, None

        if self._use_image_features():
            y = nn.Dense(3, name="viewpoint")(flat)
        else:
            if side_feat is not None:
                flat2 = jnp.concatenate([flat2, side_feat], axis=1)
            y = _MLPHead((256, 128), 3, 0.25, name="viewpoint")(flat2, train)

        trafo = rodrigues(y)
        if c.LIFTING.FLIP_ON and hand_side is not None:
            can_flip = flip_right_hand(coords, hand_side.reshape(N, -1)[:, 0])
        else:
            can_flip = coords
        normed = can_flip @ trafo

        if "lifting_rot" in task:
            if multiview and R_global is not None:
                global_pred = multiview_to_global(normed, R_global)
                return coords, trafo, normed, global_pred
            return coords, trafo, normed, None
        raise NotImplementedError(task)
