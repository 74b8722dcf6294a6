"""Bilinear resize with align_corners=True semantics (torch interpolate
parity, needed by the Hourglass upsample — reference ProHG.py:118).

Implemented as two separable interpolation matmuls (H_out x H_in) and
(W_out x W_in) built at trace time — dense matmuls ride the MXU instead of
irregular gathers.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _interp_matrix(n_out: int, n_in: int, dtype=np.float32) -> np.ndarray:
    """Rows: output positions; two nonzero bilinear weights per row.

    align_corners=True: src = i * (n_in - 1) / (n_out - 1).
    """
    M = np.zeros((n_out, n_in), dtype=dtype)
    if n_out == 1:
        M[0, 0] = 1.0
        return M
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(dtype)
    M[np.arange(n_out), lo] += 1.0 - w
    M[np.arange(n_out), hi] += w
    return M


def resize_bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., H_out, W_out, C)."""
    H_out, W_out = size
    H_in, W_in = x.shape[-3], x.shape[-2]
    if (H_in, W_in) == (H_out, W_out):
        return x
    Ry = jnp.asarray(_interp_matrix(H_out, H_in), dtype=x.dtype)
    Rx = jnp.asarray(_interp_matrix(W_out, W_in), dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", Ry, x)
    x = jnp.einsum("ow,...hwc->...hoc", Rx, x)
    return x
