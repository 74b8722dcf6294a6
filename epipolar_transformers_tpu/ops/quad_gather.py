"""Single-gather bilinear sampling via a quad (4-corner) row layout.

XLA's TPU row-gather throughput is issue-rate-bound, not bandwidth-bound, so
bilinear sampling's 4 gathers per sample cost ~4x one gather.  This module
packs all 4 interpolation corners of every pixel into ONE row:

    quad[y*W + x] = concat(f[y,x], f[y,x+1], f[y+1,x], f[y+1,x+1])  (4C wide)

built with two shifted copies (zero-padded at the high edges), so a bilinear
sample becomes a single row gather + a weighted sum of the row's 4 slots.

Exactness vs grid_sample_2d (torch zero-padding semantics): high-edge
corners read the zero padding (weight x 0 anyway); low-edge samples
(floor(x) == -1) shift the valid corner into slot 0 and move its weight
along — `_slot_weights` computes the per-slot weights with validity masks,
so results match ops/grid_sample.py bit-for-bit in f32.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_quad(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H*W, 4*C) quad-corner rows."""
    H, W, C = image.shape
    padded = jnp.pad(image, ((0, 1), (0, 1), (0, 0)))
    f00 = padded[:H, :W]
    f01 = padded[:H, 1 : W + 1]
    f10 = padded[1 : H + 1, :W]
    f11 = padded[1 : H + 1, 1 : W + 1]
    return jnp.concatenate([f00, f01, f10, f11], axis=-1).reshape(H * W, 4 * C)


def _axis_slot_weights(coord: jnp.ndarray, size: int):
    """Per-axis slot weights + base index for one coordinate array.

    Returns (base, w0, w1): base in [0, size-1]; w0/w1 the weights of the
    quad's slot-0/slot-1 corners along this axis, already masked for
    validity (true corner position inside [0, size-1]).
    """
    c0 = jnp.floor(coord)
    frac = coord - c0
    base = jnp.clip(c0, 0, size - 1).astype(jnp.int32)
    # shift == 1 iff c0 < 0 (the valid corner moves into slot 0)
    shifted = c0 < 0
    valid0 = (c0 >= 0) & (c0 <= size - 1)
    valid1 = (c0 + 1 >= 0) & (c0 + 1 <= size - 1)
    w0 = jnp.where(shifted, jnp.where(valid1, frac, 0.0), jnp.where(valid0, 1.0 - frac, 0.0))
    w1 = jnp.where(shifted, 0.0, jnp.where(valid1, frac, 0.0))
    return base, w0, w1


def quad_sample(
    quad: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Bilinear sample at pixel coords (x, y) from a quad layout.

    Args:
        quad: (H*W, 4C) from build_quad.
        x, y: (...,) pixel coordinates (align_corners=True convention:
            integer coords hit pixel centers).
    Returns:
        (..., C) samples, zero where all corners are out of range.
    """
    C = quad.shape[-1] // 4
    xb, wx0, wx1 = _axis_slot_weights(x, W)
    yb, wy0, wy1 = _axis_slot_weights(y, H)
    rows = jnp.take(quad, yb * W + xb, axis=0)  # (..., 4C)
    shape = rows.shape[:-1] + (4, C)
    g = rows.reshape(shape)
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    # weights stay f32; accumulate in f32, return the storage dtype
    out = jnp.einsum("...sc,...s->...c", g.astype(jnp.float32), w.astype(jnp.float32))
    return out.astype(quad.dtype)


def build_corner_tables(image: jnp.ndarray):
    """(H, W, C) -> four (H*W, C) corner tables (f00, f01, f10, f11).

    f01/f10/f11 are the x+1 / y+1 / both-shifted copies with zero padding at
    the high edges.  Bilinear sampling then becomes four NARROW row gathers
    (512B rows in bf16 C=256) + explicit FMAs — measured 3.5x faster than any
    single-wide-row or einsum formulation on TPU (PERF.md sweep)."""
    H, W, C = image.shape
    padded = jnp.pad(image, ((0, 1), (0, 1), (0, 0)))
    f00 = padded[:H, :W].reshape(H * W, C)
    f01 = padded[:H, 1 : W + 1].reshape(H * W, C)
    f10 = padded[1 : H + 1, :W].reshape(H * W, C)
    f11 = padded[1 : H + 1, 1 : W + 1].reshape(H * W, C)
    return f00, f01, f10, f11


def corner_data_normalized(grid, H: int, W: int, align_corners: bool = True):
    """Normalized (-1,1) sample grid (..., 2) -> (base flat index (...,),
    slot weights (..., 4)) for corner-table sampling (validity-masked,
    exact grid_sample zero-padding semantics)."""
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) / 2.0 * (W - 1)
        y = (gy + 1.0) / 2.0 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) / 2.0
        y = ((gy + 1.0) * H - 1.0) / 2.0
    xb, wx0, wx1 = _axis_slot_weights(x, W)
    yb, wy0, wy1 = _axis_slot_weights(y, H)
    q = yb * W + xb
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    return q, w.astype(jnp.float32)


def corner_sample(tables, q, w):
    """Four-narrow-takes bilinear sample: tables from build_corner_tables,
    q (...,) flat base indices, w (..., 4) slot weights -> (..., C) f32."""
    v = None
    for si, t in enumerate(tables):
        term = jnp.take(t, q, axis=0).astype(jnp.float32) * w[..., si, None]
        v = term if v is None else v + term
    return v


def build_pair(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> ((H+1)*W, 2C) x-adjacent corner pairs.

    pair[y*W + x] = concat(f[y, x], f[y, x+1]); row block y == H is zeros so
    the bottom-row gather at (y0+1) needs no clipping.  In bf16 with C=256 a
    row is exactly 512B — the empirically fastest XLA row-gather granularity
    (PERF.md) — so bilinear = 2 gathers instead of the quad layout's 1 wide
    (slow) or the naive 4 narrow ones.
    """
    H, W, C = image.shape
    padded = jnp.pad(image, ((0, 1), (0, 1), (0, 0)))  # (H+1, W+1, C)
    f0 = padded[:, :W]
    f1 = padded[:, 1 : W + 1]
    return jnp.concatenate([f0, f1], axis=-1).reshape((H + 1) * W, 2 * C)


def pair_sample(
    pair: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Bilinear sample via two pair-row gathers (see build_pair).

    Exact grid_sample_2d semantics (zero padding, align_corners pixel coords).
    """
    C2 = pair.shape[-1]
    C = C2 // 2
    xb, wx0, wx1 = _axis_slot_weights(x, W)
    yb, wy0, wy1 = _axis_slot_weights(y, H)
    base = yb * W + xb
    top = jnp.take(pair, base, axis=0)  # (..., 2C)
    bot = jnp.take(pair, base + W, axis=0)
    shape = top.shape[:-1] + (2, C)
    top = top.reshape(shape)
    bot = bot.reshape(shape)
    wx = jnp.stack([wx0, wx1], axis=-1)[..., None].astype(jnp.float32)
    out = (
        wy0[..., None].astype(jnp.float32) * jnp.sum(top.astype(jnp.float32) * wx, axis=-2)
        + wy1[..., None].astype(jnp.float32) * jnp.sum(bot.astype(jnp.float32) * wx, axis=-2)
    )
    return out.astype(pair.dtype)


def pair_sample_normalized(pair, grid, H, W, align_corners: bool = True):
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) / 2.0 * (W - 1)
        y = (gy + 1.0) / 2.0 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) / 2.0
        y = ((gy + 1.0) * H - 1.0) / 2.0
    return pair_sample(pair, x, y, H, W)


def quad_sample_normalized(quad, grid, H, W, align_corners: bool = True):
    """Sample at normalized (-1, 1) grid (x, y) — grid_sample_2d drop-in."""
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) / 2.0 * (W - 1)
        y = (gy + 1.0) / 2.0 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) / 2.0
        y = ((gy + 1.0) * H - 1.0) / 2.0
    return quad_sample(quad, x, y, H, W)
