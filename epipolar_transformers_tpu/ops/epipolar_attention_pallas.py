"""Fused Pallas TPU kernel for epipolar attention (flagship configuration).

Computes the same function as ops/epipolar_attention_matmul.py (itself
oracle-parity-tested against ops/epipolar_attention.py, the functional twin
of reference modeling/layers/epipolar.py:188-247,272-321) for the flagship
semantics — avg attention, dot similarity, shared key/value features, no
prior, no pooling — in ONE kernel that keeps every intermediate in VMEM:

    per (batch, query-tile) program:
      G    = f1_tile @ f2^T                  row-looped MXU dots, VMEM scratch
      xprof/yprof = iota-compare profiles    VPU, built in contraction layout
      T    = G  (x)  xprof                   batched MXU dot over queries
      sim  = sum_y T * yprofT                VPU reduce
      w    = softmax(mask(sim) / sqrt(K))    VPU
      nmat = (yprofT * w) (k) xprof          batched MXU dot
      out  = nmat @ f2                       row-looped MXU dots

The XLA formulation (epipolar_attention_matmul) round-trips G, the profiles,
T and the weight matrix through HBM between einsums (~5 ms of its ~13 ms at
the flagship shape); here they never leave VMEM.

Mosaic constraints shaping the code (probed on hardware):
  * reshapes that split the lane dimension, e.g. (Q, H*W) -> (Q, H, W), do
    not lower — so G is built (and consumed) one image row at a time;
  * minor-dim transposes are avoided by building each profile directly in
    the layout its contraction needs (yprof as (Q, H, K), xprof as (Q, K, W));
  * batched dot_general (batch dim 0) and broadcasted_iota lower fine —
    but iota must be INTEGER-typed (tpu.iota rejects float results) and
    dots default to bf16 MXU rounding (pass precision= explicitly);
  * the scoped-VMEM limit is 16 MB: QT=64 tiles fit, QT=128 needs 20.97 MB.

Hardware status (v5e, round 3 — scripts/probe_pallas_tent.py /
probe_pallas_stages.py): the tent formulation COMPILES AND RUNS on the
real chip and is EXACT at mxu_precision='highest' (max abs err 6e-6 vs an
exact-f32 CPU run; the XLA matmul path itself sits 0.031 away due to its
own bf16 MXU rounding).  It is however ~3.7x SLOWER than the XLA matmul
formulation at the flagship shape (25.2 ms vs 6.9 ms, batch 8; 15.1 ms at
bf16 precision): the row-looped G/out dots serialize 2*H small MXU
operations per tile, which costs more than the HBM roundtrips the fusion
saves.  Production dispatch therefore stays on the (autodiff-able) matmul
path — now a measured perf decision, no longer a toolchain blocker.
Forward-only; exercised by tests/test_epipolar_pallas.py in interpreter
mode and by the probe scripts on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.camera import denormalize_pixel
from .epipolar_attention import NEG_INF, AttentionParams
from .quad_gather import _axis_slot_weights


def supports_pallas_attention(params: AttentionParams, shared_kv: bool,
                              has_prior: bool, n_queries: int) -> bool:
    """The kernel covers exactly the flagship semantics; everything else
    falls back to the (fully general) matmul path."""
    return (
        params.attention == "avg"
        and params.similarity == "dot"
        and not params.pooling
        and shared_kv
        and not has_prior
        and n_queries % _tile(n_queries) == 0
    )


def _tile(hw: int) -> int:
    """Query-tile size.  64 keeps the per-program VMEM footprint under the
    16 MB scoped limit at the flagship shape: the (QT,H,W) G scratch and the
    (QT,K,W)/(QT,H,K) profile intermediates all scale with QT (1 MB each at
    QT=64) on top of the pipelined f2 block (4 MB f32, double-buffered).
    QT=128 was measured to need 20.97 MB on the real v5e toolchain."""
    return min(64, hw)


def _kernel(f1_ref, f2_ref, xb_ref, wx0_ref, wx1_ref, yb_ref, wy0_ref,
            wy1_ref, out_ref, w_ref, g_scratch, *, H, W, K, softmax_enabled,
            softmax_scale):
    QT, C = f1_ref.shape[1], f1_ref.shape[2]
    f1t = f1_ref[0]  # (QT, C)
    prof_dtype = f1t.dtype

    # ---- G[q, y, x] = <f1[q], f2[y, x]> --- one MXU dot per image row
    # (Mosaic cannot reshape (QT, H*W) -> (QT, H, W))
    def g_row(y, _):
        row = f2_ref[0, pl.ds(y, 1)][0]  # (W, C)
        g = jax.lax.dot_general(
            f1t, row, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (QT, W)
        g_scratch[:, pl.ds(y, 1), :] = g.astype(g_scratch.dtype)[:, None, :]
        return 0

    jax.lax.fori_loop(0, H, g_row, 0)

    # ---- bilinear profiles, each built directly in its contraction layout
    xb = xb_ref[0]  # (QT, K) int32
    xi = jax.lax.broadcasted_iota(jnp.int32, (QT, K, W), 2)
    xprof = (
        jnp.where(xi == xb[..., None], wx0_ref[0][..., None], 0.0)
        + jnp.where(xi == xb[..., None] + 1, wx1_ref[0][..., None], 0.0)
    ).astype(prof_dtype)  # (QT, K, W)

    yb = yb_ref[0][:, None, :]  # (QT, 1, K)
    yi = jax.lax.broadcasted_iota(jnp.int32, (QT, H, K), 1)
    yprof_t = (
        jnp.where(yi == yb, wy0_ref[0][:, None, :], 0.0)
        + jnp.where(yi == yb + 1, wy1_ref[0][:, None, :], 0.0)
    ).astype(prof_dtype)  # (QT, H, K)

    # ---- x-contraction on the MXU: T[q, y, k] = sum_x G[q,y,x] xprof[q,k,x]
    T = jax.lax.dot_general(
        g_scratch[:].astype(prof_dtype), xprof,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (QT, H, K)

    # ---- y-contraction on the VPU; exact-zero => out-of-range sentinel
    sim = jnp.sum(T * yprof_t.astype(jnp.float32), axis=1)  # (QT, K)
    masked = jnp.where(sim == 0.0, NEG_INF, sim)
    if softmax_enabled:
        w = jax.nn.softmax(masked * softmax_scale, axis=-1)
    else:
        w = masked / K
    w_ref[0] = w

    # ---- fused output: nmat[q,y,x] = sum_k (yprofT*w)[q,y,k] xprof[q,k,x]
    yw = (yprof_t.astype(jnp.float32) * w[:, None, :]).astype(prof_dtype)
    nmat = jax.lax.dot_general(
        yw, xprof, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (QT, H, W)
    # G is dead past T; reuse its scratch so the row loop can slice a ref
    # (Mosaic cannot dynamic_slice an SSA value)
    g_scratch[:] = nmat

    # ---- out[q] = sum_{y,x} nmat[q,y,x] f2[y,x,:] --- row-looped MXU dots
    def out_row(y, acc):
        row = f2_ref[0, pl.ds(y, 1)][0]  # (W, C)
        nrow = g_scratch[:, pl.ds(y, 1), :][:, 0, :].astype(prof_dtype)
        return acc + jax.lax.dot_general(
            nrow, row, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, H, out_row, jnp.zeros((QT, C), jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


def _kernel_tent(f1_ref, f2_ref, x_ref, y_ref, ones_w_ref, ones_h_ref,
                 out_ref, w_ref, g_scratch, *, H, W, K, softmax_enabled,
                 softmax_scale, mxu_precision=jax.lax.Precision.HIGHEST):
    """Profile construction reformulated to dodge the Mosaic crash class
    "lane-broadcast elementwise / iota-compare coexisting with dot_general"
    (PERF.md "Pallas fused-kernel investigation"):

      * the bilinear zero-padding profile IS the tent function
        relu(1 - |i - x|) — for any continuous x it reproduces
        _axis_slot_weights' masked corner weights exactly, including the
        border cases (x in [-1, 0] / [size-1, size]) and full out-of-range
        (all-zero row), so no compares and no slot/validity logic at all;
      * the per-(q, k) coordinate is broadcast along the lane axis by a
        batched rank-1 dot_general against a ones ref (MXU broadcast),
        never by a (QT, K, 1) * (QT, K, W) elementwise op;
      * broadcasted_iota is used alone (known to lower), never compared.

    Everything downstream (G build, contractions, softmax, fused output) is
    identical to _kernel."""
    QT, C = f1_ref.shape[1], f1_ref.shape[2]
    f1t = f1_ref[0]  # (QT, C)
    prof_dtype = f1t.dtype

    def g_row(yy, _):
        row = f2_ref[0, pl.ds(yy, 1)][0]  # (W, C)
        g = jax.lax.dot_general(
            f1t, row, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision)  # (QT, W)
        g_scratch[:, pl.ds(yy, 1), :] = g.astype(g_scratch.dtype)[:, None, :]
        return 0

    jax.lax.fori_loop(0, H, g_row, 0)

    one = jnp.float32(1.0)

    # X2[q, k, w] = x[q, k]  (batched rank-1 MXU broadcast: (QT,K,1)@(QT,1,W)).
    # The broadcast dots are ALWAYS exact (HIGHEST): at default precision the
    # MXU rounds the f32 coordinates to bf16, which skews every tent profile
    # (measured on hardware: 0.0156 abs coordinate error -> systematic
    # weight/output divergence, scripts/probe_pallas_stages.py).
    x2 = jax.lax.dot_general(
        x_ref[0][..., None], ones_w_ref[0],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (QT, K, W)
    # Mosaic's tpu.iota only admits integer results; cast after.
    xi = jax.lax.broadcasted_iota(jnp.int32, (QT, K, W), 2).astype(jnp.float32)
    xprof = jnp.maximum(one - jnp.abs(xi - x2), 0.0).astype(prof_dtype)

    # Y2[q, h, k] = y[q, k]  ((QT,H,1)-ones @ (QT,1,K)-y)
    y2 = jax.lax.dot_general(
        ones_h_ref[0], y_ref[0][:, None, :],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (QT, H, K)
    yi = jax.lax.broadcasted_iota(jnp.int32, (QT, H, K), 1).astype(jnp.float32)
    yprof_t = jnp.maximum(one - jnp.abs(yi - y2), 0.0).astype(prof_dtype)

    T = jax.lax.dot_general(
        g_scratch[:].astype(prof_dtype), xprof,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=mxu_precision)  # (QT, H, K)

    sim = jnp.sum(T * yprof_t.astype(jnp.float32), axis=1)  # (QT, K)
    masked = jnp.where(sim == 0.0, NEG_INF, sim)
    if softmax_enabled:
        w = jax.nn.softmax(masked * softmax_scale, axis=-1)
    else:
        w = masked / K
    w_ref[0] = w

    yw = (yprof_t.astype(jnp.float32) * w[:, None, :]).astype(prof_dtype)
    nmat = jax.lax.dot_general(
        yw, xprof, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=mxu_precision)  # (QT, H, W)
    g_scratch[:] = nmat

    def out_row(yy, acc):
        row = f2_ref[0, pl.ds(yy, 1)][0]  # (W, C)
        nrow = g_scratch[:, pl.ds(yy, 1), :][:, 0, :].astype(prof_dtype)
        return acc + jax.lax.dot_general(
            nrow, row, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision)

    acc = jax.lax.fori_loop(
        0, H, out_row, jnp.zeros((QT, C), jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("params", "interpret", "profile_mode",
                                    "mxu_precision"))
def epipolar_attention_pallas(
    feat1: jnp.ndarray,
    other: jnp.ndarray,
    sample_locs: jnp.ndarray,
    params: AttentionParams,
    interpret: bool = False,
    profile_mode: str = "tent",
    mxu_precision: str = "highest",
):
    """Batched fused epipolar attention (shared key/value features).

    Args:
        feat1: (N, H, W, C) reference-view queries.
        other: (N, H, W, C) source-view features (keys == values).
        sample_locs: (N, K, H, W, 2) normalized (-1, 1) sample locations.
        interpret: run the kernel in interpreter mode (CPU tests).
        profile_mode: 'tent' (default) builds profiles as
            relu(1 - |iota - x|) with dot_general broadcasts — the
            formulation designed around the Mosaic broadcast/compare crash
            (see _kernel_tent); 'slots' is the original iota-compare
            construction (known NOT to lower on the current toolchain,
            kept for interpreter cross-checks).
        mxu_precision: 'highest' (default) runs the heavy contractions
            (G/T/nmat/out) as exact f32 MXU passes — hardware-parity with
            the matmul path; 'default' lets them round to bf16 (production
            compute dtype class, ~2x faster on paper).  The coordinate
            broadcast dots are HIGHEST regardless (bf16-rounded sample
            coordinates systematically skew the tent profiles —
            scripts/probe_pallas_stages.py).
    Returns:
        out: (N, H, W, C), corr_pos: (N, H, W, 2), depth: (N, K, H, W) —
        same contract as epipolar_attention_matmul_batch.
    """
    N, H, W, C = feat1.shape
    K = sample_locs.shape[1]
    HW = H * W
    QT = _tile(HW)
    assert HW % QT == 0, (HW, QT)

    # per-(query, sample) bilinear data, (N, HW, K) each — same conventions
    # as ops/epipolar_attention_matmul.py (align_corners=True unnormalize)
    locs = sample_locs.reshape(N, K, HW, 2).transpose(0, 2, 1, 3)
    locs = jax.lax.stop_gradient(locs).astype(jnp.float32)
    x = (locs[..., 0] + 1.0) / 2.0 * (W - 1)
    y = (locs[..., 1] + 1.0) / 2.0 * (H - 1)

    f1 = feat1.reshape(N, HW, C)
    f2 = other  # (N, H, W, C); rows sliced inside the kernel

    grid = (N, HW // QT)
    tile_qk = pl.BlockSpec((1, QT, K), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    f1_spec = pl.BlockSpec((1, QT, C), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    # full source image per batch item; index independent of i, so
    # Pallas keeps it resident across the inner grid dimension
    f2_spec = pl.BlockSpec((1, H, W, C), lambda b, i: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [f1_spec, tile_qk]
    out_shape = [
        jax.ShapeDtypeStruct((N, HW, C), feat1.dtype),
        jax.ShapeDtypeStruct((N, HW, K), jnp.float32),
    ]
    scratch = [pltpu.VMEM((QT, H, W), jnp.float32)]
    kern_kw = dict(H=H, W=W, K=K,
                   softmax_enabled=params.softmax_enabled,
                   softmax_scale=float(params.softmax_scale))
    tent_kw = dict(kern_kw, mxu_precision={
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[mxu_precision])

    if profile_mode == "tent":
        # ones refs for the rank-1 dot_general broadcasts (ref-loaded
        # operands are the probed-safe operand class for Mosaic dots)
        ones_w = jnp.ones((1, QT, 1, W), jnp.float32)
        ones_h = jnp.ones((1, QT, H, 1), jnp.float32)
        out, w = pl.pallas_call(
            functools.partial(_kernel_tent, **tent_kw),
            grid=grid,
            in_specs=[
                f1_spec, f2_spec, tile_qk, tile_qk,
                pl.BlockSpec((1, QT, 1, W), lambda b, i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H, 1), lambda b, i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(f1, f2, x, y, ones_w, ones_h)
    elif profile_mode == "slots":
        xb, wx0, wx1 = _axis_slot_weights(x, W)
        yb, wy0, wy1 = _axis_slot_weights(y, H)
        wdt = feat1.dtype
        wx0, wx1, wy0, wy1 = (a.astype(wdt) for a in (wx0, wx1, wy0, wy1))
        out, w = pl.pallas_call(
            functools.partial(_kernel, **kern_kw),
            grid=grid,
            in_specs=[
                f1_spec, f2_spec,
                tile_qk, tile_qk, tile_qk, tile_qk, tile_qk, tile_qk,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(f1, f2, xb, wx0, wx1, yb, wy0, wy1)
    else:
        raise ValueError(profile_mode)

    out = out.reshape(N, H, W, C)
    depth = w.transpose(0, 2, 1).reshape(N, K, H, W)

    best = jnp.argmax(w, axis=-1).reshape(N, H, W)  # (N, H, W)
    pos = jnp.take_along_axis(
        sample_locs, best[:, None, :, :, None], axis=1)[:, 0]
    corr_pos = jax.lax.stop_gradient(
        denormalize_pixel(pos, H, W, correct=params.correct_normalize))
    return out, corr_pos, depth
