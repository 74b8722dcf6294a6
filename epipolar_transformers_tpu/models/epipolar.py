"""Epipolar transformer layer (Flax).

The paper's core module (reference modeling/layers/epipolar.py:11-269):
for every reference-view pixel, attend over `SAMPLESIZE` points along its
epipolar line in a neighboring view, fuse the similarity-weighted source
features, then optionally project through a 1x1 conv `z` + zero-init BN and
add residually.  Geometry lives in ops/epipolar_sampling.py; the attention
core in ops/epipolar_attention.py (oracle) with the gather-free matmul
formulation in ops/epipolar_attention_matmul.py as the TPU production path.

Differences from the reference by design (TPU-native):
  * NHWC layout, no Python batch loop;
  * config passed explicitly (frozen dataclass) instead of the yacs global;
  * detach() -> jax.lax.stop_gradient, controlled by EPIPOLAR.OTHER_GRAD;
  * the per-camera-pair prior is one (n_pairs, K, H, W) param table over the
    ordered non-self pairs of DATASETS.CAMERAS — exactly the pairs the
    reference materializes as a python dict of nn.Parameters
    (epipolar.py:73-80) — indexed through a static (id, id) -> slot lookup.
    Memory is n*(n-1)*K*H*W, not the dense n^2 table a naive embedding
    would allocate (a 10-camera rig saves the 10 dead self-pair slots and,
    more importantly, matches the reference's parameter count exactly).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import Config
from ..ops.epipolar_attention import AttentionParams, epipolar_attention
from ..ops.epipolar_attention_pooled import (
    epipolar_attention_pooled,
    supports_pooled_attention,
)
from ..ops.epipolar_attention_matmul import (
    epipolar_attention_matmul,
    supports_matmul_attention,
)
from ..ops.epipolar_attention_pallas import (
    epipolar_attention_pallas_batch,
    supports_pallas_attention,
)
from ..ops.epipolar_attention_streaming import (
    epipolar_attention_streaming,
    reconstruct_depth,
)
from ..ops.epipolar_sampling import EpipolarGeometry, epipolar_sample_locs
from .layers import ZeroInitBatchNorm, compute_dtype


class Epipolar(nn.Module):
    cfg: Config
    # 'auto' (default): the gather-free matmul formulation
    # (ops/epipolar_attention_matmul.py — MXU-only, no XLA gathers) for every
    # config except sample POOLING (avg/max attention, dot/cos/prior
    # similarity all supported); POOLING configs stream (the scan measures
    # faster than the materialized corner-table path on the v5e,
    # scripts/bench_param.py) except under prior similarity, which only the
    # pooled path (ops/epipolar_attention_pooled.py) expresses.
    # 'matmul' / 'pooled' / 'streaming' / 'reference' force one.  The
    # module default "" defers to cfg.EPIPOLAR.ATTENTION_IMPL so the choice
    # is reachable from the CLI (EPIPOLAR.ATTENTION_IMPL streaming);
    # passing the field explicitly (tests, benches) overrides the config.
    attention_impl: str = ""

    @property
    def impl(self) -> str:
        impl = self.attention_impl or self.cfg.EPIPOLAR.ATTENTION_IMPL
        if impl not in ("auto", "pallas", "matmul", "pooled", "streaming",
                        "reference"):
            raise ValueError(f"unknown EPIPOLAR.ATTENTION_IMPL {impl!r}")
        return impl

    def _shared_kv(self) -> bool:
        """True when keys and values are the same tensor — the flagship
        SHARE path (reference epipolar.py:204-208 samples once)."""
        e = self.cfg.EPIPOLAR
        return (
            e.FIND_CORR != "rgb"
            and "phi" not in e.PARAMETERIZED
            and "g" not in e.PARAMETERIZED
            and (("other1" in e.OTHER_GRAD) == ("other2" in e.OTHER_GRAD))
        )

    @property
    def geometry(self) -> EpipolarGeometry:
        c = self.cfg
        h, w = c.KEYPOINT.HEATMAP_SIZE
        return EpipolarGeometry(
            feat_h=h,
            feat_w=w,
            sample_size=c.EPIPOLAR.SAMPLESIZE,
            downsample=c.BACKBONE.DOWNSAMPLE,
            resize=c.DATASETS.IMAGE_RESIZE * c.DATASETS.PREDICT_RESIZE,
            correct_normalize=c.EPIPOLAR.USE_CORRECT_NORMALIZE,
        )

    @property
    def attention_params(self) -> AttentionParams:
        e = self.cfg.EPIPOLAR
        return AttentionParams(
            attention=e.ATTENTION,
            similarity=e.SIMILARITY,
            softmax_enabled=e.SOFTMAX_ENABLED,
            softmax_scale=e.SOFTMAXSCALE,
            pooling=e.POOLING,
            priormul=e.PRIORMUL,
            correct_normalize=e.USE_CORRECT_NORMALIZE,
        )

    def setup(self):
        c = self.cfg
        e = c.EPIPOLAR
        nfeats = c.KEYPOINT.NFEATS
        bottleneck = nfeats // e.BOTTLENECK
        if e.BOTTLENECK != 1:
            # reference epipolar.py:56-61
            assert all(k in e.PARAMETERIZED for k in ("z", "theta", "phi", "g"))
            assert not e.ZRESIDUAL
        if "z" in e.PARAMETERIZED:
            self.z = nn.Conv(nfeats, (1, 1), use_bias=True, dtype=compute_dtype(c), name="z")
            # BN sync is implicit under jit+GSPMD (see models/resnet.py:_norm);
            # BN_AXIS_NAME opts into explicit pmean sync under shard_map/pmap.
            self.bn = ZeroInitBatchNorm(
                momentum=1.0 - c.BACKBONE.BN_MOMENTUM,
                axis_name=c.BACKBONE.BN_AXIS_NAME or None,
                name="bn",
            )
        if "theta" in e.PARAMETERIZED:
            self.theta = nn.Conv(bottleneck, (1, 1), use_bias=True, dtype=compute_dtype(c), name="theta")
        if "phi" in e.PARAMETERIZED:
            self.phi = nn.Conv(bottleneck, (1, 1), use_bias=True, dtype=compute_dtype(c), name="phi")
        if "g" in e.PARAMETERIZED:
            self.g = nn.Conv(bottleneck, (1, 1), use_bias=True, dtype=compute_dtype(c), name="g")
        if e.PRIOR:
            cams = tuple(c.DATASETS.CAMERAS)
            if not cams:
                # the reference builds prior params by iterating
                # DATASETS.CAMERAS (epipolar.py:74-80); with it empty the
                # forward would KeyError there — fail at construction instead
                raise ValueError(
                    "EPIPOLAR.PRIOR requires DATASETS.CAMERAS to list the "
                    "camera ids (reference epipolar.py:74-80)"
                )
            # one param slot per ordered non-self pair (i, j), i != j —
            # the exact set the reference materializes; self-pairs are never
            # sampled so a dense n^2 table would waste n slots
            pairs = [(i, j) for i in cams for j in cams if i != j]
            # -1 marks pairs with no parameters (self-pairs, unlisted ids);
            # at call time those read a NEUTRAL ZERO prior instead of
            # silently training against some other pair's slot (the
            # reference's dict would KeyError — a data-dependent traced
            # index can't raise under jit, so neutrality is the loud-as-
            # possible option: zero prior = no additive bias, and
            # all-zero weights under SIMILARITY='prior')
            # size (max+2)^2: the extra -1 guard row/column absorbs ids
            # > max(cams) — JAX out-of-bounds gathers clamp, and without the
            # guard a too-large id would clamp onto a VALID slot of a
            # different pair and silently train/read the wrong prior
            lookup = np.full((max(cams) + 2, max(cams) + 2), -1, dtype=np.int32)
            for slot, (i, j) in enumerate(pairs):
                lookup[i, j] = slot
            self.prior_pair_lookup = lookup
            h, w = c.KEYPOINT.HEATMAP_SIZE
            k = e.SAMPLESIZE // (2 if e.POOLING else 1)
            self.prior_table = self.param(
                "prior",
                lambda key, shape: jax.random.uniform(key, shape, maxval=0.1),
                (max(len(pairs), 1), k, h, w),
            )

    def __call__(
        self,
        feat1: Optional[jnp.ndarray],
        feat2: jnp.ndarray,
        P1: jnp.ndarray,
        P2: jnp.ndarray,
        camera: Optional[jnp.ndarray] = None,
        other_camera: Optional[jnp.ndarray] = None,
        ref1: Optional[jnp.ndarray] = None,
        ref2: Optional[jnp.ndarray] = None,
        train: bool = True,
    ):
        """
        Args:
            feat1: (N, H, W, C) reference-view features.
            feat2: (N, H, W, C) source-view features.
            P1, P2: (N, 3, 4) full-res projection matrices (KRT).
            camera/other_camera: (N,) int ids (for the learned prior).
            ref1/ref2: (N, H, W, 3) downsampled RGB (FIND_CORR='rgb').
        Returns:
            (fused (N,H,W,C), corr_pos (N,H,W,2), depth (N,K',H,W), sample_locs)
        """
        c = self.cfg
        e = c.EPIPOLAR
        assert e.ATTENTION in {"avg", "max"}
        assert e.SIMILARITY in {"cos", "dot", "prior"}

        # -- key/value feature selection + detach semantics (epipolar.py:134-157)
        if e.FIND_CORR == "rgb":
            assert ref1 is not None and ref2 is not None
            assert "other1" not in e.OTHER_GRAD and "phi" not in e.PARAMETERIZED
            other1 = jax.lax.stop_gradient(ref2)
            query = ref1
        else:
            other1 = feat2 if "other1" in e.OTHER_GRAD else jax.lax.stop_gradient(feat2)
            if "phi" in e.PARAMETERIZED:
                other1 = self.phi(other1)
            if "theta" in e.PARAMETERIZED:
                feat1 = self.theta(feat1)
            query = feat1

        other2 = feat2 if "other2" in e.OTHER_GRAD else jax.lax.stop_gradient(feat2)
        if "g" in e.PARAMETERIZED:
            other2 = self.g(other2)

        # -- geometry (no_grad in the reference, epipolar.py:178-183)
        geom = self.geometry
        grid = jnp.asarray(geom.grid())
        # sample locations stay float32 even under bf16 compute — bf16's
        # 8-bit mantissa would cost up to half a pixel of placement error
        sample_locs = jax.lax.stop_gradient(
            jax.vmap(lambda a, b: epipolar_sample_locs(a, b, geom, grid))(
                P1.astype(jnp.float32), P2.astype(jnp.float32)
            )
        )

        params = self.attention_params
        prior = None
        if e.PRIOR or e.SIMILARITY == "prior":
            # static (id, id) -> pair-slot lookup, then gather the slots;
            # ids outside the lookup clamp into it (jax gather semantics)
            # and unparameterized pairs (slot -1) read a neutral zero prior
            lookup = jnp.asarray(self.prior_pair_lookup)
            slot = lookup[camera, other_camera]
            prior = jnp.where(
                (slot >= 0)[:, None, None, None],
                self.prior_table[jnp.maximum(slot, 0)],
                0.0,
            )  # (N, K', H, W)

        # a FORCED impl that can't express this config must fail loudly,
        # not silently fall through to the oracle
        unsupported = (
            (self.impl == "matmul" and not supports_matmul_attention(params))
            or (self.impl == "pallas"
                and (not supports_pallas_attention(params) or train))
            or (self.impl == "pooled" and not supports_pooled_attention(params))
            or (self.impl == "streaming" and e.SIMILARITY == "prior")
        )
        if unsupported:
            raise ValueError(
                f"EPIPOLAR.ATTENTION_IMPL={self.impl!r} does not support "
                f"this config's attention semantics ({params}"
                f"{', train=True — the Mosaic kernel is forward-only' if self.impl == 'pallas' and train else ''}"
                "); use 'auto'"
            )

        if self.impl == "pallas":
            # fused Mosaic kernel (explicit opt-in): XLA keeps the two big
            # matmuls, the kernel fuses the profile/softmax middle.  On the
            # v5e it measures SLOWER than the XLA matmul path (9.3 vs 6.4
            # ms/iter flagship bf16 — in-kernel q-batched 64^3 dots run far
            # below MXU peak; scripts/bench_attn_pallas.py), so 'auto'
            # never lands here; the kernel is kept as a measured,
            # parity-tested alternative and a base for future Mosaic work.
            out, corr_pos, depth = epipolar_attention_pallas_batch(
                query, other1, other2, sample_locs, params, prior
            )
        elif (
            self.impl in ("auto", "matmul")
            and supports_matmul_attention(params)
        ):
            # gather-free path: depth (the full weight stack) comes free.
            # remat only under training: checkpoint is an autodiff-only
            # construct (a no-op on a pure forward jit — measured neutral,
            # 869.0 vs 869.8 f/s on the flagship bench), but an eval-mode
            # forward embedded in someone else's grad shouldn't pay
            # chunk-recompute in its backward
            try:
                remat = {"full": True, "dots": "dots",
                         "dots_bf16": "dots_bf16", "none": False}[
                    e.ATTENTION_REMAT]
            except KeyError:
                raise ValueError(
                    f"EPIPOLAR.ATTENTION_REMAT={e.ATTENTION_REMAT!r}: "
                    "expected 'full' | 'dots' | 'dots_bf16' | 'none'"
                ) from None
            remat = remat if train else False
            if prior is None:
                out, corr_pos, depth = jax.vmap(
                    lambda q, o1, o2, s: epipolar_attention_matmul(
                        q, o1, o2, s, params, remat=remat
                    )
                )(query, other1, other2, sample_locs)
            else:
                out, corr_pos, depth = jax.vmap(
                    lambda q, o1, o2, s, p: epipolar_attention_matmul(
                        q, o1, o2, s, params, p, remat=remat
                    )
                )(query, other1, other2, sample_locs, prior)
        elif supports_pooled_attention(params) and (
            self.impl == "pooled"
            or (self.impl == "auto" and e.SIMILARITY == "prior")
        ):
            # POOLING: materialized corner-table path — one big gather pass
            # instead of the streaming K/2-step scan.  The full weight stack
            # ('depth') comes free; jax.checkpoint keeps the (K, H, W, C)
            # sample stack out of the saved residuals under autodiff.
            # On the real v5e the streaming scan measures FASTER at the
            # param-config shape (128.9 vs 177.2 ms, scripts/bench_param.py),
            # so 'auto' only lands here when streaming can't express the
            # config (prior similarity); force ATTENTION_IMPL=pooled to
            # bench/compare.
            shared = self._shared_kv()
            fn = lambda q, o1, o2, s, p: epipolar_attention_pooled(  # noqa: E731
                q, o1, o2, s, params, p, shared_kv=shared
            )
            if train:
                fn = jax.checkpoint(fn)
            if prior is None:
                out, corr_pos, depth = jax.vmap(
                    lambda q, o1, o2, s: fn(q, o1, o2, s, None)
                )(query, other1, other2, sample_locs)
            else:
                out, corr_pos, depth = jax.vmap(fn)(
                    query, other1, other2, sample_locs, prior
                )
        elif (
            self.impl in ("auto", "streaming") and e.SIMILARITY != "prior"
        ):
            shared = self._shared_kv()
            # the full (K', H, W) weight stack is only materialized when a
            # consumer actually reads it (reprojection loss, warped heatmaps,
            # epipolar-line vis, saved predictions) — it costs a full extra
            # key-gather pass (~45% of attention time)
            need_depth = (
                e.REPROJECT_LOSS_WEIGHT != 0
                or e.WARPEDHEATMAP
                or c.VIS.EPIPOLAR_LINE
                or (not train and c.VIS.SAVE_PRED)
            )
            if prior is None:
                out, corr_pos, stats = jax.vmap(
                    lambda q, o1, o2, s: epipolar_attention_streaming(
                        q, o1, o2, s, params, shared_kv=shared, remat=train
                    )
                )(query, other1, other2, sample_locs)
                if need_depth:
                    depth = jax.vmap(
                        lambda q, o1, s, st: reconstruct_depth(q, o1, s, params, st)
                    )(query, other1, sample_locs, stats)
                else:
                    depth = stats.best_rank[:, None]  # (N, 1, H, W) placeholder
            else:
                out, corr_pos, stats = jax.vmap(
                    lambda q, o1, o2, s, p: epipolar_attention_streaming(
                        q, o1, o2, s, params, p, shared_kv=shared, remat=train
                    )
                )(query, other1, other2, sample_locs, prior)
                if need_depth:
                    depth = jax.vmap(
                        lambda q, o1, s, st, p: reconstruct_depth(
                            q, o1, s, params, st, p
                        )
                    )(query, other1, sample_locs, stats, prior)
                else:
                    depth = stats.best_rank[:, None]
        elif prior is not None:
            out, corr_pos, depth = jax.vmap(
                lambda q, o1, o2, s, p: epipolar_attention(q, o1, o2, s, params, p)
            )(query, other1, other2, sample_locs, prior)
        else:
            out, corr_pos, depth = jax.vmap(
                lambda q, o1, o2, s: epipolar_attention(q, o1, o2, s, params)
            )(query, other1, other2, sample_locs)

        # -- z projection + zero-init BN (+ optional residual) epipolar.py:249-255
        if "z" in e.PARAMETERIZED:
            finalout = self.z(out)
            finalout = self.bn(finalout, use_running_average=not train)
            if e.ZRESIDUAL:
                finalout = finalout + out
        else:
            finalout = out

        return finalout, corr_pos, depth, sample_locs
