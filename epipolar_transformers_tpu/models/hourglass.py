"""Stacked Hourglass backbone (Flax, NHWC) with per-stack multiview fusion.

Equivalent of reference modeling/backbones/ProHG.py:18-307:
  * pre-activation Residual / HierarchicalPMS modules (:18-87);
  * recursive Hourglass with maxpool-down, bilinear align_corners=True up
    (:91-119 — upsample via separable interp matmuls, ops/resize.py);
  * nStack stages with intermediate supervision and feature re-injection
    (:160-288);
  * per-stack fusion: 'epipolarHG' (shared Epipolar sampler), 'metaHG'
    (hypernetwork), 'simplemultiviewHG' (plain add), with MERGE
    early/late/both/none and OTHER_ONLY (:207-279);
  * optional sigmoid on heatmaps; warped-heatmap head (WARPEDHEATMAP)
    returns the other view's heatmaps warped by attention depth (:290-293).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.resize import resize_bilinear_align_corners
from ..ops.soft_argmax import find_tensor_peak_batch
from .epipolar import Epipolar
from .meta import Meta
from .resnet import BackboneOutput, _norm


class Residual(nn.Module):
    """Pre-activation bottleneck residual (ProHG.py:18-50)."""

    cfg: Config
    num_out: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        middle = self.num_out // 2
        num_in = x.shape[-1]

        h = _norm(self.cfg, "bnA")(x, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(middle, (1, 1), name="convA")(h)
        h = _norm(self.cfg, "bnB")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(middle, (3, 3), padding=1, name="convB")(h)
        h = _norm(self.cfg, "bnC")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(self.num_out, (1, 1), name="convC")(h)

        if num_in != self.num_out:
            r = _norm(self.cfg, "bnR")(x, use_running_average=not train)
            r = nn.relu(r)
            r = nn.Conv(self.num_out, (1, 1), name="branch")(r)
        else:
            r = x
        return h + r


class HierarchicalPMS(nn.Module):
    """Hierarchical parallel-multi-scale module (ProHG.py:53-87)."""

    cfg: Config
    num_out: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_in = x.shape[-1]
        cA = self.num_out // 2
        cB = self.num_out // 4
        cC = self.num_out - cA - cB

        a = _norm(self.cfg, "bnA")(x, use_running_average=not train)
        a = nn.relu(a)
        a = nn.Conv(cA, (3, 3), padding=1, name="convA")(a)
        b = _norm(self.cfg, "bnB")(a, use_running_average=not train)
        b = nn.relu(b)
        b = nn.Conv(cB, (3, 3), padding=1, name="convB")(b)
        c = _norm(self.cfg, "bnC")(b, use_running_average=not train)
        c = nn.relu(c)
        c = nn.Conv(cC, (3, 3), padding=1, name="convC")(c)
        h = jnp.concatenate([a, b, c], axis=-1)

        if num_in != self.num_out:
            r = _norm(self.cfg, "bnR")(x, use_running_average=not train)
            r = nn.relu(r)
            r = nn.Conv(self.num_out, (1, 1), name="branch")(r)
        else:
            r = x
        return h + r


def _module_cls(name: str):
    return {"Residual": Residual, "HierarchicalPMS": HierarchicalPMS}[name]


class Hourglass(nn.Module):
    """Recursive hourglass (ProHG.py:91-119)."""

    cfg: Config
    n: int
    n_modules: int
    n_feats: int
    module: str = "Residual"

    @nn.compact
    def __call__(self, x, train: bool = True):
        Block = _module_cls(self.module)
        res = x
        for i in range(self.n_modules):
            res = Block(self.cfg, self.n_feats, name=f"res{i}")(res, train)
        down = nn.max_pool(res, (2, 2), strides=(2, 2))
        for i in range(self.n_modules):
            down = Block(self.cfg, self.n_feats, name=f"down{i}")(down, train)
        if self.n > 1:
            mid = Hourglass(self.cfg, self.n - 1, self.n_modules, self.n_feats,
                            self.module, name="mid")(down, train)
        else:
            mid = down
            for i in range(self.n_modules):
                mid = Block(self.cfg, self.n_feats, name=f"mid{i}")(mid, train)
        up = mid
        for i in range(self.n_modules):
            up = Block(self.cfg, self.n_feats, name=f"up{i}")(up, train)
        up = resize_bilinear_align_corners(up, (res.shape[-3], res.shape[-2]))
        return res + up


HG_CONFIGS = {
    # reference ProHG.py:310-395
    "HG": dict(stages=3, n_modules=1, recursive=3),
    "HG1": dict(stages=1, n_modules=1, recursive=3),
    "HG11": dict(stages=1, n_modules=1, recursive=1),
}


class HourglassNet(nn.Module):
    cfg: Config
    module: str = "Residual"
    use_sigmoid: bool = False

    def _variant(self) -> dict:
        body = self.cfg.BACKBONE.BODY
        for suffix in ("HG11", "HG1", "HG"):
            if body.endswith(suffix):
                return HG_CONFIGS[suffix]
        return HG_CONFIGS["HG"]

    def setup(self):
        c = self.cfg
        v = self._variant()
        self.n_stack = v["stages"]
        self.n_modules = v["n_modules"]
        self.recursive = v["recursive"]
        self.n_feats = c.KEYPOINT.NFEATS
        body = c.BACKBONE.BODY
        self.fusion = (
            "epipolar" if "epipolarHG" in body
            else "meta" if "metaHG" in body
            else "simple" if "simplemultiviewHG" in body
            else None
        )
        if self.fusion == "epipolar":
            self.epipolar_sampler = Epipolar(c, name="epipolar_sampler")
        elif self.fusion == "meta":
            self.metas = [Meta(self.n_feats, name=f"meta{i}") for i in range(self.n_stack)]

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        other_features=None,
        other_KRT=None,
        KRT=None,
        camera=None,
        other_camera=None,
        other_img=None,
        other_heatmaps=None,
        train: bool = True,
        decode_peaks: bool = True,
    ) -> BackboneOutput:
        """other_features for HG is a LIST of per-merge-point feature maps
        from the sibling net (reference indexes other_features[i],
        ProHG.py:218-224)."""
        c = self.cfg
        Block = _module_cls(self.module)

        # stem (ProHG.py:147-158)
        h = nn.Conv(32, (3, 3), strides=2, padding=1, name="stem_conv0")(x)
        h = _norm(c, "stem_bn0")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(32, (3, 3), padding=1, name="stem_conv1")(h)
        h = _norm(c, "stem_bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(64, (3, 3), padding=1, name="stem_conv2")(h)
        h = _norm(c, "stem_bn2")(h, use_running_average=not train)
        h = nn.relu(h)
        h = Block(c, 128, name="ress0")(h, train)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = Block(c, 128, name="ress1")(h, train)
        h = Block(c, self.n_feats, name="ress2")(h, train)

        heatmaps = []
        corr_pos = depth = sample_locs = None
        feat_cnt = 0

        def get_other_feat(i, feat):
            nonlocal feat_cnt
            if other_features is None:
                return feat, None, None, None
            idx = i
            if self.fusion == "simple":
                ret = other_features[idx]
                cp = d = sl = None
            elif self.fusion == "meta":
                ret = self.metas[idx](KRT, other_KRT, other_features[idx])
                cp = d = sl = None
            elif self.fusion == "epipolar":
                if c.EPIPOLAR.FIND_CORR == "rgb":
                    # downsampled rgb as the correspondence signal
                    ds = c.BACKBONE.DOWNSAMPLE
                    r1 = jax.lax.stop_gradient(nn.avg_pool(x, (ds, ds), strides=(ds, ds)))
                    r2 = jax.lax.stop_gradient(
                        nn.avg_pool(other_img, (ds, ds), strides=(ds, ds))
                    )
                    ret, cp, d, sl = self.epipolar_sampler(
                        feat, other_features[idx], KRT, other_KRT,
                        camera=camera, other_camera=other_camera,
                        ref1=r1, ref2=r2, train=train,
                    )
                else:
                    ret, cp, d, sl = self.epipolar_sampler(
                        feat, other_features[idx], KRT, other_KRT,
                        camera=camera, other_camera=other_camera, train=train,
                    )
            else:
                raise NotImplementedError(c.BACKBONE.BODY)
            if c.EPIPOLAR.OTHER_ONLY:
                return ret, cp, d, sl
            return ret + feat, cp, d, sl

        features = []
        for i in range(self.n_stack):
            # per-stack feature tower (ProHG.py:162-167)
            def tower(z, i=i):
                z = Hourglass(c, self.recursive, self.n_modules, self.n_feats,
                              self.module, name=f"hg{i}")(z, train)
                for m in range(self.n_modules):
                    z = Block(c, self.n_feats, name=f"tower{i}_mod{m}")(z, train)
                z = nn.Conv(self.n_feats, (1, 1), name=f"tower{i}_conv")(z)
                z = _norm(c, f"tower{i}_bn")(z, use_running_average=not train)
                return nn.relu(z)

            # the features list mirrors the reference exactly (ProHG.py:242-279):
            # it is what a sibling single-view net hands to the multiview net's
            # per-merge-point fusion, so content/count per stack must match
            # (early/none: raw stack input; late: fused tower output; both: both)
            # SOLVER.FINETUNE: stop the gradient at the fusion boundary so
            # finetuning trains only the downstream heads (reference
            # ProHG.py:246,255,268 detach_() per merge mode)
            merge = c.EPIPOLAR.MERGE
            finetune = c.SOLVER.FINETUNE
            if merge == "early":
                fused, corr_pos, depth, sample_locs = get_other_feat(feat_cnt, h)
                feat_cnt += 1
                if finetune:
                    fused = jax.lax.stop_gradient(fused)
                feature = tower(fused)
                features.append(h)
            elif merge == "both":
                fused, corr_pos, depth, sample_locs = get_other_feat(feat_cnt, h)
                feat_cnt += 1
                features.append(h)
                if finetune:
                    fused = jax.lax.stop_gradient(fused)
                feature = tower(fused)
                feature, corr_pos, depth, sample_locs = get_other_feat(feat_cnt, feature)
                feat_cnt += 1
                features.append(feature)
            elif merge == "late":
                feature = tower(h)
                if finetune:
                    feature = jax.lax.stop_gradient(feature)
                feature, corr_pos, depth, sample_locs = get_other_feat(feat_cnt, feature)
                feat_cnt += 1
                features.append(feature)
            else:  # 'none'
                feature = tower(h)
                features.append(h)

            hm = nn.Conv(c.KEYPOINT.NUM_PTS, (1, 1), name=f"tmpOut{i}")(feature)
            if self.use_sigmoid:
                hm = nn.sigmoid(hm)
            heatmaps.append(hm)
            if i < self.n_stack - 1:
                ll = nn.Conv(self.n_feats, (1, 1), name=f"trsfea{i}")(feature)
                tm = nn.Conv(self.n_feats, (1, 1), name=f"trstmp{i}")(hm)
                h = h + ll + tm

        warped = None
        if c.EPIPOLAR.WARPEDHEATMAP and other_heatmaps is not None and depth is not None:
            warped = self._warp_heatmaps(other_heatmaps, KRT, other_KRT, depth)

        locs = scores = None
        if decode_peaks:
            hm_jhw = jnp.transpose(heatmaps[-1], (0, 3, 1, 2)).astype(jnp.float32)
            locs, scores = jax.vmap(
                lambda m: find_tensor_peak_batch(m, c.KEYPOINT.SIGMA, c.BACKBONE.DOWNSAMPLE)
            )(hm_jhw)

        return BackboneOutput(
            features=tuple(features),  # per-merge-point list (sibling contract)
            heatmaps=tuple(heatmaps),
            locs=locs,
            scores=scores,
            corr_pos=corr_pos,
            depth=depth,
            sample_locs=sample_locs,
            warped_heatmap=warped,
        )

    def _warp_heatmaps(self, other_heatmaps, KRT, other_KRT, depth):
        """Warp the other view's heatmaps along epipolar lines weighted by the
        attention depth (reference epipolar.py:470-514 imgforward_withdepth,
        hard-max variant)."""
        from ..ops.epipolar_sampling import epipolar_sample_locs
        from ..ops.grid_sample import grid_sample_2d

        geom = self.epipolar_sampler.geometry

        def one(hm2, P1, P2, d):
            locs = epipolar_sample_locs(P1.astype(jnp.float32), P2.astype(jnp.float32), geom)
            idx = jnp.argmax(d, axis=0)  # (H, W)

            def body(carry, loc_k):
                return carry, grid_sample_2d(hm2, loc_k)

            _, samples = jax.lax.scan(body, None, locs)  # (K, H, W, J)
            samples = samples.at[0].set(0.0)  # reference zeroes sample 0 (:502)
            return jnp.take_along_axis(samples, idx[None, :, :, None], axis=0)[0]

        return jax.vmap(one)(other_heatmaps, KRT, other_KRT, depth)
