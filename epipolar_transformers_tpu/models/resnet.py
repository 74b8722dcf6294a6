"""PoseResNet backbone (Flax, NHWC) with epipolar fusion merge points.

TPU-native rebuild of reference modeling/backbones/resnet.py:
  * ResNet-18/34/50/101/152 trunk (torchvision block layout: stride on the
    3x3 conv in Bottleneck) — resnet.py:41-187;
  * 3 deconv layers (256 ch, 4x4, stride 2) + BN + ReLU and a 1x1 heatmap
    head — resnet.py:264-297,337-362;
  * epipolar fusion injected 'early' (after layer1), 'late' (after deconv) or
    'both', merging as `fused + feat` — resnet.py:377-418;
  * soft-argmax peak decode per joint — resnet.py:424-429 (the reference's
    per-sample Python loop is a vmap here).

Layout: NHWC throughout; heatmaps are (N, H, W, J) internally and transposed
to (N, J, H, W) only at the decode/loss boundary helpers.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.soft_argmax import find_tensor_peak_batch
from .epipolar import Epipolar
from .layers import GuardedBatchNorm, compute_dtype

# block type ('basic'|'bottleneck') and per-stage block counts
RESNET_SPEC = {
    "18": ("basic", (2, 2, 2, 2)),
    "34": ("basic", (3, 4, 6, 3)),
    "50": ("bottleneck", (3, 4, 6, 3)),
    "101": ("bottleneck", (3, 4, 23, 3)),
    "152": ("bottleneck", (3, 8, 36, 3)),
}

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
_HEAD_INIT = nn.initializers.normal(stddev=0.001)


class BackboneOutput(NamedTuple):
    """Mirrors the reference PoseResNet.forward tuple (resnet.py:437)."""

    features: jnp.ndarray  # deconv output (N, H, W, 256)
    heatmaps: tuple  # tuple of (N, H, W, J) stages
    locs: Optional[jnp.ndarray]  # (N, J, 2) image-coord soft-argmax
    scores: Optional[jnp.ndarray]  # (N, J)
    corr_pos: Optional[jnp.ndarray]  # (N, H, W, 2)
    depth: Optional[jnp.ndarray]  # (N, K', H, W) attention weights/sim
    sample_locs: Optional[jnp.ndarray]  # (N, K, H, W, 2)
    warped_heatmap: Optional[jnp.ndarray] = None


def _norm(cfg: Config, name: str):
    momentum = cfg.BACKBONE.BN_MOMENTUM
    momentum = 0.1 if momentum < 0 else momentum
    # SYNC_BN note: under jit+GSPMD the batch axis is globally sharded, so
    # BN's batch reductions are already cross-replica (XLA inserts the
    # all-reduce) — the reference's vendored SyncBN machinery is implicit
    # here.  Explicit shard_map/pmap training must set BACKBONE.BN_AXIS_NAME
    # to the mapped batch axis; GuardedBatchNorm raises at trace time if
    # training unsynced under a named axis (tests/test_bn_guard.py).
    return GuardedBatchNorm(
        use_running_average=None,  # via flax 'train' kwarg at call sites
        momentum=1.0 - momentum,
        epsilon=1e-5,
        axis_name=cfg.BACKBONE.BN_AXIS_NAME or None,
        name=name,
    )


class StemConv(nn.Module):
    """The 7x7/s2/pad3 stem conv, lowered space-to-depth on even inputs.

    C_in=3 leaves the MXU contraction dim 3/128 full; re-laying the input as
    2x2 blocks ((B,H,W,3) -> (B,H/2,W/2,12)) and the kernel as an equivalent
    4x4/s1 conv (7x7 zero-padded to 8x8, taps split by output phase) is
    exact up to f32 reassociation and measured 1.43 -> 1.14 ms/iter at the
    bench shape INCLUDING the on-device input re-layout
    (scripts/bench_stem_s2d.py).  The stored parameter stays the canonical
    (7,7,Cin,64) kernel, so checkpoints and the torch weight importer
    (reference resnet.py:439-487) are unchanged.  Odd spatial sizes fall
    back to the direct 7x7 conv.
    """

    cfg: Config
    features: int = 64

    @nn.compact
    def __call__(self, x):
        dtype = compute_dtype(self.cfg)
        kernel = self.param(
            "kernel", _KAIMING, (7, 7, x.shape[-1], self.features),
            jnp.float32)
        k = kernel.astype(dtype)
        x = x.astype(dtype)
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # input re-layout: (B,H,W,C) -> (B,H/2,W/2,4C), (r,s,c) channel order
        x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x2 = jnp.transpose(x2, (0, 1, 3, 2, 4, 5)).reshape(
            B, H // 2, W // 2, 4 * C)
        # kernel re-layout: zero-pad 7->8 at the leading edge, split taps
        # (a,b) = (2p+r, 2q+s) into block position (p,q) x phase channel (r,s)
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kp = kp.reshape(4, 2, 4, 2, C, self.features)
        k2 = jnp.transpose(kp, (0, 2, 1, 3, 4, 5)).reshape(
            4, 4, 4 * C, self.features)
        return jax.lax.conv_general_dilated(
            x2, k2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    cfg: Config
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=compute_dtype(self.cfg), kernel_init=_KAIMING, name="conv1")(x)
        out = _norm(self.cfg, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=compute_dtype(self.cfg), kernel_init=_KAIMING, name="conv2")(out)
        out = _norm(self.cfg, "bn2")(out, use_running_average=not train)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=compute_dtype(self.cfg), kernel_init=_KAIMING,
                               name="downsample_conv")(x)
            identity = _norm(self.cfg, "downsample_bn")(identity, use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    cfg: Config
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=compute_dtype(self.cfg), kernel_init=_KAIMING, name="conv1")(x)
        out = _norm(self.cfg, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=compute_dtype(self.cfg), kernel_init=_KAIMING, name="conv2")(out)
        out = _norm(self.cfg, "bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=compute_dtype(self.cfg), kernel_init=_KAIMING, name="conv3")(out)
        out = _norm(self.cfg, "bn3")(out, use_running_average=not train)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=compute_dtype(self.cfg), kernel_init=_KAIMING, name="downsample_conv")(x)
            identity = _norm(self.cfg, "downsample_bn")(identity, use_running_average=not train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    cfg: Config
    block: str
    planes: int
    num_blocks: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        Block = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        needs_ds = self.stride != 1 or x.shape[-1] != self.planes * expansion
        x = Block(self.cfg, self.planes, self.stride, needs_ds, name="block0")(x, train)
        for i in range(1, self.num_blocks):
            x = Block(self.cfg, self.planes, name=f"block{i}")(x, train)
        return x


class ResNetTrunk(nn.Module):
    """conv1 .. layer4 shared by PoseResNet and the classifier ResNet."""

    cfg: Config
    block: str
    layers: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = True, return_stages: bool = False):
        c = self.cfg
        x = StemConv(c, name="conv1")(x)
        x = _norm(c, "bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x1 = ResNetStage(c, self.block, 64, self.layers[0], name="layer1")(x, train)
        x2 = ResNetStage(c, self.block, 128, self.layers[1], 2, name="layer2")(x1, train)
        x3 = ResNetStage(c, self.block, 256, self.layers[2], 2, name="layer3")(x2, train)
        x4 = ResNetStage(c, self.block, 512, self.layers[3], 2, name="layer4")(x3, train)
        if return_stages:
            return x1, x2, x3, x4
        return x4


class ResNet(nn.Module):
    """Classifier-style trunk with global average pool (reference
    resnet.py:117-187; used as the img_lifting feature extractor)."""

    cfg: Config
    depth: str = "50"

    @property
    def out_channels(self) -> int:
        block, _ = RESNET_SPEC[self.depth]
        return 512 * (4 if block == "bottleneck" else 1)

    @nn.compact
    def __call__(self, x, train: bool = True):
        block, layers = RESNET_SPEC[self.depth]
        x = ResNetTrunk(self.cfg, block, layers, name="trunk")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> (N, C)


class DeconvHead(nn.Module):
    """3x (ConvTranspose 4x4 /2 + BN + ReLU) — reference resnet.py:337-362."""

    cfg: Config
    num_layers: int = 3
    filters: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.num_layers):
            x = nn.ConvTranspose(self.filters, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 dtype=compute_dtype(self.cfg),
                                 kernel_init=_HEAD_INIT, name=f"deconv{i}")(x)
            x = _norm(self.cfg, f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class PoseResNet(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        depth = c.BACKBONE.BODY.split("-")[-1]
        block, layers = RESNET_SPEC[depth]
        self.trunk_conv1 = StemConv(c, name="conv1")
        self.trunk_bn1 = _norm(c, "bn1")
        self.layer1 = ResNetStage(c, block, 64, layers[0], name="layer1")
        self.layer2 = ResNetStage(c, block, 128, layers[1], 2, name="layer2")
        self.layer3 = ResNetStage(c, block, 256, layers[2], 2, name="layer3")
        self.layer4 = ResNetStage(c, block, 512, layers[3], 2, name="layer4")
        self.deconv = DeconvHead(c, name="deconv_layers")
        self.final_layer = nn.Conv(
            c.KEYPOINT.NUM_PTS, (1, 1), use_bias=True,
            dtype=compute_dtype(c),
            kernel_init=_HEAD_INIT, bias_init=nn.initializers.zeros,
            name="final_layer",
        )
        self.is_epipolar = "epipolarpose" in c.BACKBONE.BODY
        if self.is_epipolar:
            if c.EPIPOLAR.MERGE == "both":
                self.epipolar_sampler1 = Epipolar(c, name="epipolar_sampler1")
            self.epipolar_sampler = Epipolar(c, name="epipolar_sampler")

    def trunk_features(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """Trunk + deconv with no epipolar merge (the full shared prefix of
        the reference/other passes when MERGE='late').  The builder batches
        both views through this in ONE call at eval — valid because eval BN
        uses running statistics, so concatenating the batch is numerically
        identical to two passes (see ModelBuilder fused-trunk path)."""
        h = self.trunk_conv1(x)
        h = self.trunk_bn1(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = self.layer1(h, train)
        h = self.layer2(h, train)
        h = self.layer3(h, train)
        h = self.layer4(h, train)
        return self.deconv(h, train)

    def head_from_features(
        self,
        feature: jnp.ndarray,
        other_features: Optional[jnp.ndarray] = None,
        other_KRT: Optional[jnp.ndarray] = None,
        KRT: Optional[jnp.ndarray] = None,
        camera: Optional[jnp.ndarray] = None,
        other_camera: Optional[jnp.ndarray] = None,
        train: bool = True,
        decode_peaks: bool = True,
    ) -> BackboneOutput:
        """Late-merge fusion + heatmap head + decode on precomputed deconv
        features (the suffix of __call__ past the shared trunk)."""
        c = self.cfg
        corr_pos = depth = sample_locs = None
        if other_features is not None and self.is_epipolar and c.EPIPOLAR.MERGE == "late":
            fused, corr_pos, depth, sample_locs = self.epipolar_sampler(
                feature, other_features, KRT, other_KRT,
                camera=camera, other_camera=other_camera, train=train,
            )
            h = fused + feature  # reference resnet.py:388
        else:
            h = feature

        heatmap = self.final_layer(h)
        locs = scores = None
        if decode_peaks:
            hm_jhw = jnp.transpose(heatmap, (0, 3, 1, 2)).astype(jnp.float32)
            locs, scores = jax.vmap(
                lambda m: find_tensor_peak_batch(m, c.KEYPOINT.SIGMA, c.BACKBONE.DOWNSAMPLE)
            )(hm_jhw)
        return BackboneOutput(
            features=feature,
            heatmaps=(heatmap,),
            locs=locs,
            scores=scores,
            corr_pos=corr_pos,
            depth=depth,
            sample_locs=sample_locs,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        other_features: Optional[jnp.ndarray] = None,
        other_KRT: Optional[jnp.ndarray] = None,
        KRT: Optional[jnp.ndarray] = None,
        camera: Optional[jnp.ndarray] = None,
        other_camera: Optional[jnp.ndarray] = None,
        other_img: Optional[jnp.ndarray] = None,
        train: bool = True,
        decode_peaks: bool = True,
    ) -> BackboneOutput:
        """
        Args:
            x: (N, H, W, 3) reference-view images.
            other_features: (N, h, w, C) other-view features (already computed
                by the sibling backbone) or None for single-view mode.
            other_KRT / KRT: (N, 3, 4) projections for the epipolar geometry.
        """
        c = self.cfg
        corr_pos = depth = sample_locs = None

        h = self.trunk_conv1(x)
        h = self.trunk_bn1(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = self.layer1(h, train)

        def merge(feat, sampler):
            fused, cp, d, sl = sampler(
                feat, other_features, KRT, other_KRT,
                camera=camera, other_camera=other_camera, train=train,
            )
            return fused + feat, cp, d, sl  # reference resnet.py:388

        if other_features is not None and self.is_epipolar and c.EPIPOLAR.MERGE == "early":
            h, corr_pos, depth, sample_locs = merge(h, self.epipolar_sampler)
        elif other_features is not None and self.is_epipolar and c.EPIPOLAR.MERGE == "both":
            h, _, _, _ = merge(h, self.epipolar_sampler)

        h = self.layer2(h, train)
        h = self.layer3(h, train)
        h = self.layer4(h, train)

        feature = self.deconv(h, train)

        if other_features is not None and self.is_epipolar and c.EPIPOLAR.MERGE == "late":
            h, corr_pos, depth, sample_locs = merge(feature, self.epipolar_sampler)
        elif other_features is not None and self.is_epipolar and c.EPIPOLAR.MERGE == "both":
            h, corr_pos, depth, sample_locs = merge(feature, self.epipolar_sampler1)
        else:
            h = feature

        heatmap = self.final_layer(h)  # (N, H', W', J)

        locs = scores = None
        if decode_peaks:
            hm_jhw = jnp.transpose(heatmap, (0, 3, 1, 2)).astype(jnp.float32)
            locs, scores = jax.vmap(
                lambda m: find_tensor_peak_batch(m, c.KEYPOINT.SIGMA, c.BACKBONE.DOWNSAMPLE)
            )(hm_jhw)

        return BackboneOutput(
            features=feature,
            heatmaps=(heatmap,),
            locs=locs,
            scores=scores,
            corr_pos=corr_pos,
            depth=depth,
            sample_locs=sample_locs,
        )
