"""Generate golden-activation parity fixtures from the reference
implementation (run offline, once; outputs committed to tests/fixtures/).

Runs the ACTUAL reference code at /root/reference (read-only import — none of
it is copied into this repo) on small fixed inputs and records the outputs:

  * torch F.grid_sample bilinear outputs (align_corners True/False, zeros
    padding, out-of-range grids) — pins the sampling convention our
    ops/grid_sample.py must match (SURVEY hard parts: grid_sample semantics);
  * reference Epipolar.forward on fixed feats/KRTs for three configs
    (avg+dot correct-normalize, max+dot, legacy-normalize) — pins the full
    line-geometry + attention chain (reference modeling/layers/epipolar.py);
  * reference find_tensor_peak_batch soft-argmax decode
    (modeling/backbones/basic_batch.py:17-63);
  * reference PoseResNet-18 eval forward under a seeded state dict
    (modeling/backbones/resnet.py) — state dict + outputs, so the torch
    importer + our Flax PoseResNet can be verified end-to-end numerically.

The reference depends on yacs, which is not installed; a minimal attribute-
dict shim is injected (the reference only builds/reads the config tree at
import time, which the shim covers).

Usage:  python scripts/make_golden_fixtures.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE = "/root/reference"
# usage: make_golden_fixtures.py [out_dir] [--only NAME]
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
ONLY = None
if "--only" in sys.argv:
    ONLY = sys.argv[sys.argv.index("--only") + 1]
    _pos = [a for a in _pos if a != ONLY]
OUT_DIR = _pos[0] if _pos else os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures")


# --------------------------------------------------------------- yacs shim
class _CfgNode(dict):
    """Minimal yacs.config.CfgNode stand-in: nested attribute dict."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def freeze(self):
        pass

    def merge_from_file(self, *a, **k):
        raise NotImplementedError

    def merge_from_list(self, *a, **k):
        raise NotImplementedError


def install_reference():
    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = _CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)
    # torchvision is only touched at call time by reference
    # data/transforms/build.py; a bare module satisfies the import chain
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.functional = types.ModuleType(
        "torchvision.transforms.functional")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.modules.setdefault("torchvision.transforms.functional",
                           tv.transforms.functional)
    # the reference targets an old Pillow (PILLOW_VERSION was removed)
    import PIL

    if not hasattr(PIL, "PILLOW_VERSION"):
        PIL.PILLOW_VERSION = PIL.__version__
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from core import cfg  # noqa: F401  (builds the config tree via the shim)

    return cfg


# ------------------------------------------------------- deterministic init
def det_tensor(key: str, shape) -> np.ndarray:
    """Deterministic pseudo-random tensor derived from the state-dict key.

    Both the fixture generator (filling the reference torch model) and the
    parity test (rebuilding the identical state dict without the reference)
    call this, so the 11M-param ResNet-18 state dict never needs committing —
    only its key/shape manifest does.
    """
    import zlib

    rng = np.random.RandomState(zlib.crc32(key.encode()) & 0x7FFFFFFF)
    shape = tuple(int(s) for s in shape)
    if key.endswith("num_batches_tracked"):
        return np.asarray(1, dtype=np.int64)
    if key.endswith("running_var"):
        return (rng.rand(*shape) * 0.5 + 0.75).astype(np.float32)
    if key.endswith("running_mean"):
        return (rng.randn(*shape) * 0.05).astype(np.float32)
    if len(shape) == 1 and key.endswith("weight"):  # BN scale
        return (rng.rand(*shape) * 0.5 + 0.75).astype(np.float32)
    if key.endswith("bias"):
        return (rng.randn(*shape) * 0.1).astype(np.float32)
    return (rng.randn(*shape) * 0.05).astype(np.float32)


# ------------------------------------------------------------- geometry rig
def camera_pair(image_size=64):
    """Two pinhole cameras on a ring looking at the origin-ish scene —
    plain numpy, analytically constructed (no repo/reference code)."""

    def look_at(eye):
        eye = np.asarray(eye, np.float64)
        z = -eye / np.linalg.norm(eye)          # toward origin
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])                  # world->cam rows
        t = -R @ eye
        return R, t

    f = image_size * 1.2
    c = image_size / 2.0
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]])
    Ps = []
    for ang in (0.0, 0.45):
        eye = np.array([np.sin(ang) * 900.0, 120.0, -np.cos(ang) * 900.0])
        R, t = look_at(eye)
        Ps.append(K @ np.concatenate([R, t[:, None]], axis=1))
    return np.stack(Ps)  # (2, 3, 4)


# ------------------------------------------------------------ fixture parts
def gen_grid_sample(torch, F, rng):
    x = rng.randn(2, 3, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOR
    out = {}
    for ac in (True, False):
        y = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                          mode="bilinear", padding_mode="zeros",
                          align_corners=ac)
        out[f"out_ac{int(ac)}"] = y.numpy()
    return {"x": x, "grid": grid, **out}


def gen_epipolar(cfg, torch, rng):
    from modeling.layers.epipolar import Epipolar

    N, C, H, W = 2, 8, 16, 16
    cfg.BACKBONE.DOWNSAMPLE = 4
    # defaults are 2./4. (full H36M pipeline); the fixture cameras project
    # straight into the 64px crop, so the resize chain is identity
    cfg.DATASETS.IMAGE_RESIZE = 1.0
    cfg.DATASETS.PREDICT_RESIZE = 1.0
    cfg.KEYPOINT.HEATMAP_SIZE = (H, W)
    cfg.EPIPOLAR.SAMPLESIZE = 16
    cfg.EPIPOLAR.PARAMETERIZED = ()
    cfg.EPIPOLAR.POOLING = False
    cfg.EPIPOLAR.SOFTMAX_ENABLED = True
    cfg.EPIPOLAR.SOFTMAXSCALE = 1.0 / np.sqrt(cfg.EPIPOLAR.SAMPLESIZE)
    cfg.EPIPOLAR.SIMILARITY = "dot"
    cfg.EPIPOLAR.REPROJECT_LOSS_WEIGHT = 0
    cfg.EPIPOLAR.PRIOR = False
    cfg.EPIPOLAR.PRIORMUL = False
    cfg.EPIPOLAR.OTHER_GRAD = ("other1", "other2")
    cfg.EPIPOLAR.BOTTLENECK = 1
    cfg.EPIPOLAR.ZRESIDUAL = False
    cfg.VIS.EPIPOLAR_LINE = False
    cfg.EPIPOLAR.WARPEDHEATMAP = False

    # smooth band-limited features: the two implementations' line geometry
    # agrees to ~0.05 feature px (f32 pinv/epipole rounding differences);
    # white-noise features would turn that into O(1) sample-value noise and
    # drown the convention signal the golden is meant to pin
    def smooth_feats(n, c):
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        out = np.zeros((n, c, H, W), np.float64)
        for i in range(n):
            for j in range(c):
                for _ in range(3):
                    fy, fx = rng.uniform(-2, 2, 2)
                    ph = rng.uniform(0, 2 * np.pi)
                    out[i, j] += rng.randn() * np.sin(
                        2 * np.pi * (fx * xs + fy * ys) / H + ph)
        return out.astype(np.float32)

    feat1 = smooth_feats(N, C)
    feat2 = smooth_feats(N, C)
    Ps = camera_pair(image_size=H * cfg.BACKBONE.DOWNSAMPLE)
    P1 = np.broadcast_to(Ps[0], (N, 3, 4)).astype(np.float32).copy()
    P2 = np.broadcast_to(Ps[1], (N, 3, 4)).astype(np.float32).copy()

    fixtures = {"feat1": feat1, "feat2": feat2, "P1": P1, "P2": P2,
                "samplesize": np.int64(cfg.EPIPOLAR.SAMPLESIZE),
                "downsample": np.int64(cfg.BACKBONE.DOWNSAMPLE)}
    # The reference never passes align_corners; on its era torch (<=1.3) that
    # meant align_corners=True semantics, on modern torch it means False.
    # Pin BOTH: '<case>' (ac=True, the as-published behavior our framework
    # targets) and '<case>_acF' (modern-torch rerun).
    import torch.nn.functional as F

    orig_grid_sample = F.grid_sample

    def run_cases(suffix):
        cases = [
            ("avg_dot_correct", dict(ATTENTION="avg", USE_CORRECT_NORMALIZE=True)),
            ("max_dot_correct", dict(ATTENTION="max", USE_CORRECT_NORMALIZE=True)),
            ("avg_dot_legacy", dict(ATTENTION="avg", USE_CORRECT_NORMALIZE=False)),
        ]
        for tag, opts in cases:
            for k, v in opts.items():
                cfg.EPIPOLAR[k] = v
            torch.manual_seed(0)
            layer = Epipolar(debug=True)  # debug=True returns sample_locs
            layer.eval()
            with torch.no_grad():
                # debug returns (out, corr_pos, depth, sample_locs,
                # intersections, mask, valid_intersections, start, vec)
                # (reference epipolar.py:264-265)
                out, corr_pos, depth, sample_locs, *_ = layer(
                    torch.from_numpy(feat1), torch.from_numpy(feat2),
                    torch.from_numpy(P1), torch.from_numpy(P2))
            fixtures[f"{tag}{suffix}__out"] = out.numpy()
            fixtures[f"{tag}{suffix}__corr_pos"] = corr_pos.numpy()
            fixtures[f"{tag}{suffix}__depth"] = depth.numpy()
            if sample_locs is not None:
                fixtures[f"{tag}{suffix}__sample_locs"] = sample_locs.numpy()

    def gs_ac_true(input, grid, mode="bilinear", padding_mode="zeros",
                   align_corners=None):
        return orig_grid_sample(input, grid, mode=mode,
                                padding_mode=padding_mode, align_corners=True)

    F.grid_sample = gs_ac_true
    try:
        run_cases("")
    finally:
        F.grid_sample = orig_grid_sample
    run_cases("_acF")
    return fixtures


def gen_epipolar_grad(cfg, torch, rng):
    """Backward goldens for Epipolar.forward (reference epipolar.py:82-269):
    d(sum(out*w))/dfeat1 and /dfeat2 under a fixed cotangent w, pinned at the
    as-published align_corners=True grid_sample.  Inputs are the SAME
    feat/KRT tensors as epipolar_golden.npz (loaded from it), so forward and
    backward parity share one provenance.  Covers the OTHER_GRAD detach
    semantics (epipolar.py:141-153): with OTHER_GRAD=() the sampled view is
    detached and dfeat2 must be exactly zero."""
    from modeling.layers.epipolar import Epipolar
    import torch.nn.functional as F

    g = np.load(os.path.join(OUT_DIR, "epipolar_golden.npz"))
    feat1, feat2 = g["feat1"], g["feat2"]
    P1, P2 = g["P1"], g["P2"]
    N, C, H, W = feat1.shape

    cfg.BACKBONE.DOWNSAMPLE = int(g["downsample"])
    cfg.DATASETS.IMAGE_RESIZE = 1.0
    cfg.DATASETS.PREDICT_RESIZE = 1.0
    cfg.KEYPOINT.HEATMAP_SIZE = (H, W)
    cfg.EPIPOLAR.SAMPLESIZE = int(g["samplesize"])
    cfg.EPIPOLAR.PARAMETERIZED = ()
    cfg.EPIPOLAR.POOLING = False
    cfg.EPIPOLAR.SOFTMAX_ENABLED = True
    cfg.EPIPOLAR.SOFTMAXSCALE = 1.0 / np.sqrt(cfg.EPIPOLAR.SAMPLESIZE)
    cfg.EPIPOLAR.SIMILARITY = "dot"
    cfg.EPIPOLAR.REPROJECT_LOSS_WEIGHT = 0
    cfg.EPIPOLAR.PRIOR = False
    cfg.EPIPOLAR.PRIORMUL = False
    cfg.EPIPOLAR.BOTTLENECK = 1
    cfg.EPIPOLAR.ZRESIDUAL = False
    cfg.VIS.EPIPOLAR_LINE = False
    cfg.EPIPOLAR.WARPEDHEATMAP = False
    cfg.EPIPOLAR.USE_CORRECT_NORMALIZE = True

    w = np.random.RandomState(123).randn(N, C, H, W).astype(np.float32)
    fixtures = {"w": w}

    cases = [
        ("avg_dot_correct", "avg", ("other1", "other2")),
        ("max_dot_correct", "max", ("other1", "other2")),
        ("avg_dot_detached", "avg", ()),
    ]
    orig_grid_sample = F.grid_sample

    def gs_ac_true(input, grid, mode="bilinear", padding_mode="zeros",
                   align_corners=None):
        return orig_grid_sample(input, grid, mode=mode,
                                padding_mode=padding_mode, align_corners=True)

    F.grid_sample = gs_ac_true
    try:
        for tag, attention, other_grad in cases:
            cfg.EPIPOLAR.ATTENTION = attention
            cfg.EPIPOLAR.OTHER_GRAD = other_grad
            torch.manual_seed(0)
            layer = Epipolar()
            layer.eval()
            f1 = torch.from_numpy(feat1).requires_grad_(True)
            f2 = torch.from_numpy(feat2).requires_grad_(True)
            out, _, _, _ = layer(f1, f2, torch.from_numpy(P1),
                                 torch.from_numpy(P2))
            loss = (out * torch.from_numpy(w)).sum()
            g1, g2 = torch.autograd.grad(loss, [f1, f2], allow_unused=True)
            fixtures[f"{tag}__out"] = out.detach().numpy()
            # None cotangent = provably-zero gradient: feat2 when detached
            # (OTHER_GRAD=()), feat1 under 'max' (hard argmax-gather severs
            # the differentiable path through the similarity)
            fixtures[f"{tag}__dfeat1"] = (
                g1.numpy() if g1 is not None else np.zeros_like(feat1))
            fixtures[f"{tag}__dfeat2"] = (
                g2.numpy() if g2 is not None else np.zeros_like(feat2))
    finally:
        F.grid_sample = orig_grid_sample
    return fixtures


def _force_align_corners_true(torch):
    """Context manager: restore the era (torch<=1.3) behaviors the reference
    was written against — align_corners=True defaults (modern torch defaults
    False) and floor semantics for int-tensor `/` (basic_batch.py:27
    `index / W`; true division since torch 1.5 silently turns the peak row
    index fractional)."""
    import contextlib

    import torch.nn.functional as F

    @contextlib.contextmanager
    def ctx():
        gs, ag = F.grid_sample, F.affine_grid
        truediv = torch.Tensor.__truediv__

        def gs_t(input, grid, mode="bilinear", padding_mode="zeros",
                 align_corners=None):
            return gs(input, grid, mode=mode, padding_mode=padding_mode,
                      align_corners=True)

        def ag_t(theta, size, align_corners=None):
            return ag(theta, size, align_corners=True)

        def div_era(self, other):
            if (not torch.is_floating_point(self)
                    and not torch.is_complex(self)
                    and isinstance(other, int)):
                return torch.div(self, other, rounding_mode="floor")
            return truediv(self, other)

        F.grid_sample, F.affine_grid = gs_t, ag_t
        torch.Tensor.__truediv__ = div_era
        try:
            yield
        finally:
            F.grid_sample, F.affine_grid = gs, ag
            torch.Tensor.__truediv__ = truediv

    return ctx()


def gen_peak_decode(cfg, torch, rng):
    from modeling.backbones.basic_batch import find_tensor_peak_batch

    heat = (rng.rand(5, 16, 16).astype(np.float32) * 2.0) - 0.5
    # sharpen a clear peak per joint
    for j in range(5):
        y, x = rng.randint(3, 13), rng.randint(3, 13)
        heat[j, y, x] = 3.0 + j * 0.1
    sigma, downsample = 2.0, 4
    out = {"heatmap": heat, "sigma": np.float64(sigma),
           "downsample": np.int64(downsample)}
    with torch.no_grad():
        with _force_align_corners_true(torch):
            locs, scos = find_tensor_peak_batch(
                torch.from_numpy(heat), sigma, downsample)
        out["locs"], out["scos"] = locs.numpy(), scos.numpy()
        locs_f, scos_f = find_tensor_peak_batch(
            torch.from_numpy(heat), sigma, downsample)
        out["locs_acF"], out["scos_acF"] = locs_f.numpy(), scos_f.numpy()
    return out


def gen_poseresnet18(cfg, torch, rng):
    import tempfile

    # reference modules log into cfg.FOLDER_NAME at import/call time
    cfg.FOLDER_NAME = tempfile.mkdtemp()
    from modeling.backbones.resnet import get_pose_net

    cfg.BACKBONE.BODY = "poseR-18"
    cfg.BACKBONE.PRETRAINED = False
    cfg.BACKBONE.DOWNSAMPLE = 4
    cfg.KEYPOINT.NUM_PTS = 5
    cfg.KEYPOINT.SIGMA = 2.0
    cfg.DATASETS.IMAGE_SIZE = (64, 64)
    cfg.KEYPOINT.HEATMAP_SIZE = (16, 16)
    # 'late' with no other_features degrades to the plain single-view path;
    # any other value trips an UnboundLocalError in the reference forward
    cfg.EPIPOLAR.MERGE = "late"

    torch.manual_seed(7)
    model = get_pose_net(cfg)
    model.eval()
    # deterministic-by-key weights (incl. BN running stats) so the parity
    # test can rebuild the identical state dict from the key manifest alone
    with torch.no_grad():
        new_sd = {k: torch.from_numpy(det_tensor(k, v.shape))
                  for k, v in model.state_dict().items()}
        model.load_state_dict(new_sd)

    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad(), _force_align_corners_true(torch):
        # forward returns (feature, heatmaps, batch_locs, batch_scos,
        # corr_poss, depths, sample_locs, None) — reference resnet.py:437;
        # the peak decode inside uses affine_grid/grid_sample, pinned to the
        # era align_corners=True behavior
        _, heatmaps, batch_locs, batch_scos, *_ = model(torch.from_numpy(x))
    keys = sorted(model.state_dict().keys())
    shapes = ["x".join(str(int(d)) for d in model.state_dict()[k].shape)
              for k in keys]
    return {
        "x": x,
        "heatmap": heatmaps[-1].numpy(),
        "batch_locs": batch_locs.numpy(),
        "batch_scos": batch_scos.numpy(),
        "sd_keys": np.array(keys),
        "sd_shapes": np.array(shapes),
    }


def main(only=None):
    os.makedirs(OUT_DIR, exist_ok=True)
    cfg = install_reference()
    import torch
    import torch.nn.functional as F

    # The shared rng advances across generators in this fixed order, so an
    # `--only` rerun of any rng-shared generator would produce fixtures from
    # a DIFFERENT stream than the canonical full run (silently changing
    # golden provenance and desynchronizing from already-committed siblings).
    # Refuse it; only self-seeded generators may regenerate alone.
    SELF_SEEDED = {"epipolar_grad"}
    if only is not None and only not in SELF_SEEDED:
        raise SystemExit(
            f"--only {only}: this generator shares the sequential "
            "RandomState(42) stream; regenerate ALL fixtures (no --only) "
            "so inputs match the canonical full-run stream"
        )
    rng = np.random.RandomState(42)
    if only in (None, "grid_sample"):
        np.savez_compressed(os.path.join(OUT_DIR, "grid_sample_golden.npz"),
                            **gen_grid_sample(torch, F, rng))
        print("grid_sample_golden.npz written")
    if only in (None, "peak_decode"):
        np.savez_compressed(os.path.join(OUT_DIR, "peak_decode_golden.npz"),
                            **gen_peak_decode(cfg, torch, rng))
        print("peak_decode_golden.npz written")
    if only in (None, "epipolar"):
        np.savez_compressed(os.path.join(OUT_DIR, "epipolar_golden.npz"),
                            **gen_epipolar(cfg, torch, rng))
        print("epipolar_golden.npz written")
    if only in (None, "poseresnet18"):
        np.savez_compressed(os.path.join(OUT_DIR, "poseresnet18_golden.npz"),
                            **gen_poseresnet18(cfg, torch, rng))
        print("poseresnet18_golden.npz written")
    if only in (None, "epipolar_grad"):
        np.savez_compressed(os.path.join(OUT_DIR, "epipolar_grad_golden.npz"),
                            **gen_epipolar_grad(cfg, torch, rng))
        print("epipolar_grad_golden.npz written")


if __name__ == "__main__":
    main(ONLY)
