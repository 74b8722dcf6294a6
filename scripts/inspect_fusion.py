"""Inspect learned cross-view fusion weights from a checkpoint, headlessly.

Analog of the reference's `scripts/inspect_h36m_fusion.py`, which loads a
checkpoint's per-camera-pair fusion weights (`aggre_layer.aggre.%d.weight`
viewed as a (64, 64, 64, 64) pixel->pixel map), normalizes them by the
*global* min/max across all pairs (inspect_h36m_fusion.py:71-78), and shows
the source-view weight response for a clicked reference pixel per pair
(:36-48).

In this framework the learned per-pair weights are the epipolar prior table
(`Epipolar.prior_table`, models/epipolar.py — one (K, H, W) slice per ordered
camera pair, matching reference epipolar.py:73-80).  For each query pixel
this renders, per pair, the K-sample prior profile at that pixel (globally
normalized like the reference), and — when an introspection dump with
`sample_locs` is supplied — the profile splatted along the epipolar line into
the source view, the direct analog of the reference's response heatmap.

Usage:
    python scripts/inspect_fusion.py ckpt.ckpt out_dir \
        [--points 32,32] [--dump epipolar_introspection.pkl] [--item 0]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from flax import serialization  # noqa: E402


def find_prior_tables(tree, prefix=""):
    """All params named 'prior' in a restored checkpoint tree, with their
    tree paths (there is one per Epipolar module instance)."""
    found = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            if k == "prior" and hasattr(v, "ndim") and np.asarray(v).ndim == 4:
                found[path] = np.asarray(v)
            else:
                found.update(find_prior_tables(v, path))
    return found


def render_prior_panel(
    table: np.ndarray,
    x: int,
    y: int,
    out_path: str,
    sample_locs: np.ndarray | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
) -> dict:
    """One figure: per-pair prior profiles at feature pixel (x, y), plus the
    splatted source-view response when geometry is available.

    Args:
        table: (n_pairs, K, H, W) prior table.
        sample_locs: optional (K, H, W, 2) normalized locations (item 0 of an
            introspection dump) to splat the profile into the source plane.
        vmin/vmax: global normalization bounds (reference :71-78); default
            the table's own min/max.
    """
    n_pairs, K, H, W = table.shape
    vmin = float(table.min()) if vmin is None else vmin
    vmax = float(table.max()) if vmax is None else vmax
    scale = max(vmax - vmin, 1e-12)

    ncols = 2 if sample_locs is not None else 1
    fig, axs = plt.subplots(1, ncols, squeeze=False, figsize=(6 * ncols, 5))

    profiles = table[:, :, y, x]  # (n_pairs, K)
    for p in range(n_pairs):
        axs[0, 0].plot((profiles[p] - vmin) / scale, alpha=0.8, label=f"pair {p}")
    axs[0, 0].set_title(f"prior profiles @ ({x},{y})  {vmin:.4f}~{vmax:.4f}")
    axs[0, 0].set_xlabel("epipolar sample k")
    if n_pairs <= 12:
        axs[0, 0].legend(fontsize=6)

    summary = {"vmin": vmin, "vmax": vmax,
               "peak_pair": int(profiles.max(axis=1).argmax())}

    if sample_locs is not None:
        # splat the mean-over-pairs profile along the line into (H, W) —
        # the reference's per-pixel source-view response heatmap analog
        locs = np.asarray(sample_locs)[:, y, x]  # (K, 2) in (-1, 1)
        # prior K' can be SAMPLESIZE//2 under POOLING; subsample locs to match
        idx = np.linspace(0, locs.shape[0] - 1, K).round().astype(int)
        px = ((locs[idx, 0] + 1) / 2 * (W - 1)).round().astype(int)
        py = ((locs[idx, 1] + 1) / 2 * (H - 1)).round().astype(int)
        ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
        heat = np.zeros((H, W))
        mean_profile = (profiles.mean(axis=0) - vmin) / scale
        np.maximum.at(heat, (py[ok], px[ok]), mean_profile[ok])
        im = axs[0, 1].imshow(heat, cmap="hot")
        fig.colorbar(im, ax=axs[0, 1])
        axs[0, 1].set_title("source-view response (mean over pairs)")
        summary["response_peak"] = float(heat.max())

    fig.savefig(out_path)
    plt.close(fig)
    summary["path"] = out_path
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="flax msgpack checkpoint containing a prior table")
    ap.add_argument("out_dir")
    ap.add_argument("--points", nargs="*", default=None,
                    help="feature pixels as x,y (default: center)")
    ap.add_argument("--dump", default=None,
                    help="optional introspection pickle with sample_locs")
    ap.add_argument("--item", type=int, default=0)
    args = ap.parse_args(argv)

    with open(args.ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    tables = find_prior_tables(payload)
    if not tables:
        raise SystemExit("no 4-D 'prior' param found in checkpoint")

    sample_locs = None
    if args.dump:
        with open(args.dump, "rb") as f:
            d = pickle.load(f)
        sample_locs = np.asarray(d["sample_locs"])
        if sample_locs.ndim == 5:
            sample_locs = sample_locs[args.item]

    os.makedirs(args.out_dir, exist_ok=True)
    for path, table in tables.items():
        tag = path.replace("/", ".")
        _, _, H, W = table.shape
        if args.points:
            points = [tuple(int(v) for v in p.split(",")) for p in args.points]
        else:
            points = [(W // 2, H // 2)]
        # global normalization across every pair slice, like the reference
        vmin, vmax = float(table.min()), float(table.max())
        print(f"{path}: shape={table.shape} range {vmin:.6f}~{vmax:.6f}")
        for x, y in points:
            out = os.path.join(args.out_dir, f"{tag}_x{x:03d}_y{y:03d}.png")
            print(render_prior_panel(table, x, y, out, sample_locs=sample_locs,
                                     vmin=vmin, vmax=vmax))


if __name__ == "__main__":
    main()
