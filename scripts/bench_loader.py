"""DataLoader scaling benchmark: thread producer vs worker processes.

Simulates the real-H36M per-item cost the GIL-bound thread producer cannot
hide (reference data/build.py feeds GPUs with 20 worker processes;
joints_dataset.py does a cv2 JPEG decode + 1000^2 undistort + affine crop
per item): each __getitem__ decodes an in-memory 1000^2 JPEG, undistorts it
and warps the crop — pure C-library work that releases the GIL only
partially (numpy glue + python bookkeeping serialize on one thread).

Usage: python scripts/bench_loader.py [--items 64] [--workers 0 1 2 4]
Prints an items/sec table (the PERF.md "loader scaling" table).
NOTE: a >=4x win needs a multi-core host; this repo's dev host has 1 core
(nproc=1), where worker processes can only break even at best — run on the
TPU-pod host class (dozens of cores) for the real scaling.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epipolar_transformers_tpu.data.pipeline import DataLoader  # noqa: E402


class H36MLikeDataset:
    """Stand-in for JointsDataset's per-item host work at real-data shapes."""

    def __init__(self, n=64, size=1000, crop=256):
        import cv2

        self.n = n
        self.size = size
        self.crop = crop
        rng = np.random.RandomState(0)
        raw = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        ok, self.jpeg = cv2.imencode(".jpg", raw, [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        self.K = np.array([[1000.0, 0, size / 2], [0, 1000.0, size / 2], [0, 0, 1.0]])
        self.dist = np.array([-0.2, 0.05, 0.0, 0.0, 0.0])

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import cv2

        img = cv2.imdecode(self.jpeg, cv2.IMREAD_COLOR)
        und = cv2.undistort(img, self.K, self.dist)
        M = cv2.getRotationMatrix2D((self.size / 2, self.size / 2), 10.0, 0.5)
        crop = cv2.warpAffine(und, M, (self.crop, self.crop))
        return {"img": crop.astype(np.float32) / 255.0, "idx": np.int64(i)}


def bench(workers: int, items: int, batch: int = 8) -> float:
    ds = H36MLikeDataset(n=items)
    loader = DataLoader(ds, batch_size=batch, num_workers=workers)
    # warm one batch (worker spawn, jpeg tables)
    it = iter(loader)
    next(it)
    for _ in it:
        pass
    t0 = time.perf_counter()
    n = sum(b["img"].shape[0] for b in loader)
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=64)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 1, 2, 4])
    args = ap.parse_args()

    print(f"host cores: {os.cpu_count()}")
    base = None
    print(f"{'num_workers':>12} {'items/s':>10} {'speedup':>8}")
    for w in args.workers:
        rate = bench(w, args.items)
        if base is None:
            base = rate
        print(f"{w:>12} {rate:>10.1f} {rate / base:>7.2f}x")


if __name__ == "__main__":
    main()
