"""Params/FLOPs accounting CLI (reference scripts/compute_complexiy.py).

Prints trainable parameter counts and XLA post-fusion forward FLOPs for the
configured model.

Usage:
    python scripts/compute_complexity.py --cfg configs/epipolar/synthetic_zresidual.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--batch", type=int, default=1)
    args, rest = ap.parse_known_args()

    from epipolar_transformers_tpu.config import load_config
    from epipolar_transformers_tpu.utils.profiling import profile_model

    cfg = load_config(args.cfg, rest)
    prof = profile_model(cfg, batch_size=args.batch)
    print(f"params: {prof['params']:,}")
    print(f"forward flops (batch {args.batch}): {prof['flops']:,.0f}")
    print(f"bytes accessed: {prof['bytes_accessed']:,.0f}")


if __name__ == "__main__":
    main()
