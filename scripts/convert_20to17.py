"""Surgery on a 20-joint checkpoint's heatmap head -> 17 joints.

Equivalent of reference scripts/20to17.py: the MPII-union models train with a
20-joint final layer; H36M eval uses the 17 actual joints (indices
ACTUAL_IN_UNION).  This slices the final layer of a saved flax checkpoint.

Usage:
    python scripts/convert_20to17.py in.ckpt out.ckpt
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flax import serialization

from epipolar_transformers_tpu.data.datasets.joints_dataset import ACTUAL_IN_UNION


def _slice_final(tree):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k == "final_layer" and isinstance(v, dict):
                v = dict(v)
                if "kernel" in v and np.shape(v["kernel"])[-1] == 20:
                    v["kernel"] = np.asarray(v["kernel"])[..., ACTUAL_IN_UNION]
                if "bias" in v and np.shape(v["bias"])[-1] == 20:
                    v["bias"] = np.asarray(v["bias"])[ACTUAL_IN_UNION]
            else:
                v = _slice_final(v) if isinstance(v, dict) else v
            out[k] = v
        return out
    return tree


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    payload["state"] = _slice_final(payload["state"])
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
