"""Multi-device CONVERGENCE run on the 8-virtual-device CPU mesh.

VERDICT r4 #8: the sharded path has 50-step equivalence proofs
(tests/test_syncbn_equivalence.py) and a one-step flagship dryrun
(__graft_entry__.dryrun_multichip); this runs a FULL training trajectory to
a real accuracy level over Mesh(('data',)) with 8 devices — global-batch
BN, pmean'd grads, per-device batch 2 — and records the eval in
VALIDATION.md.

The axon environment pins the TPU platform unless the process itself
switches to CPU before any backend use (see tests/conftest.py), hence this
wrapper instead of plain `python main.py`.

Usage:  python scripts/train_cpu_mesh.py [extra KEY VALUE overrides...]
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from main import main  # noqa: E402

if __name__ == "__main__":
    # main.py's `opts` is an argparse REMAINDER: every --flag must precede
    # the first KEY VALUE positional.  Split caller extras accordingly.
    extras = sys.argv[1:]
    flags, opts = [], []
    i = 0
    while i < len(extras):
        if extras[i].startswith("--"):
            flags.extend(extras[i : i + 2])
            i += 2
        else:
            opts = extras[i:]
            break
    argv = [
        "--cfg", "configs/epipolar/synthetic_hg.yaml",
        *flags,
        # the round-1 tiny-shape R-18 recipe (9.9mm on one TPU chip) on the
        # 8-device mesh; per-device batch 2
        "BACKBONE.BODY", "epipolarposeR-18",
        "KEYPOINT.NFEATS", "256",  # R-18 deconv head width (HG recipe uses 128)
        "OUTPUT_DIR", "outs/synthetic/mesh8",
        *opts,
    ]
    assert len(jax.devices()) == 8, jax.devices()
    main(argv)
