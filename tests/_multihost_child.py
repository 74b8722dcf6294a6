"""Child process for the real 2-process --multihost test (test_multihost.py).

Each process: 2 virtual CPU devices, jax.distributed over a localhost
coordinator, the REAL engine.train() for 3 steps on the tiny synthetic
multiview config — per-process loader shards (shard_id=process_index),
global-batch assembly via make_array_from_process_local_data, GSPMD
gradient/BN all-reduce over the 4-device global mesh.

Prints PARAM_SUM_BEFORE / PARAM_SUM_AFTER; the parent asserts both
processes agree bit-for-bit (collectives kept the replicated state in
sync) and that training moved the params.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    proc_id, port = int(sys.argv[1]), sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2 and jax.device_count() == 4

    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from epipolar_transformers_tpu.config import update_from_dict
    from epipolar_transformers_tpu.data.pipeline import make_data_loader
    from epipolar_transformers_tpu.engine.trainer import (
        create_train_state, materialize_model_inputs, train)
    from epipolar_transformers_tpu.parallel.mesh import make_mesh

    cfg = _flagship_cfg(tiny=True)
    cfg = update_from_dict(cfg, {
        "SOLVER": {"IMS_PER_BATCH": 4, "MAX_EPOCHS": 1},
        "LOG_FREQ": 1,
        "EVAL_FREQ": 1000,
        "OUTPUT_DIR": "",
    })

    def param_sum(tree):
        return float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree_util.tree_leaves(tree)))

    # Reproduce train()'s seed-deterministic init (same PRNGKey split, same
    # first-batch shapes) to capture the BEFORE sum the parent asserts
    # against — proving the 3 steps actually moved the params, not just
    # that both processes agree on untouched init values.
    mesh = make_mesh()
    loader = make_data_loader(cfg, is_train=True, shard_id=proc_id,
                              num_shards=2)
    init_rng, _ = jax.random.split(jax.random.PRNGKey(cfg.SEED))
    with mesh:
        sample = materialize_model_inputs(cfg, next(iter(loader)))
        state0 = create_train_state(cfg, init_rng, sample,
                                    max(len(loader), 1))
    print(f"PROC {proc_id} PARAM_SUM_BEFORE {param_sum(state0.params):.10e}",
          flush=True)
    del state0, loader

    state = train(cfg, max_steps=3, mesh=mesh)

    print(f"PROC {proc_id} PARAM_SUM_AFTER {param_sum(state.params):.10e}",
          flush=True)
    print(f"PROC {proc_id} STEP {int(np.asarray(state.step))}", flush=True)


if __name__ == "__main__":
    main()
