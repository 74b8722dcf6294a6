"""REAL multi-process data parallelism: two OS processes, jax.distributed
over a localhost coordinator, 2 virtual CPU devices each (4-device global
mesh), running the actual engine.train() loop with per-process loader
shards.

This executes the --multihost code path (main.py -> jax.distributed, the
trainer's shard_id=jax.process_index() loader sharding, and
parallel.mesh.shard_batch's make_array_from_process_local_data global-batch
assembly) that single-process tests and the 8-device virtual mesh cannot
reach.  The decisive assertion: after 3 optimizer steps both processes hold
BIT-IDENTICAL parameters — the GSPMD gradient all-reduce spanned the
processes and kept the replicated state in sync.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
CHILD = os.path.join(os.path.dirname(__file__), "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_keeps_params_in_sync():
    port = _free_port()
    env = dict(os.environ)
    # the children pick their own device count (jax_num_cpu_devices=2);
    # scrub the parent suite's 8-device forcing and any platform override
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "force_host_platform_device_count" not in f
    )
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"

    sums, steps = {}, {}
    for out in outs:
        m = re.search(r"PROC (\d) PARAM_SUM_AFTER (\S+)", out)
        assert m, out[-4000:]
        sums[int(m.group(1))] = m.group(2)
        s = re.search(r"PROC (\d) STEP (\d+)", out)
        steps[int(s.group(1))] = int(s.group(2))

    assert steps == {0: 3, 1: 3}
    # bit-identical formatted to 10 significant decimals: the all-reduce
    # kept both processes' replicated params in lockstep
    assert sums[0] == sums[1], f"params diverged across processes: {sums}"
    assert float(sums[0]) > 0
