"""Device mesh + sharding helpers.

The reference's entire parallelism story is single-process
`nn.DataParallel` + thread-based SyncBN (SURVEY §2.7).  Here data
parallelism is a 1-D `jax.sharding.Mesh` over all chips with the batch
sharded on the `data` axis; XLA's GSPMD partitioner inserts the gradient
all-reduce (and makes every batch reduction — including BatchNorm moments —
a *global* reduction over ICI, subsuming SyncBN).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in `batch` with its leading dim sharded over `axis`.

    Scalars / sub-batch-rank arrays are replicated.

    Single process: a plain device_put.  Multi-process (--multihost): each
    process holds only ITS loader shard (trainer passes
    shard_id=process_index), and device_put cannot target non-addressable
    devices — the global array is assembled from the per-process locals via
    jax.make_array_from_process_local_data (leading dim concatenates over
    processes in mesh order).  Multi-process batch leaves are per-process
    DATA, so they must shard: a local leading dim that does not divide over
    this process's devices raises rather than silently "replicating"
    per-process-different arrays (which JAX never cross-checks — each
    process would train on its own batch with no gradient sync).  Only 0-d
    scalars, identical everywhere by seed-determinism, replicate.

    CONTRACT (multi-process): batch pytrees passed here must contain ONLY
    batch-leading arrays and 0-d scalars.  Divisibility of the leading dim
    is the sharding key, so a genuinely replicated rank>=1 leaf (e.g.
    shared metadata whose leading dim happens to divide local_devices)
    would be silently concatenated across processes into a wrong global
    array.  The loaders uphold this (every rank>=1 leaf they emit is
    per-item data, collated batch-leading); if a future batch needs a
    replicated non-batch array, broadcast it to batch-leading per item or
    pass it OUTSIDE the batch (e.g. as a jit-static or separately
    device_put-replicated argument) instead of through shard_batch.
    """
    n = mesh.devices.size
    procs = jax.process_count()
    local_devices = max(n // procs, 1)

    def put(x):
        x = np.asarray(x)
        # shardable: the LOCAL leading dim splits evenly over this
        # process's devices (single process: local == global)
        shardable = x.ndim >= 1 and x.shape[0] % local_devices == 0 and x.shape[0] > 0
        if procs == 1:
            sharding = batch_sharding(mesh, axis) if shardable else replicated(mesh)
            return jax.device_put(x, sharding)
        if shardable:
            global_shape = (x.shape[0] * procs,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                batch_sharding(mesh, axis), x, global_shape
            )
        if x.ndim >= 1:
            raise ValueError(
                f"multi-process shard_batch: leaf shape {x.shape} has a local "
                f"leading dim not divisible by the {local_devices} local "
                f"device(s) of process {jax.process_index()}/{procs}. "
                "Per-process batch shards differ across processes, so falling "
                "back to replication would silently train each process on its "
                "own data. Make IMS_PER_BATCH divisible by "
                "(process_count * local_device_count)."
            )
        return jax.make_array_from_process_local_data(replicated(mesh), x, x.shape)

    return jax.tree_util.tree_map(put, batch)
