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
    """
    n = mesh.devices.size

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, batch_sharding(mesh, axis))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)
