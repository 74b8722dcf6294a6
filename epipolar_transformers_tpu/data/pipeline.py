"""Host input pipeline: batching, shuffling, background prefetch.

Replaces the reference's torch DataLoader (data/build.py:50-89; 15-20 worker
processes doing cv2 per item).  Synthetic/test datasets are cheap enough for
thread prefetch; heavy image pipelines plug a native decode shim in
runtime/ (see runtime/loader.py).  Per-host sharding for multi-process
training keys off (shard_id, num_shards), mirroring how a grain pipeline
would shard by jax.process_index().
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def collate(items) -> Dict[str, np.ndarray]:
    """Stack a list of per-sample dicts into batched arrays."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        out[k] = np.stack(vals)
    return out


class DataLoader:
    """Minimal deterministic loader: shuffle per epoch, fixed batch size,
    drop_last for static shapes (XLA requires them), optional thread
    prefetching."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_id :: self.num_shards]

    def _producer(self, q: queue.Queue):
        idx = self._indices()
        nb = len(self)
        for b in range(nb):
            batch_idx = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if self.drop_last and len(batch_idx) < self.batch_size:
                break
            q.put(collate([self.dataset[int(i)] for i in batch_idx]))
        q.put(None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            idx = self._indices()
            for b in range(len(self)):
                batch_idx = idx[b * self.batch_size : (b + 1) * self.batch_size]
                yield collate([self.dataset[int(i)] for i in batch_idx])
            self.epoch += 1
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._producer, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        t.join()
        self.epoch += 1


def build_dataset(cfg, name: str):
    """Dataset factory keyed by DatasetCatalog names (reference
    data/build.py:16-48)."""
    from ..config.catalog import DatasetCatalog

    entry = DatasetCatalog.get(name)
    factory = entry["factory"]
    if factory == "SyntheticMultiview":
        from .datasets.synthetic import SyntheticMultiview

        return SyntheticMultiview(cfg, is_train=entry["is_train"])
    if factory == "MultiViewH36M":
        from .datasets.multiview_h36m import MultiViewH36M

        return MultiViewH36M(cfg, entry["root"], entry["anno"], is_train=entry["is_train"])
    if factory == "H36MDataset":
        from .datasets.h36m import H36MDataset

        return H36MDataset(cfg, entry["root"], entry["anno"], is_train=entry["is_train"])
    if factory == "RHDDataset":
        from .datasets.rhd import RHDDataset

        return RHDDataset(cfg, entry["root"], entry["set"], is_train=entry["is_train"])
    if factory == "MPIIDataset":
        from .datasets.mpii import MPIIDataset

        return MPIIDataset(cfg, entry["root"], entry.get("set", "train"),
                           is_train=entry["is_train"])
    raise NotImplementedError(factory)


def make_data_loader(cfg, is_train: bool, shard_id: int = 0, num_shards: int = 1):
    """reference data/build.py:50-89: concat train datasets, one loader per
    test dataset."""
    names = cfg.DATASETS.TRAIN if is_train else cfg.DATASETS.TEST
    batch = cfg.SOLVER.IMS_PER_BATCH if is_train else cfg.TEST.IMS_PER_BATCH
    loaders = [
        DataLoader(
            build_dataset(cfg, n),
            batch_size=batch,
            shuffle=is_train,
            seed=cfg.SEED,
            drop_last=is_train,
            shard_id=shard_id,
            num_shards=num_shards,
        )
        for n in names
    ]
    if is_train:
        assert len(loaders) == 1, "concat of multiple train datasets: round 2"
        return loaders[0]
    return loaders
