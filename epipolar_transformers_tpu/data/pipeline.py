"""Host input pipeline: batching, shuffling, background prefetch.

Replaces the reference's torch DataLoader (data/build.py:50-89; 15-20 worker
processes doing cv2 per item).  Synthetic/test datasets are cheap enough for
thread prefetch; heavy image pipelines plug a native decode shim in
runtime/ (see runtime/loader.py).  Per-host sharding for multi-process
training keys off (shard_id, num_shards), mirroring how a grain pipeline
would shard by jax.process_index().
"""

from __future__ import annotations

import ctypes
import multiprocessing as mp
import os
import pickle
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def _tune_allocator() -> None:
    """Keep big numpy buffers in the heap arena instead of per-allocation
    mmap/munmap.

    glibc malloc services every allocation over M_MMAP_THRESHOLD (128 KB)
    with a fresh mmap and munmaps it on free — so each image/heatmap buffer
    the pipeline produces pays page faults + zeroing + TLB shootdowns, which
    on a loaded single-core host measurably dominates the render itself.
    Raising the threshold (and the trim threshold, so the arena isn't
    returned to the kernel between batches) lets freed item buffers be
    recycled by the allocator at full speed.  No-op on non-glibc."""
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 64 * 1024 * 1024)
        libc.mallopt(M_TRIM_THRESHOLD, 256 * 1024 * 1024)
    except OSError:
        pass


_allocator_tuned = False


def collate(items, out: Optional[Dict[str, np.ndarray]] = None) -> Dict[str, np.ndarray]:
    """Stack a list of per-sample dicts into batched arrays.

    With `out` (a previously returned batch dict of matching shapes/dtypes),
    the stack writes into the existing buffers instead of allocating —
    the ring-reuse path of DataLoader(reuse_buffers=True).  Assignment
    (not np.copyto) so 0-d item fields — 'camera', 'action' scalars —
    write through the (B,)-row view too."""
    if out is not None:
        try:
            for k in items[0]:
                dst = out[k]
                for j, it in enumerate(items):
                    dst[j] = it[k]
            return out
        except (KeyError, ValueError, TypeError, IndexError):
            pass  # shape/dtype/key drift: fall through to fresh allocation
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class _ProducerError:
    """Carrier for an exception raised inside the producer thread; the
    consumer re-raises it instead of hanging forever on q.get()."""

    def __init__(self, exc: BaseException):
        self.exc = exc


# Worker-death poll cadence for _mp_iter's result wait: long enough that a
# healthy-but-slow pipeline rarely wakes, short enough that a killed worker
# is noticed promptly.  Module-level so tests can shrink it.
_MP_POLL_TIMEOUT = 5.0


def _resolve_start_method(method: str) -> str:
    """Resolve the 'auto' worker start method.

    fork from a multi-threaded parent can deadlock the child on a lock some
    other parent thread held at fork time — and a JAX parent is ALWAYS
    multi-threaded once a backend is initialized (CPython 3.12 emits a
    DeprecationWarning for exactly this at os.fork).  forkserver children
    are forked from a clean single-threaded server process, at the cost of
    pickling the dataset once per worker.  'auto' therefore picks
    forkserver whenever the calling process is multi-threaded and keeps
    fork (free dataset inheritance) for single-threaded parents; explicit
    values pass through untouched.

    Thread detection counts OS threads (/proc/self/task on Linux), not
    threading.active_count(): JAX/XLA/grpc spawn C-level threads the
    threading module never sees, and those are precisely the ones whose
    locks a forked child inherits."""
    if method != "auto":
        return method
    try:
        n_threads = len(os.listdir("/proc/self/task"))
    except OSError:  # non-Linux: best effort via the threading registry
        n_threads = threading.active_count()
    return "forkserver" if n_threads > 1 else "fork"


def _worker_loop(dataset, task_q, result_q):
    """Worker-process body: pull (seq, idx) tasks, push (seq, items, err).

    Errors are shipped as pickled-exception bytes (never as live objects —
    an unpicklable exception would kill mp.Queue's feeder thread silently
    and hang the consumer); the consumer re-raises the original when it
    unpickles, else a RuntimeError carrying the repr."""
    while True:
        task = task_q.get()
        if task is None:
            return
        seq, idx = task
        try:
            items = [dataset[int(i)] for i in idx]
            result_q.put((seq, items, None))
        except BaseException as exc:  # noqa: BLE001 — relayed to the consumer
            try:
                payload = pickle.dumps(exc)
                pickle.loads(payload)  # round-trip check before shipping
            except Exception:
                payload = pickle.dumps(
                    RuntimeError(f"DataLoader worker item failed: {exc!r}")
                )
            result_q.put((seq, None, payload))
            return


class ConcatDataset:
    """Concatenation of datasets for multi-dataset training (reference
    data/build.py:59-63 uses torch's ConcatDataset)."""

    def __init__(self, datasets):
        assert datasets, "ConcatDataset needs at least one dataset"
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets])
        # worker-process eligibility must survive wrapping: a concat of
        # io-bound datasets is io-bound (else DATALOADER.NUM_WORKERS would
        # silently no-op on exactly the heavy multi-dataset train configs)
        self.io_bound = any(getattr(d, "io_bound", False) for d in self.datasets)

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += len(self)
        ds = int(np.searchsorted(self.cum, idx, side="right"))
        prev = 0 if ds == 0 else int(self.cum[ds - 1])
        return self.datasets[ds][idx - prev]


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
        num_iterations: Optional[int] = None,
        reuse_buffers: bool = False,
        ring_depth: Optional[int] = None,
        num_workers: int = 0,
        mp_start_method: str = "auto",
    ):
        global _allocator_tuned
        if not _allocator_tuned:
            _tune_allocator()
            _allocator_tuned = True
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.num_iterations = num_iterations
        # Ring of reusable batch buffers: batch n and batch n + ring_depth
        # ALIAS the same memory.  The safety contract is LIFETIME, not just
        # "currently held": the trainer's jax.device_put reads the host
        # buffer ASYNCHRONOUSLY, so a slot must not be overwritten until
        # that transfer completed.  Production runs at most
        # (prefetch + consumer lookahead) batches ahead of consumption, and
        # the trainer materializes step metrics every LOG_FREQ steps — a
        # hard sync proving all earlier transfers done — so
        # make_data_loader sizes the ring prefetch + LOG_FREQ + margin.
        # NOT safe for consumers that accumulate batch references across
        # iterations — those must keep the default.
        self.reuse_buffers = reuse_buffers
        depth = (prefetch + 3) if ring_depth is None else ring_depth
        self._ring = [None] * depth if reuse_buffers else None
        # num_workers > 0: torch-DataLoader-style worker PROCESSES produce
        # items (reference data/build.py:79-84 consumes
        # DATALOADER.NUM_WORKERS); collate stays consumer-side so the
        # ring-buffer reuse contract is unchanged.  The GIL-bound thread
        # producer starves the chip on real-image pipelines (cv2 JPEG decode
        # + 1000^2 undistort per item); processes are the only way to scale
        # that on a many-core host.
        self.num_workers = num_workers
        # 'auto' (default): 'forkserver' when the parent is multi-threaded
        # (a JAX parent always is — forked children can inherit held locks
        # and deadlock; CPython 3.12 warns on exactly this), else 'fork'.
        # Explicit 'fork' (torch semantics: dataset inherited for free,
        # opt-in) / 'forkserver' / 'spawn' pass through.  'forkserver' and
        # 'spawn' require a picklable dataset.  See config.schema DATALOADER.
        self.mp_start_method = mp_start_method
        self.epoch = 0

    def __len__(self):
        if self.num_iterations is not None:
            return self.num_iterations
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

    def _batch_indices(self) -> Iterator[np.ndarray]:
        """Yield per-batch index arrays.

        Epoch mode: one pass over the (sharded, shuffled) dataset.  Iteration
        mode (num_iterations set): an epoch-free IterationBasedBatchSampler
        stream sliced to this shard (reference data/samplers/
        iteration_based_batch_sampler.py:4-30, scaffolding there; live here).
        """
        if self.num_iterations is not None:
            from .samplers import IterationBasedBatchSampler

            sampler = IterationBasedBatchSampler(
                dataset_size=len(self.dataset),
                batch_size=self.batch_size * self.num_shards,
                num_iterations=self.num_iterations,
                shuffle=self.shuffle,
                seed=self.seed,
            )
            for batch in sampler:
                yield np.asarray(batch[self.shard_id :: self.num_shards])
            return
        idx = self._indices()
        for b in range(len(self)):
            batch_idx = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if self.drop_last and len(batch_idx) < self.batch_size:
                return
            yield batch_idx

    def _producer(self, q: queue.Queue, stop: threading.Event):
        """Fill `q`; bail out promptly once `stop` is set.  A producer that
        blocks indefinitely in q.put outlives early-exiting consumers
        (max_steps smoke runs, capped eval) and a thread still parked in a
        lock at interpreter shutdown is a fatal abort on CPython 3.12 —
        so every put polls the stop flag."""
        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        try:
            for n, batch_idx in enumerate(self._batch_indices()):
                items = [self.dataset[int(i)] for i in batch_idx]
                if not put(self._collate_seq(n, items)):
                    return
        except BaseException as exc:  # noqa: BLE001 — relayed, not swallowed
            # a dataset/sampler error must surface in the CONSUMER, not die
            # with the daemon thread (which would hang q.get() forever)
            put(_ProducerError(exc))
            return
        put(None)

    def _collate_seq(self, seq: int, items) -> Dict[str, np.ndarray]:
        """Collate with optional ring-slot reuse (slot keyed by sequence)."""
        if self._ring is not None:
            slot = seq % len(self._ring)
            self._ring[slot] = collate(items, out=self._ring[slot])
            return self._ring[slot]
        return collate(items)

    def _mp_iter(self) -> Iterator[Dict[str, np.ndarray]]:
        """Process-pool item production (num_workers > 0).

        Any idle worker takes the next (seq, idx) task off one shared queue;
        the consumer reorders results by seq, so the yielded batch stream is
        IDENTICAL to the single-producer path (same indices, same order) —
        only the item computation is parallel.  Start method per
        self.mp_start_method ('auto' resolves via _resolve_start_method —
        forkserver under a multi-threaded parent, fork otherwise).
        """
        ctx = mp.get_context(_resolve_start_method(self.mp_start_method))
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        workers = [
            ctx.Process(
                target=_worker_loop, args=(self.dataset, task_q, result_q),
                daemon=True, name=f"loader-worker-{w}",
            )
            for w in range(self.num_workers)
        ]
        for p in workers:
            p.start()

        batch_iter = enumerate(self._batch_indices())
        state = {"dispatched": 0, "exhausted": False, "death_epoch": 0}
        outstanding = {}  # seq -> idx array: dispatched, not yet received
        dispatch_epoch = {}  # seq -> death_epoch at (re)dispatch time
        redispatch_count = {}  # seq -> re-dispatches so far (cap: 1)

        def dispatch_one() -> None:
            if state["exhausted"]:
                return
            try:
                seq, idx = next(batch_iter)
            except StopIteration:
                state["exhausted"] = True
                return
            idx = np.asarray(idx)
            outstanding[seq] = idx
            dispatch_epoch[seq] = state["death_epoch"]
            task_q.put((seq, idx))
            state["dispatched"] += 1

        try:
            # keep ~2 tasks in flight per worker (+ prefetch headroom)
            for _ in range(2 * self.num_workers + self.prefetch):
                dispatch_one()
            buffer = {}
            next_seq = 0
            known_dead: set = set()
            while not (state["exhausted"] and next_seq >= state["dispatched"]):
                while next_seq not in buffer:
                    try:
                        seq, items, err = result_q.get(
                            timeout=_MP_POLL_TIMEOUT)
                    except queue.Empty:
                        # A worker killed by the OS (OOM/signal) never ships
                        # its (seq, ...) result — that seq would otherwise
                        # never arrive.  Each observed death bumps a death
                        # epoch; every task still outstanding from an EARLIER
                        # epoch is re-dispatched ONCE to the surviving workers
                        # (duplicates are harmless: the reorder buffer is
                        # keyed by seq).  A task orphaned by a SECOND death
                        # after its re-dispatch has exhausted its attempts —
                        # raise (poison item) instead of spinning on the
                        # timeout forever with known_dead suppressing further
                        # death events.  Healthy-but-slow pipelines (no
                        # deaths) never trip this.
                        dead = [p for p in workers if not p.is_alive()
                                and p.exitcode not in (0, None)]
                        if dead and not any(p.is_alive() for p in workers):
                            raise RuntimeError(
                                f"all {len(workers)} DataLoader workers died "
                                f"(first: {dead[0].name} pid {dead[0].pid} "
                                f"exitcode {dead[0].exitcode}; OOM / signal?)"
                            )
                        new_dead = [p for p in dead if p.pid not in known_dead]
                        if new_dead:
                            known_dead.update(p.pid for p in new_dead)
                            state["death_epoch"] += 1
                            epoch = state["death_epoch"]
                            for s in sorted(outstanding):
                                if dispatch_epoch.get(s, epoch) >= epoch:
                                    continue  # dispatched after this death
                                if redispatch_count.get(s, 0) >= 1:
                                    raise RuntimeError(
                                        f"DataLoader worker "
                                        f"{new_dead[0].name} (pid "
                                        f"{new_dead[0].pid}) died with "
                                        f"exitcode {new_dead[0].exitcode} "
                                        f"and batch seq {s} has already "
                                        f"been re-dispatched once: poison "
                                        f"item?"
                                    )
                                redispatch_count[s] = (
                                    redispatch_count.get(s, 0) + 1
                                )
                                dispatch_epoch[s] = epoch
                                task_q.put((s, outstanding[s]))
                        continue
                    if seq >= next_seq and seq not in buffer:
                        buffer[seq] = (items, err)
                    outstanding.pop(seq, None)
                    dispatch_epoch.pop(seq, None)
                    redispatch_count.pop(seq, None)
                items, err = buffer.pop(next_seq)
                if err is not None:
                    raise pickle.loads(err)
                yield self._collate_seq(next_seq, items)
                next_seq += 1
                dispatch_one()
            self.epoch += 1
        finally:
            for _ in workers:
                try:
                    task_q.put_nowait(None)
                except Exception:
                    break
            for p in workers:
                p.join(timeout=1.0)
            for p in workers:
                if p.is_alive():
                    p.terminate()
                    p.join(timeout=1.0)
            # mp.Queue feeder threads must not block interpreter shutdown
            for q_ in (task_q, result_q):
                q_.cancel_join_thread()
                q_.close()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers > 0:
            yield from self._mp_iter()
            return
        if self.prefetch <= 0:
            for batch_idx in self._batch_indices():
                yield collate([self.dataset[int(i)] for i in batch_idx])
            self.epoch += 1
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        t = threading.Thread(target=self._producer, args=(q, stop), daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, _ProducerError):
                    raise batch.exc
                yield batch
            self.epoch += 1
        finally:
            # consumer may leave early (break / GeneratorExit): release the
            # producer and reap the thread
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)


def build_dataset(cfg, name: str):
    """Dataset factory keyed by DatasetCatalog names (reference
    data/build.py:16-48)."""
    from ..config.catalog import DatasetCatalog

    entry = DatasetCatalog.get(name)
    factory = entry["factory"]
    if factory == "SyntheticMultiview":
        from .datasets.synthetic import SyntheticMultiview

        return SyntheticMultiview(
            cfg,
            is_train=entry["is_train"],
            n_samples=entry.get("n_samples", 256),
            seed=entry.get("seed", 0),
        )
    if factory == "MultiViewH36M":
        from .datasets.multiview_h36m import MultiViewH36M

        return MultiViewH36M(cfg, entry["root"], entry["anno"], is_train=entry["is_train"])
    if factory == "H36MDataset":
        from .datasets.multiview_h36m import H36MDataset

        return H36MDataset(cfg, entry["root"], entry["anno"], is_train=entry["is_train"])
    if factory == "RHDDataset":
        from .datasets.rhd import RHDDataset

        return RHDDataset(cfg, entry["root"], entry["set"], is_train=entry["is_train"])
    if factory == "MPIIDataset":
        from .datasets.mpii import MPIIDataset

        return MPIIDataset(cfg, entry["root"], entry.get("set", "train"),
                           is_train=entry["is_train"])
    if factory == "MultiviewMPIIDataset":
        from .datasets.mpii import MultiviewMPIIDataset

        return MultiviewMPIIDataset(cfg, entry["root"], entry.get("set", "train"),
                                    is_train=entry["is_train"])
    if factory == "MixedDataset":
        from .datasets.mpii import MixedDataset

        h36m = build_dataset(cfg, entry["h36m"])
        mpii = build_dataset(cfg, entry["mpii"])
        return MixedDataset(h36m, mpii)
    raise NotImplementedError(factory)


def make_data_loader(cfg, is_train: bool, shard_id: int = 0, num_shards: int = 1,
                     num_iterations: Optional[int] = None):
    """reference data/build.py:50-89: train datasets are concatenated into one
    loader; test returns one loader per dataset.

    Args:
        num_iterations: when set (train only), yield exactly this many
            epoch-free batches via IterationBasedBatchSampler.
    """
    names = cfg.DATASETS.TRAIN if is_train else cfg.DATASETS.TEST
    batch = cfg.SOLVER.IMS_PER_BATCH if is_train else cfg.TEST.IMS_PER_BATCH
    datasets = [build_dataset(cfg, n) for n in names]
    if is_train and len(datasets) > 1:
        datasets = [ConcatDataset(datasets)]
    loaders = [
        DataLoader(
            ds,
            # DATALOADER.NUM_WORKERS (reference data/build.py:79-84) spawns
            # worker PROCESSES — consumed only for io-bound datasets (cv2
            # decode + undistort per item); cheap in-memory datasets
            # (synthetic rig, device-render coords) stay on the thread
            # producer, where process IPC would only add pickling cost.
            num_workers=(
                min(cfg.DATALOADER.NUM_WORKERS, 4 * (os.cpu_count() or 1))
                if getattr(ds, "io_bound", False) else 0
            ),
            mp_start_method=cfg.DATALOADER.MP_START_METHOD,
            batch_size=batch,
            shuffle=is_train,
            seed=cfg.SEED,
            drop_last=is_train,
            shard_id=shard_id,
            num_shards=num_shards,
            num_iterations=num_iterations if is_train else None,
            # Ring-reuse removes the dominant page-fault cost of fresh
            # batch allocation for the (streaming) trainer; eval loaders
            # keep fresh buffers (the tester accumulates per-batch arrays).
            # The depth must outlive the trainer's ASYNC host->device
            # transfers: the trainer hard-syncs metrics every LOG_FREQ
            # steps, bounding in-flight transfers, so prefetch + LOG_FREQ
            # + margin slots suffice.  A huge LOG_FREQ would need an
            # unbounded ring — fall back to fresh allocation there.
            reuse_buffers=is_train and cfg.LOG_FREQ <= 50,
            ring_depth=2 + cfg.LOG_FREQ + 5,
        )
        for ds in datasets
    ]
    if is_train:
        return loaders[0]
    return loaders
