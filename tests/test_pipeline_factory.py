"""Factory/catalog coverage: build_dataset must construct every catalog
entry (reference data/build.py:16-48 resolves factories by name; the round-1
H36MDataset branch imported a nonexistent module — this pins the fix), plus
train-time multi-dataset concat (reference data/build.py:59-63) and the
iteration-based sampler wiring."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.config.catalog import DatasetCatalog
from epipolar_transformers_tpu.data.pipeline import (
    ConcatDataset,
    DataLoader,
    build_dataset,
    make_data_loader,
)
from tests.test_datasets import _h36m_cfg, _make_h36m_fixture, _make_rhd_fixture


def _make_mpii_fixture(data_dir):
    """Tiny MPII annot json under <data_dir>/mpii/annot/{train,valid}.json."""
    rng = np.random.RandomState(3)
    annot_dir = os.path.join(data_dir, "mpii", "annot")
    img_dir = os.path.join(data_dir, "mpii", "images")
    os.makedirs(annot_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    records = []
    for i in range(8):
        name = f"im{i:03d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name),
                    (rng.rand(64, 64, 3) * 255).astype(np.uint8))
        records.append({
            "image": name,
            "center": [32.0, 32.0],
            "scale": 0.3,
            "joints": (rng.rand(16, 2) * 60 + 2).tolist(),
            "joints_vis": [1] * 16,
        })
    for subset in ("train", "valid"):
        with open(os.path.join(annot_dir, f"{subset}.json"), "w") as f:
            json.dump(records, f)


@pytest.fixture()
def catalog_data_dir(tmp_path, monkeypatch):
    """Materialize fixture data for every catalog entry under one DATA_DIR."""
    data_dir = str(tmp_path / "datasets")
    os.makedirs(data_dir, exist_ok=True)
    # H36M: catalog expects h36m/images + h36m/annot/h36m_{train,validation}.pkl
    fix_root, fix_anno = _make_h36m_fixture(tmp_path / "h36m_fixture")
    h36m_dir = os.path.join(data_dir, "h36m")
    os.makedirs(os.path.join(h36m_dir, "annot"), exist_ok=True)
    os.symlink(os.path.join(fix_root, "h36m", "images"),
               os.path.join(h36m_dir, "images"))
    for name in ("h36m_train.pkl", "h36m_validation.pkl"):
        os.link(fix_anno, os.path.join(h36m_dir, "annot", name))
    # RHD: catalog expects RHD_published_v2/{training,evaluation}
    rhd_root = _make_rhd_fixture(tmp_path / "rhd_fixture")
    os.makedirs(os.path.join(data_dir, "RHD_published_v2"), exist_ok=True)
    for subset in ("training", "evaluation"):
        dst = os.path.join(data_dir, "RHD_published_v2", subset)
        os.makedirs(dst, exist_ok=True)
        for kind in ("color", "mask"):
            os.symlink(os.path.join(rhd_root, "training", kind),
                       os.path.join(dst, kind))
        os.link(os.path.join(rhd_root, "training", "anno_training.pickle"),
                os.path.join(dst, f"anno_{subset}.pickle"))
    # MPII
    _make_mpii_fixture(data_dir)
    monkeypatch.setattr(DatasetCatalog, "DATA_DIR", data_dir)
    return data_dir


def _cfg_for(name):
    if "rhd" in name:
        d = {
            "LIFTING": {"ENABLED": True, "CROP_SIZE": 128, "IMAGE_SIZE": 320},
            "KEYPOINT": {"NUM_PTS": 21, "HEATMAP_SIZE": (32, 32), "SIGMA": 4.0},
            "DATASETS": {"TASK": "lifting_direct"},
        }
        return update_from_dict(Config(), d)
    if "mpii" in name or "mixed" in name:
        # mixed H36M+MPII training runs in the 20-joint union space with the
        # per-dataset mapping enabled (reference mixed_dataset.py:19-56)
        cfg = _h36m_cfg()
        cfg = update_from_dict(cfg, {"DATASETS": {"H36M": {"MAPPING": True}}})
        return cfg.replace(KEYPOINT=cfg.KEYPOINT.replace(NUM_PTS=20))
    if "synthetic" in name:
        return update_from_dict(Config(), {
            "DATASETS": {"TASK": "multiview_keypoint", "IMAGE_SIZE": (64, 64)},
            "KEYPOINT": {"NUM_PTS": 5, "HEATMAP_SIZE": (16, 16)},
        })
    return _h36m_cfg()


@pytest.mark.parametrize("name", sorted(DatasetCatalog.DATASETS))
def test_build_dataset_every_catalog_name(catalog_data_dir, name):
    """Every catalog entry must construct through the factory (reference
    data/build.py:30-48). Round 1 shipped a dead `.datasets.h36m` import."""
    ds = build_dataset(_cfg_for(name), name)
    assert len(ds) > 0


def test_h36m_single_view_factory_item(catalog_data_dir):
    """The previously-broken branch, end to end: build + fetch an item."""
    cfg = _cfg_for("h36m_train")
    np.random.seed(0)
    item = build_dataset(cfg, "h36m_train")[0]
    assert item["img"].shape == (64, 64, 3)
    assert item["heatmap"].shape == (16, 16, 17)


def test_mixed_dataset_concats_groups(catalog_data_dir):
    cfg = _cfg_for("mixed_h36m_mpii_train")
    ds = build_dataset(cfg, "mixed_h36m_mpii_train")
    assert len(ds) == len(ds.h36m) + len(ds.mpii)


# ------------------------------------------------------------ concat loader
class _Const:
    def __init__(self, tag, n):
        self.tag, self.n = tag, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), self.tag, np.float32)}


def test_concat_dataset_indexing():
    ds = ConcatDataset([_Const(1, 3), _Const(2, 5)])
    assert len(ds) == 8
    assert ds[0]["x"][0] == 1 and ds[2]["x"][0] == 1
    assert ds[3]["x"][0] == 2 and ds[7]["x"][0] == 2
    assert ds[-1]["x"][0] == 2


def test_make_data_loader_concats_train_datasets(catalog_data_dir):
    """TRAIN with two datasets returns ONE loader over their concatenation
    (reference data/build.py:59-63, 'concat: round 2' assert removed)."""
    cfg = _cfg_for("synthetic_multiview_train")
    cfg = update_from_dict(cfg, {
        "DATASETS": {"TRAIN": ("synthetic_multiview_train", "synthetic_multiview_train")},
        "SOLVER": {"IMS_PER_BATCH": 2},
    })
    loader = make_data_loader(cfg, is_train=True)
    single = build_dataset(cfg, "synthetic_multiview_train")
    assert len(loader.dataset) == 2 * len(single)
    batch = next(iter(loader))
    assert batch["img"].shape[0] == 2


def test_iteration_based_loader_yields_exactly_n():
    ds = _Const(1, 5)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_iterations=7,
                        prefetch=0)
    batches = list(loader)
    assert len(batches) == 7 == len(loader)
    assert all(b["x"].shape == (2, 2) for b in batches)


def test_iteration_based_loader_shards_batches():
    ds = _Const(1, 8)
    a = DataLoader(ds, batch_size=2, shuffle=False, num_iterations=3,
                   prefetch=0, shard_id=0, num_shards=2)
    b = DataLoader(ds, batch_size=2, shuffle=False, num_iterations=3,
                   prefetch=0, shard_id=1, num_shards=2)
    for ba, bb in zip(a, b):
        assert ba["x"].shape == (2, 2) and bb["x"].shape == (2, 2)


def test_prefetch_producer_reaped_on_early_exit():
    """A consumer that stops early (max_steps / capped eval) must not leak a
    producer thread blocked in queue.put — leaked lock-parked threads abort
    CPython 3.12 at interpreter shutdown."""
    import threading
    import time

    before = threading.active_count()
    ds = _Const(1, 64)
    loader = DataLoader(ds, batch_size=2, shuffle=False, prefetch=2)
    it = iter(loader)
    next(it)  # producer now blocked on a full queue
    it.close()  # early exit (what a break in a for-loop does)

    deadline = time.time() + 6.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


class _Indexed:
    """Item value encodes the index, so batch contents are checkable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        # the 0-d fields mirror real items ('camera'/'action' scalars) —
        # ring reuse must write through (B,)-row views of those too
        return {"x": np.full((3,), float(i), np.float32),
                "camera": np.int32(i % 4),
                "action": np.float64(i)}


def test_reuse_buffers_ring_contents_and_aliasing():
    """reuse_buffers: batches are correct, buffers cycle with ring period,
    and a streaming consumer never sees a batch mutated before it moves on."""
    ds = _Indexed(40)
    loader = DataLoader(ds, batch_size=2, shuffle=False, prefetch=2,
                        reuse_buffers=True, ring_depth=5)
    seen_ids = []
    prev = None
    for n, batch in enumerate(loader):
        # contents correct at the moment of consumption — incl. the 0-d
        # scalar fields (np.copyto would raise on those and silently
        # disable reuse; plain assignment writes through)
        np.testing.assert_array_equal(
            batch["x"][:, 0], np.array([2 * n, 2 * n + 1], np.float32))
        np.testing.assert_array_equal(
            batch["camera"], np.array([(2 * n) % 4, (2 * n + 1) % 4]))
        if prev is not None:
            # the ring is deeper than the consumer's working set of 2
            assert batch["x"] is not prev["x"]
        seen_ids.append(id(batch["x"]))
        prev = batch
    # buffers really were recycled — reuse ENGAGED (no silent fallback)
    assert len(set(seen_ids)) <= 5 < len(seen_ids)


def test_reuse_buffers_matches_fresh_allocation():
    ds = _Indexed(12)
    fresh = [b["x"].copy() for b in DataLoader(ds, batch_size=3,
                                               shuffle=False, prefetch=0)]
    ring = [b["x"].copy() for b in DataLoader(ds, batch_size=3, shuffle=False,
                                              prefetch=2, reuse_buffers=True)]
    for f, r in zip(fresh, ring):
        np.testing.assert_array_equal(f, r)


class _Exploding:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        if i == 5:
            raise RuntimeError("corrupt sample 5")
        return {"x": np.zeros((2,), np.float32)}


def test_producer_exception_surfaces_in_consumer():
    """A dataset error inside the prefetch producer thread re-raises in the
    consuming thread instead of hanging q.get() forever."""
    loader = DataLoader(_Exploding(), batch_size=2, shuffle=False, prefetch=2)
    with pytest.raises(RuntimeError, match="corrupt sample 5"):
        for _ in loader:
            pass


def test_small_dataset_iteration_sampler_raises_not_hangs():
    """dataset_size < batch_size with num_iterations: the sampler's
    ValueError must surface in the consumer (it is raised in the producer
    thread)."""
    loader = DataLoader(_Indexed(3), batch_size=8, shuffle=False, prefetch=2,
                        num_iterations=4)
    with pytest.raises(ValueError, match="batch_size"):
        for _ in loader:
            pass
