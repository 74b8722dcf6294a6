"""Multi-view H36M dataset: camera grouping + TOPK-nearest view pairing.

Equivalent of reference data/datasets/multiview_h36m.py:24-331: group db
records by (subject, action, subaction, imgid) into 4-camera groups; at train
time return a random ref view with its TOPK-nearest other view; at test time
return all views stacked plus each view's nearest other view, optionally
retriangulating GT 3D from GT 2D (REAL3D).
"""

from __future__ import annotations

import os.path as osp
import pickle

import numpy as np

from ...config import Config
from ...geometry.camera import neighbor_cameras
from ...geometry.host import triangulate_pymvg_np
from .joints_dataset import ACTUAL_IN_UNION, JointsDataset

INDEX_TO_ACTION = {
    2: "Direction", 3: "Discuss", 4: "Eating", 5: "Greet", 6: "Phone",
    7: "Pose", 8: "Purchase", 9: "Sitting", 10: "SittingDown", 11: "Smoke",
    12: "Photo", 13: "Wait", 14: "WalkDog", 15: "Walk", 16: "WalkTo",
}


class MultiViewH36M(JointsDataset):
    actual_joints = {
        0: "root", 1: "rhip", 2: "rkne", 3: "rank", 4: "lhip", 5: "lkne",
        6: "lank", 7: "belly", 8: "neck", 9: "nose", 10: "head", 11: "lsho",
        12: "lelb", 13: "lwri", 14: "rsho", 15: "relb", 16: "rwri",
    }

    def __init__(self, cfg: Config, root: str, anno_file: str, is_train: bool):
        super().__init__(cfg, root, is_train)
        with open(anno_file, "rb") as f:
            self.db = pickle.load(f)
        if cfg.DATASETS.H36M.FILTER_DAMAGE:
            self.db = [r for r in self.db if not self.isdamaged(r)]
        if cfg.DATASETS.H36M.MAPPING:
            assert cfg.KEYPOINT.NUM_PTS == 20
            self.u2a_mapping = self.get_mapping()
            self.do_mapping()
        else:
            assert cfg.KEYPOINT.NUM_PTS == 17
        self.grouping = self._get_group()

    @staticmethod
    def index_to_action_names():
        return INDEX_TO_ACTION

    def _get_group(self):
        grouping = {}
        for i, rec in enumerate(self.db):
            key = self.get_key_str(rec)
            grouping.setdefault(key, [-1, -1, -1, -1])[rec["camera_id"]] = i
        filtered = [v for v in grouping.values() if all(x != -1 for x in v)]
        sample = (
            self.cfg.DATASETS.H36M.TRAIN_SAMPLE
            if self.is_train
            else self.cfg.DATASETS.H36M.TEST_SAMPLE
        )
        if sample:
            filtered = filtered[::sample]
        return filtered

    def __len__(self):
        return len(self.grouping)

    def __getitem__(self, idx: int):
        cfg = self.cfg
        items = list(self.grouping[idx])
        data = {}
        krts = {}
        for cam, item in enumerate(items):
            datum = super().__getitem__(item)
            data[cam] = datum
            krts[cam] = datum["KRT"]
        rank = neighbor_cameras(krts)

        if self.is_train:
            # TOPK view pairing (multiview_h36m.py:132-145)
            topk = cfg.EPIPOLAR.TOPK
            if topk == 3:
                ref_cam, other_cam = np.random.choice(len(items), 2, replace=False)
            elif topk == 2:
                ref_cam = np.random.randint(len(items))
                other_cam = int(np.random.choice(rank[ref_cam][0][:2]))
            elif topk == 1:
                ref_cam = np.random.randint(len(items))
                other_cam = rank[ref_cam][0][0]
            else:
                raise NotImplementedError(topk)
            ret = dict(data[ref_cam])
            other = data[other_cam]
            ret["camera"] = np.int32(ref_cam)
            ret["other_camera"] = np.int32(other_cam)
            for k in ("img", "KRT", "heatmap"):
                if k in other:
                    ret["other_" + k] = other[k]
            if cfg.VIS.MULTIVIEWH36M:
                # headless analog of the reference's in-dataset epipolar
                # debug plot (multiview_h36m.py:159-243)
                from ...vis.visualization import dump_epipolar_debug_pair

                dump_epipolar_debug_pair(cfg, ret, idx)
            return ret

        # test: all views stacked + nearest other per view
        ret = {"camera": []}
        for k in data[0]:
            ret[k] = []
        for k in ("img", "KRT", "heatmap", "camera"):
            ret["other_" + k] = []
        for ref_cam, datum in data.items():
            ret["camera"].append(np.int32(ref_cam))
            other_cam = rank[ref_cam][0][0]
            ret["other_camera"].append(np.int32(other_cam))
            for k, v in datum.items():
                ret[k].append(v)
            for k in ("img", "KRT", "heatmap"):
                if k in data[other_cam]:
                    ret["other_" + k].append(data[other_cam][k])
        if cfg.KEYPOINT.NUM_CAM:
            ret = {k: v[: cfg.KEYPOINT.NUM_CAM] for k, v in ret.items()}
        ret = {k: np.stack(v) for k, v in ret.items() if len(v)}
        if cfg.DATASETS.H36M.REAL3D:
            real3d = self.compute_real3d(ret["points-2d"], ret["K"], ret["RT"])
            ret["points-3d"] = np.broadcast_to(
                real3d, ret["points-3d"].shape
            ).copy()
        return ret

    def compute_real3d(self, pts, Ks, RTs):
        """Retriangulate GT 3D from GT 2D (multiview_h36m.py:297-305)."""
        if self.cfg.DATASETS.H36M.MAPPING:
            pts = pts[:, ACTUAL_IN_UNION]
        confs = np.ones((pts.shape[0], pts.shape[1]))
        return triangulate_pymvg_np(pts.astype(np.float64), Ks, RTs, confs)

    def evaluate(self, pred):
        """2D JDR at headsize/2 (multiview_h36m.py:264-295)."""
        headsize = self.image_size[0] / 10.0
        threshold = 0.5
        u2a = self.u2a_mapping or {i: i for i in range(self.num_joints)}
        a2u = {v: k for k, v in u2a.items() if v != "*"}
        a = list(a2u.keys())
        indexes = sorted(range(len(a)), key=a.__getitem__)
        sa = [a[i] for i in indexes]
        su = np.array([a2u[k] for k in sa])

        gt = []
        for items in self.grouping:
            for item in items:
                gt.append(self.db[item]["joints_2d"][su, :2])
        gt = np.array(gt)
        pred = np.asarray(pred)[:, su, :2]
        distance = np.sqrt(np.sum((gt - pred) ** 2, axis=2))
        detected = distance <= headsize * threshold
        jdr = detected.sum(axis=0) / float(gt.shape[0])
        name_values = {self.actual_joints[sa[i]]: jdr[i] for i in range(len(a2u))}
        return name_values, float(np.mean(jdr))


class H36MDataset(MultiViewH36M):
    """Single-view variant: one random view per group at train time
    (reference data/datasets/h36m.py:96-116)."""

    def _get_group(self):
        groups = super()._get_group()
        # reference h36m.py samples train ::5, test ::64 on top of grouping
        return groups

    def __getitem__(self, idx: int):
        items = list(self.grouping[idx])
        if self.is_train:
            cam = np.random.randint(len(items))
            return JointsDataset.__getitem__(self, items[cam])
        return JointsDataset.__getitem__(self, items[idx % len(items)])
